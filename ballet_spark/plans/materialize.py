"""Resumable, checkpointed feature materialization with lineage.

North-rule requirement: "every feature materialization is resumable
from snapshot checkpoints with per-partition lineage rows (feature id,
input snapshot, row counts, digest)". Generalizes the reference's
git-based provenance (ChangeCollector, ballet/validation/common.py:
129-257) and ``save_features`` sinks (ballet/util/io.py:60-117) to a
distributed, restartable protocol:

- work is split into ``n_units`` deterministic **entity-hash units**
  (``pmod(xxhash64(url), n_units)``) — every unit holds the COMPLETE
  history of its urls, so windows/as-of computed per unit are exact;
- each completed unit appends its feature rows to the output table
  (parquet locally; the layout is Iceberg-append-shaped) and ONE
  lineage row ``(feature_set, input_snapshot, unit, row_count, digest,
  completed_at_job)``;
- on restart, units already present in the lineage table for the same
  ``(feature_set, input_snapshot)`` are skipped (anti-join of pending
  units against lineage);
- the digest is an order-insensitive 64-bit checksum (sum of
  ``xxhash64`` over all output columns), so two materializations of
  the same unit can be compared cheaply.

Deterministic unit assignment (hash of the entity key, never
``rand()``) is what makes resume produce identical partitions
(SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import hashlib
import time
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "feature_set string, input_snapshot string, unit int, "
    "row_count long, digest long, completed_at double"
)


def feature_set_id(features: Sequence) -> str:
    """Stable id of the feature list (name/alias/description tuple
    hash) — the engine analog of the reference's feature source
    provenance (ballet/contrib.py stamping)."""
    parts = "|".join(
        f"{f.name}:{f.alias}:{f.input if isinstance(f.input, str) else list(f.input) if not callable(f.input) else 'callable'}"
        for f in features
    )
    return hashlib.md5(parts.encode()).hexdigest()[:16]


def _unit_expr(entity_col: str, n_units: int):
    return F.pmod(F.xxhash64(F.col(entity_col)), F.lit(n_units)).cast("int")


def completed_units(
    spark: SparkSession, lineage_path: str, fset: str, snapshot: str
) -> set[int]:
    try:
        lin = spark.read.parquet(lineage_path)
    except Exception:
        return set()
    rows = (
        lin.filter(
            (F.col("feature_set") == fset) & (F.col("input_snapshot") == snapshot)
        )
        .select("unit")
        .distinct()
        .collect()
    )
    return {r["unit"] for r in rows}


def row_digest(df: DataFrame) -> F.Column:
    """Order-insensitive content digest: XOR over rows of xxhash64 of
    all columns (nulls canonicalized by xxhash64 itself; XOR is
    commutative and can't overflow under ANSI arithmetic)."""
    return F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).cast("long")


def materialize(
    spark: SparkSession,
    source: DataFrame,
    features: Sequence,
    out_path: str,
    lineage_path: str,
    input_snapshot: str,
    entity_col: str = "url",
    time_col: str = "warc_ts",
    n_units: int = 8,
    fail_after_units: int | None = None,
    y: str | None = None,
) -> dict:
    """Materialize the feature matrix in resumable units.

    ``fail_after_units`` injects a crash after N units (for resume
    tests). Returns a summary dict. Fit runs ONCE over the full train
    slice (the source as-of snapshot); only the transform is unitized,
    so fitted params are identical regardless of unit schedule.
    """
    from ballet_spark.core import FeatureEngineeringPipeline

    fset = feature_set_id(features)
    done = completed_units(spark, lineage_path, fset, input_snapshot)
    pending = [u for u in range(n_units) if u not in done]

    pipe = FeatureEngineeringPipeline(
        features, entity_col=entity_col, time_col=time_col
    )
    fitted = pipe.fit(source, y=y)

    tagged = source.withColumn("__unit", _unit_expr(entity_col, n_units))
    n_done = 0
    for unit in pending:
        if fail_after_units is not None and n_done >= fail_after_units:
            raise RuntimeError(f"injected failure after {n_done} units")
        part = tagged.filter(F.col("__unit") == unit).drop("__unit")
        matrix = fitted.transform(part)
        matrix.write.mode("append").parquet(f"{out_path}/unit={unit}")
        stats = spark.read.parquet(f"{out_path}/unit={unit}")
        row = stats.agg(
            F.count(F.lit(1)).alias("n"), row_digest(stats).alias("d")
        ).first()
        lineage_row = spark.createDataFrame(
            [
                (
                    fset,
                    input_snapshot,
                    unit,
                    int(row["n"]),
                    int(row["d"]) if row["d"] is not None else 0,
                    float(time.time()),
                )
            ],
            LINEAGE_SCHEMA,
        )
        lineage_row.write.mode("append").parquet(lineage_path)
        n_done += 1

    return {
        "feature_set": fset,
        "input_snapshot": input_snapshot,
        "units_total": n_units,
        "units_skipped": len(done),
        "units_computed": n_done,
        "out_path": out_path,
    }


def read_matrix(spark: SparkSession, out_path: str) -> DataFrame:
    """Read the materialized matrix across all units."""
    return spark.read.option("basePath", out_path).parquet(f"{out_path}/unit=*")


def lineage_metrics(spark: SparkSession, lineage_path: str) -> DataFrame:
    """The lineage/metrics table (discovery analog, V13)."""
    return spark.read.parquet(lineage_path)
