"""Point-in-time (as-of) join — the engine's most important custom
operator (SURVEY.md §2.6, §4.1).

Spark has no native as-of join. Two strategies:

- :func:`asof_join` — **union-and-window**: tag both sides, union on a
  widened schema, and ``last(value, ignorenulls=True)`` over
  ``partitionBy(entity) orderBy(ts, side)``. One hash exchange + one
  sort, O(n log n) per partition, no row explosion — this is the
  scalable sort-merge-style path for two large inputs. Tie-breaking:
  the right (feature) side sorts BEFORE the probe side at equal
  timestamps, so same-instant data is included ("data strictly after
  the as-of timestamp is excluded"), matching pandas
  ``merge_asof(allow_exact_matches=True)`` and ballet's
  fit-on-train inclusivity (SURVEY.md §7 hard parts).
- :func:`asof_join_broadcast` — for a SMALL right side: broadcast
  range-join + ``max_by`` per probe row. No shuffle of the big probe
  side at all; the right plan when joining a large probe stream against
  a compact per-entity state table.

Leakage: both strategies can only look backward; a probe row can never
see right-side rows with ``right_ts > left_ts``.

The reference has no distributed analog — this generalizes pandas index
alignment between fit/transform frames (ballet/pipeline.py:93-117,
docs/feature_engineering_guide.rst:124-127) to event-time correctness.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "url",
    left_ts: str = "ts",
    right_ts: str = "warc_ts",
    value_cols: Sequence[str] | None = None,
    tolerance_s: int | None = None,
    suffix: str = "",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right
    row of the same entity with ``right_ts <= left_ts``.

    Returns all left columns + matched value columns (suffixed) +
    ``__matched_ts`` (timestamp of the matched right row, NULL if no
    match / outside tolerance).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]
    value_cols = list(value_cols)

    right_types = dict(right.dtypes)
    left_cols = [c for c in left.columns if c not in (on, left_ts)]
    left_types = dict(left.dtypes)

    # Widened union schema: (entity, __ts, __side, left cols…, value cols…)
    l2 = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right_types[v]).alias(f"__v_{v}") for v in value_cols],
        F.lit(None).cast("timestamp").alias("__rts"),
    )
    r2 = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_cols],
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
        F.col(right_ts).cast("timestamp").alias("__rts"),
    )

    unioned = l2.unionByName(r2)
    # side=0 (right) sorts before side=1 (probe) at equal __ts ⇒ a probe
    # row sees same-instant right rows (inclusive as-of).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"__v_{v}"), ignorenulls=True).over(w).alias(f"__f_{v}")
            for v in value_cols
        ],
        F.last(F.col("__rts"), ignorenulls=True).over(w).alias("__matched_ts"),
    )

    probe = filled.filter(F.col("__side") == 1)
    if tolerance_s is not None:
        in_tol = (
            F.unix_timestamp("__ts") - F.unix_timestamp("__matched_ts")
        ) <= F.lit(tolerance_s)
        probe = probe.select(
            "*",
            *[
                F.when(in_tol, F.col(f"__f_{v}"))
                .otherwise(F.lit(None))
                .alias(f"__t_{v}")
                for v in value_cols
            ],
            F.when(in_tol, F.col("__matched_ts")).alias("__matched_ts_tol"),
        )
        out_val = [
            F.col(f"__t_{v}").alias(f"{v}{suffix}") for v in value_cols
        ]
        matched = F.col("__matched_ts_tol").alias("__matched_ts")
    else:
        out_val = [
            F.col(f"__f_{v}").alias(f"{v}{suffix}") for v in value_cols
        ]
        matched = F.col("__matched_ts")

    return probe.select(
        F.col(on),
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in left_cols],
        *out_val,
        matched,
    )


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    on: str = "url",
    left_ts: str = "ts",
    right_ts: str = "warc_ts",
    value_cols: Sequence[str] | None = None,
    tolerance_s: int | None = None,
    suffix: str = "",
) -> DataFrame:
    """Broadcast as-of: equi-join on entity with ``right_ts <= left_ts``,
    keep the latest match per probe row via ``max_by``. Right side must
    be broadcast-small; the probe side is never shuffled."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]
    value_cols = list(value_cols)

    lk = "__lid"
    lefted = left.select("*", F.monotonically_increasing_id().alias(lk))
    r = right.select(
        F.col(on).alias("__r_on"),
        F.col(right_ts).alias("__r_ts"),
        *[F.col(v).alias(f"__r_{v}") for v in value_cols],
    )
    cond = (F.col(on) == F.col("__r_on")) & (F.col("__r_ts") <= F.col(left_ts))
    if tolerance_s is not None:
        cond = cond & (
            F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp(F.col("__r_ts"))
            <= F.lit(tolerance_s)
        )
    joined = lefted.join(F.broadcast(r), cond, "left")
    agg = joined.groupBy(lk).agg(
        *[F.first(c).alias(c) for c in left.columns],
        *[
            F.max_by(F.col(f"__r_{v}"), F.col("__r_ts")).alias(f"{v}{suffix}")
            for v in value_cols
        ],
        F.max(F.col("__r_ts")).alias("__matched_ts"),
    )
    return agg.drop(lk)
