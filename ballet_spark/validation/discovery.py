"""Feature discovery metrics (SURVEY.md §2.4 V13–V14).

The reference's ``discover()`` (ballet/discovery.py:102-212) emits a
per-feature summary frame: mean/std/var/min/median/max/nunique plus
MI/CMI vs the target. Engine version: ONE distributed agg pass over
the materialized matrix for the moment statistics (batched across all
feature columns), ``approx_count_distinct`` for nunique (exact
``countDistinct`` optional), and the sampled KSG kernels for MI/CMI.
Mirrors the reference's expensive-stats guard: CMI is skipped when the
existing matrix exceeds ``expensive_stats_max_cols`` columns
(EXPENSIVE_STATS_CMI_MAX_COLS_X = 10, ballet/discovery.py:15)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ballet_spark.validation.entropy import (
    estimate_conditional_information_spark,
    estimate_mutual_information_spark,
)

EXPENSIVE_STATS_CMI_MAX_COLS_X = 10  # ballet/discovery.py:15


def discover(
    matrix: DataFrame,
    feature_cols: dict[str, list[str]],
    y_col: str | None = None,
    exact_nunique: bool = False,
    sample_n: int = 2000,
    seed: int = 42,
) -> pd.DataFrame:
    """Per-feature summary table. ``feature_cols``: feature name →
    its column(s) in the matrix."""
    aggs = []
    flat = [c for cols in feature_cols.values() for c in cols]
    for c in flat:
        col = F.col(c).cast("double")
        aggs += [
            F.avg(col).alias(f"{c}__mean"),
            F.stddev_samp(col).alias(f"{c}__std"),
            F.var_samp(col).alias(f"{c}__var"),
            F.min(col).alias(f"{c}__min"),
            F.percentile_approx(col, F.lit(0.5), F.lit(10000)).alias(f"{c}__median"),
            F.max(col).alias(f"{c}__max"),
            (
                F.count_distinct(F.col(c))
                if exact_nunique
                else F.approx_count_distinct(F.col(c))
            ).alias(f"{c}__nunique"),
        ]
    row = matrix.agg(*aggs).first().asDict()

    all_cols_count = len(flat)

    def _avg(cols, stat):
        """Reference semantics (ballet/discovery.py:102-130): for a
        multi-value feature each statistic is computed per feature
        value and then AVERAGED — so every computed aggregate is used,
        and a 50-column one-hot reports the feature's stats, not the
        first indicator's."""
        vals = [row[f"{c}__{stat}"] for c in cols if row[f"{c}__{stat}"] is not None]
        return sum(vals) / len(vals) if vals else None

    rows = []
    for name, cols in feature_cols.items():
        rec = {
            "feature": name,
            "ncols": len(cols),
            "mean": _avg(cols, "mean"),
            "std": _avg(cols, "std"),
            "variance": _avg(cols, "var"),
            "min": _avg(cols, "min"),
            "median": _avg(cols, "median"),
            "max": _avg(cols, "max"),
            "nunique": _avg(cols, "nunique"),
        }
        if y_col is not None:
            rec["mutual_information"] = estimate_mutual_information_spark(
                matrix, cols, [y_col], sample_n, seed
            )
            other = [
                c for n, cs in feature_cols.items() if n != name for c in cs
            ]
            if other and all_cols_count <= EXPENSIVE_STATS_CMI_MAX_COLS_X:
                rec["conditional_mutual_information"] = (
                    estimate_conditional_information_spark(
                        matrix, cols, [y_col], other, sample_n, seed
                    )
                )
        rows.append(rec)
    return pd.DataFrame(rows)
