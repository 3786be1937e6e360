"""Gap-based sessionization (SURVEY.md §2.6).

The classic distributed pattern: per entity, a new session starts when
the gap to the previous event exceeds the threshold; the session id is
the running count of session starts. One exchange + one sort per
entity partition (the two window functions share a WindowSpec, so
Catalyst plans a single Window node).

No reference analog (ballet's closest is group-wise apply,
ballet/eng/base.py:64-91); required by the north rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ballet_spark.operators.base import SparkTransformer


def session_id_expr(entity_col: str, time_col: str, gap_s: int):
    """THE session-id expression — the single source of truth shared by
    :func:`sessionize` and :class:`SessionId` so the DataFrame-level
    and feature-column session ids can never diverge. 0-based running
    count of session starts; exact fractional-second gap (cast
    ts->double keeps microseconds; unix_timestamp would floor and
    mis-classify boundary gaps). Both window functions share one
    (partitionBy, orderBy) so Catalyst plans a single Window node."""
    w = Window.partitionBy(entity_col).orderBy(time_col)
    ts = F.col(time_col).cast("timestamp").cast("double")
    is_new = F.when(ts - F.lag(ts, 1).over(w) > F.lit(gap_s), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return F.sum(is_new).over(run).cast("bigint")


def sessionize(
    df: DataFrame,
    entity_col: str = "url",
    time_col: str = "warc_ts",
    gap_s: int = 24 * 3600,
    out_col: str = "session_id",
) -> DataFrame:
    """Append ``out_col``: 0-based session index within the entity."""
    return df.withColumn(out_col, session_id_expr(entity_col, time_col, gap_s))


def session_stats(
    df: DataFrame,
    entity_col: str = "url",
    time_col: str = "warc_ts",
    gap_s: int = 24 * 3600,
) -> DataFrame:
    """Per-session rollup: bounds, event count, duration seconds."""
    s = sessionize(df, entity_col, time_col, gap_s)
    return s.groupBy(entity_col, "session_id").agg(
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_timestamp(F.max(time_col)) - F.unix_timestamp(F.min(time_col))
        ).cast("bigint").alias("duration_s"),
    )


class SessionId(SparkTransformer):
    """Session id as a feature column (ignores its nominal input; keyed
    on the pipeline's entity/time context)."""

    def __init__(self, gap_s: int = 24 * 3600):
        self.gap_s = gap_s

    def transform_exprs(self, in_exprs, ctx):
        return [session_id_expr(ctx.entity_col, ctx.time_col, self.gap_s)]
