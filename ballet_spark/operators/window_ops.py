"""Window operators: lag/lead, rolling aggregates, forward-fill.

These generalize the reference's group-wise time-series transformers to
distributed per-entity windows:

- :class:`Lag` ⇔ ``SingleLagger`` (``groupby(...).shift(lag)``,
  ballet/eng/ts.py:13-22)
- :func:`multi_lag` ⇔ ``make_multi_lagger`` (FeatureUnion of laggers,
  ballet/eng/ts.py:25-41) — multiple lags over ONE WindowSpec so the
  sort/shuffle is shared
- :class:`ForwardFill` ⇔ ``LagImputer`` (group-wise
  ``fillna(method='ffill')``, ballet/eng/missing.py:12-17) — the
  north-rule ``last_value(ignorenulls)`` backfill operator
- :class:`Rolling` ⇔ skits ``RollingMeanTransformer``-family
  (ballet/eng/external/skits.py:1-33)
- :class:`Delta` ⇔ skits ``DifferenceTransformer``

All frames end at the current row; the compile-time leakage guard
(:meth:`PipelineContext.check_frame`) rejects future-looking frames in
point-in-time mode (SURVEY.md §4.2). ``Lead`` exists for label
construction only and must be whitelisted via ``allow_future=True``.

Scale notes: each distinct (partitionBy, orderBy) spec costs one hash
exchange + sort; every operator here shares the canonical
``(entity, time)`` spec so Catalyst collapses adjacent Window nodes
into a single exchange+sort per materialization. Hot-entity skew is
handled upstream by the materializer (head/tail plan split), not here.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F

from ballet_spark.operators.base import SparkTransformer


def entity_window(ctx) -> WindowSpec:
    """Canonical per-entity event-time window (url, warc_ts).

    UNIQUENESS CONTRACT: one row per (entity, time) — the
    point-in-time snapshot key the whole engine computes features AT
    (the north rule's "feature matrix at each (url, warc_ts)").
    Rows with tied (entity, time) have no defined relative order, so
    row_number-derived features (SnapshotIndex, Trend's index,
    FourierFeatures' phase) would be nondeterministic across
    runs/retries. The driver tables satisfy the contract; event-grain
    data must be aggregated to snapshot grain (or given a composite
    time key) before entering a pipeline."""
    return Window.partitionBy(ctx.entity_col).orderBy(ctx.time_col)


class Lag(SparkTransformer):
    """Per-entity ``shift(k)`` (ballet/eng/ts.py:13-22)."""

    def __init__(self, k: int = 1):
        if k < 0:
            raise ValueError("use Lead for negative lags")
        self.k = k

    def transform_exprs(self, in_exprs, ctx):
        w = entity_window(ctx)
        return [F.lag(e, self.k).over(w) for e in in_exprs]


class Lead(SparkTransformer):
    """Future value — label construction ONLY. Requires explicit
    ``allow_future=True`` acknowledgment under point-in-time mode."""

    def __init__(self, k: int = 1, allow_future: bool = False):
        self.k = k
        self.allow_future = allow_future

    def transform_exprs(self, in_exprs, ctx):
        if not self.allow_future:
            ctx.check_frame(self.k, what=f"Lead({self.k})")
        w = entity_window(ctx)
        return [F.lead(e, self.k).over(w) for e in in_exprs]


class MultiLag(SparkTransformer):
    """Several lags of one column over ONE WindowSpec
    (ballet/eng/ts.py:25-41): single sort, shared shuffle."""

    def __init__(self, lags: Sequence[int]):
        self.lags = list(lags)

    def transform_exprs(self, in_exprs, ctx):
        # lag(e, -k) IS lead(e, k): a negative offset reads future rows,
        # so it must pass the same leakage gate as Lead
        for k in self.lags:
            if k < 0:
                ctx.check_frame(-k, what=f"MultiLag({k})")
        w = entity_window(ctx)
        return [F.lag(e, k).over(w) for e in in_exprs for k in self.lags]


def multi_lag(lags: Sequence[int]) -> MultiLag:
    return MultiLag(lags)


class ForwardFill(SparkTransformer):
    """Group-wise forward fill = ``last(col, ignorenulls=True)`` over an
    unbounded-preceding frame (ballet/eng/missing.py:12-17 ``LagImputer``)."""

    def transform_exprs(self, in_exprs, ctx):
        w = entity_window(ctx).rowsBetween(Window.unboundedPreceding, 0)
        return [F.last(e, ignorenulls=True).over(w) for e in in_exprs]


_ROLL_FNS = {
    "mean": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "stddev": F.stddev_samp,
}


class Rolling(SparkTransformer):
    """Trailing window aggregate over the last ``window`` rows
    (inclusive of current), per entity. skits RollingMeanTransformer
    semantics (ballet/eng/external/skits.py:20)."""

    def __init__(self, agg: str = "mean", window: int = 3, end_offset: int = 0):
        if agg not in _ROLL_FNS:
            raise ValueError(f"agg must be one of {sorted(_ROLL_FNS)}")
        if window < 1:
            # window=0 builds an inverted rowsBetween(1, 0) frame that
            # Spark treats as empty — every output silently NULL
            raise ValueError(f"window must be >= 1, got {window}")
        self.agg = agg
        self.window = window
        self.end_offset = end_offset

    def transform_exprs(self, in_exprs, ctx):
        ctx.check_frame(self.end_offset, what=f"Rolling({self.agg})")
        w = entity_window(ctx).rowsBetween(
            self.end_offset - self.window + 1, self.end_offset
        )
        fn = _ROLL_FNS[self.agg]
        return [fn(e).over(w) for e in in_exprs]


class RollingRange(SparkTransformer):
    """Time-based trailing aggregate: all rows within ``duration``
    seconds before the current row's event time (inclusive). Uses
    ``rangeBetween`` on the epoch seconds of the time column, so rows
    with identical timestamps are all included — matching as-of
    inclusivity (SURVEY.md §7 hard parts)."""

    def __init__(self, agg: str = "mean", duration_s: int = 3600):
        if agg not in _ROLL_FNS:
            raise ValueError(f"agg must be one of {sorted(_ROLL_FNS)}")
        self.agg = agg
        self.duration_s = duration_s

    def transform_exprs(self, in_exprs, ctx):
        w = (
            Window.partitionBy(ctx.entity_col)
            .orderBy(F.col(ctx.time_col).cast("timestamp").cast("double"))
            .rangeBetween(-self.duration_s, 0)
        )
        fn = _ROLL_FNS[self.agg]
        return [fn(e).over(w) for e in in_exprs]


class CumAgg(SparkTransformer):
    """Expanding (cumulative) aggregate from the entity's first event
    through the current row — e.g. running mean of a page's text length
    over its crawl history."""

    def __init__(self, agg: str = "sum"):
        if agg not in _ROLL_FNS:
            raise ValueError(f"agg must be one of {sorted(_ROLL_FNS)}")
        self.agg = agg

    def transform_exprs(self, in_exprs, ctx):
        w = entity_window(ctx).rowsBetween(Window.unboundedPreceding, 0)
        fn = _ROLL_FNS[self.agg]
        return [fn(e).over(w) for e in in_exprs]


class Delta(SparkTransformer):
    """``col - lag(col, k)`` (skits DifferenceTransformer,
    ballet/eng/external/skits.py:26)."""

    def __init__(self, k: int = 1):
        self.k = k

    def transform_exprs(self, in_exprs, ctx):
        if self.k < 0:
            ctx.check_frame(-self.k, what=f"Delta({self.k})")
        w = entity_window(ctx)
        return [e - F.lag(e, self.k).over(w) for e in in_exprs]


class Horizon(SparkTransformer):
    """Multi-step-ahead target builder: columns [y(t+1) .. y(t+horizon)]
    per entity (skits HorizonTransformer,
    /root/reference/ballet/eng/external/skits.py:30-31). This is a
    LABEL BUILDER — it reads the future by definition — so under
    point-in-time mode it must be explicitly whitelisted with
    ``allow_future=True``; without it the leakage guard rejects the
    pipeline at compile time (features can never sneak future reads in
    through this path). All ``horizon`` leads share ONE WindowSpec."""

    def __init__(self, horizon: int, allow_future: bool = False):
        if horizon < 1:
            raise ValueError("horizon must be >= 1")
        self.horizon = horizon
        self.allow_future = allow_future

    def transform_exprs(self, in_exprs, ctx):
        if not self.allow_future:
            ctx.check_frame(self.horizon, what=f"Horizon({self.horizon})")
        w = entity_window(ctx)
        return [
            F.lead(e, k).over(w) for e in in_exprs for k in range(1, self.horizon + 1)
        ]


class SnapshotIndex(SparkTransformer):
    """0-based index of this snapshot within its entity's history
    (skits TrendTransformer's time index, ballet/eng/external/skits.py:24)."""

    def transform_exprs(self, in_exprs, ctx):
        w = entity_window(ctx)
        return [(F.row_number().over(w) - F.lit(1)).cast("bigint")]


class TimeSinceLast(SparkTransformer):
    """Seconds since the entity's previous snapshot (NULL for the
    first). The raw gap signal under sessionization."""

    def transform_exprs(self, in_exprs, ctx):
        w = entity_window(ctx)
        ts = F.col(ctx.time_col).cast("timestamp").cast("double")
        return [(ts - F.lag(ts, 1).over(w)).cast("double")]


class SeasonalLag(SparkTransformer):
    """Value one season ago: ``lag(seasonal_period)`` (skits
    SeasonalTransformer, ballet/eng/external/skits.py:22)."""

    def __init__(self, seasonal_period: int):
        self.seasonal_period = seasonal_period

    def transform_exprs(self, in_exprs, ctx):
        if self.seasonal_period < 0:
            ctx.check_frame(-self.seasonal_period, what=f"SeasonalLag({self.seasonal_period})")
        w = entity_window(ctx)
        return [F.lag(e, self.seasonal_period).over(w) for e in in_exprs]


class FourierFeatures(SparkTransformer):
    """sin/cos basis of the entity's snapshot index: 2*n_terms columns
    ``sin(2π k t/T), cos(2π k t/T)`` (skits FourierTransformer,
    ballet/eng/external/skits.py:28)."""

    def __init__(self, period: float, n_terms: int = 2):
        self.period = period
        self.n_terms = n_terms

    def transform_exprs(self, in_exprs, ctx):
        import math

        w = entity_window(ctx)
        t = (F.row_number().over(w) - F.lit(1)).cast("double")
        out = []
        for k in range(1, self.n_terms + 1):
            ang = t * F.lit(2.0 * math.pi * k / self.period)
            out.append(F.sin(ang))
            out.append(F.cos(ang))
        return out


class Trend(SparkTransformer):
    """Rolling OLS slope of the value against the snapshot index over a
    trailing window (skits TrendTransformer semantics): slope =
    (n·Σty − Σt·Σy) / (n·Σt² − (Σt)²) computed with windowed sums —
    pure expressions, shares the entity WindowSpec."""

    def __init__(self, window: int = 5):
        self.window = window

    def transform_exprs(self, in_exprs, ctx):
        w = entity_window(ctx).rowsBetween(-(self.window - 1), 0)
        idx = (F.row_number().over(entity_window(ctx)) - 1).cast("double")
        out = []
        for e in in_exprs:
            y = e.cast("double")
            n = F.count(y).over(w).cast("double")
            # mask the index sums by y's nullness so every sum ranges
            # over the same (non-null) rows as n — otherwise NULL values
            # in the window mix inconsistent sums into the slope
            st = F.sum(F.when(y.isNotNull(), idx)).over(w)
            sy = F.sum(y).over(w)
            sty = F.sum(idx * y).over(w)
            stt = F.sum(F.when(y.isNotNull(), idx * idx)).over(w)
            denom = n * stt - st * st
            out.append(F.when(denom != 0, (n * sty - st * sy) / denom))
        return out
