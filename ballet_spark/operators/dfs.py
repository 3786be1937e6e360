"""Deep-feature-synthesis and time-series feature extraction analogs.

The reference endorses featuretools' ``DFSTransformer`` and tsfresh's
``FeatureAugmenter`` as optional surfaces
(/root/reference/ballet/eng/external/featuretools.py:3,
/root/reference/ballet/eng/external/tsfresh.py:3 — plain re-exports).
Spark-first re-expression:

- :class:`DFSAggFeatures` — depth-1 DFS over a parent←child
  relationship: the cross product of child numeric columns ×
  aggregation primitives, computed as ONE ``groupBy(key).agg(...)``
  (partial+final, single shuffle on the key) and joined onto the
  parent. Depth-2 = compose two instances (child aggs become the next
  level's numeric columns) — exactly featuretools' stacking, but every
  level stays one Catalyst aggregation.
- :func:`ts_features` — tsfresh-style fixed feature vector per entity:
  order-free statistics in one groupBy agg; order-dependent ones
  (mean_abs_change) from a lag over the canonical (entity, time)
  window, so the whole extraction costs one exchange+sort plus one
  aggregation regardless of how many features are in the catalog.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _sum_exact(col):
    """Order-independent, engine-exact sum: microunit quantization
    (floor(x·10⁶+0.5)) summed as integral decimal(38,0) — see the
    ``exact_sums`` discussion on :func:`ts_features`. |x| < 9·10⁹."""
    return F.sum(F.floor(col * 1e6 + F.lit(0.5)).cast("decimal(38,0)")).cast(
        "double"
    ) / 1e6


def _mean_exact(col):
    return _sum_exact(col) / F.count(col)


_PRIMITIVES = {
    "sum": F.sum,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "std": F.stddev_samp,
    # engine-portable exact variants (bit-identical across
    # partitionings and engines; 5e-7 quantization)
    "sum_exact": _sum_exact,
    "mean_exact": _mean_exact,
}


class DFSAggFeatures:
    """Depth-1 deep feature synthesis: child rows → one feature row per
    ``key`` (featuretools DFSTransformer's agg-primitive core)."""

    def __init__(
        self,
        child: DataFrame,
        key: str,
        numeric_cols: Sequence[str],
        agg_primitives: Sequence[str] = ("sum", "mean", "min", "max"),
        count: bool = True,
        prefix: str | None = None,
    ):
        unknown = [p for p in agg_primitives if p not in _PRIMITIVES]
        if unknown:
            raise ValueError(f"unknown agg primitives: {unknown}")
        self.child = child
        self.key = key
        self.numeric_cols = list(numeric_cols)
        self.agg_primitives = list(agg_primitives)
        self.count = count
        self.prefix = prefix or "dfs"

    def feature_names(self) -> list[str]:
        names = [
            f"{self.prefix}_{p}_{c}"
            for c in self.numeric_cols
            for p in self.agg_primitives
        ]
        if self.count:
            names.append(f"{self.prefix}_count")
        return names

    def features(self) -> DataFrame:
        aggs = [
            _PRIMITIVES[p](F.col(c)).alias(f"{self.prefix}_{p}_{c}")
            for c in self.numeric_cols
            for p in self.agg_primitives
        ]
        if self.count:
            aggs.append(F.count(F.lit(1)).alias(f"{self.prefix}_count"))
        return self.child.groupBy(self.key).agg(*aggs)

    def augment(
        self, parent: DataFrame, parent_key: str | None = None, how: str = "left"
    ) -> DataFrame:
        """Join the synthesized features onto the parent frame. The
        feature table has one row per key — small relative to a fact
        table — so it broadcasts when under the threshold; otherwise
        it's a co-partitioned equi-join on the key."""
        pk = parent_key or self.key
        feats = self.features()
        return parent.join(feats, parent[pk] == feats[self.key], how).drop(
            feats[self.key]
        )


def ts_features(
    df: DataFrame,
    entity_col: str,
    time_col: str,
    value_col: str,
    prefix: str = "ts",
    exact_sums: bool = False,
    fft_k: Sequence[int] = (),
) -> DataFrame:
    """tsfresh-FeatureAugmenter-style fixed feature vector per entity:
    length, mean, std, min, max, sum, abs_energy (Σx²), mean_abs_change
    (mean |x_t − x_{t−1}| in event-time order), first and last value,
    number of peaks (strictly greater than both immediate neighbors,
    tsfresh ``number_peaks(n=1)``), count above the series mean,
    longest strike above the series mean (tsfresh
    ``longest_strike_above_mean``), lag-1 autocorrelation (tsfresh
    ``autocorrelation(lag=1)``: Σ(x_t−μ)(x_{t−1}−μ) / ((n−1)·σ²_pop)),
    and ``cid_ce`` (√Σ(x_t−x_{t−1})², the complexity-invariant
    distance estimate, non-normalized).

    Plan shape: every window expression shares
    ``partitionBy(entity)`` — the lag/lead/row_number/running-max
    family additionally ordered by time — so Catalyst plans ONE
    Exchange + one Sort feeding stacked Window nodes, then one
    hash aggregation (asserted by tests/test_plan_shapes.py). The
    streak uses the running-max gaps-and-islands form (streak = rn −
    last not-above rn) instead of a second groupBy on (entity, island)
    precisely to avoid a second shuffle.

    ``exact_sums=True`` accumulates every sum/mean (and the mean/var
    the comparison features derive from) as FIXED-POINT MICROUNITS:
    each term is quantized to 10^-6 with ``floor(x·10^6 + 0.5)`` and
    summed as an exact integral ``decimal(38,0)``. Float summation is
    ORDER-DEPENDENT, and when the data has low-decimal structure
    (prices, rounded sensor values) group sums land exactly on
    rounding boundaries, where a one-ulp partitioning difference flips
    the rounded result — observed at sf0.01 between this engine and
    the DuckDB oracle. Integer sums are associative AND engine-exact —
    casting a fractional double to decimal is NOT portable (this
    engine snaps to the shortest decimal repr, DuckDB expands the
    exact binary value; measured 1-ulp sum divergence), but floor on
    identical doubles is identical everywhere and integral decimals
    have nothing to disagree on. Also makes lineage digests
    replayable. Cost: ~2× on the agg (still one shuffle); terms must
    satisfy |x| < 9·10^9 (so x·10^6 stays integer-exact in a double);
    values are quantized to 5·10^-7, far below the per-feature
    rounding any consumer applies.

    ``fft_k=(0, 1, 2, 3)`` adds tsfresh ``fft_coefficient``
    (attr real/imag/abs) per requested k: X_k = Σ_t x_t·e^(−2πikt/n)
    with t the 0-based event-time rank and n the series length —
    three more columns per k (``{prefix}_fft{k}_re/_im/_abs``) in the
    SAME single aggregation (n comes from a count over the existing
    entity window, so the one-Exchange plan shape is preserved).
    Engine portability: IEEE basic ops (+,−,×,÷,√) are correctly
    rounded — identical on identical doubles everywhere — but
    transcendentals are not, so cos/sin are quantized to 10^-6 via
    ``floor(c·10^6 + 0.5)/10^6`` before the multiply; a cross-engine
    flip then needs a 1-ulp cos disagreement within 10^-10 of a
    quantization boundary (~10^-10 per term) instead of a raw
    last-digit coin flip per rounded output."""
    w = Window.partitionBy(entity_col).orderBy(time_col)
    w_all = Window.partitionBy(entity_col)
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    v = F.col(value_col).cast("double")

    Q = 1e6

    def dq(col):
        """Microunit quantization: exact integral decimal."""
        return F.floor(col * Q + F.lit(0.5)).cast("decimal(38,0)")

    def dsum(col):
        """Order-independent, engine-exact sum; double out."""
        return F.sum(dq(col)).cast("double") / Q

    if exact_sums:
        mean_win = (
            F.sum(dq(v)).over(w_all).cast("double") / Q
            / F.count(v).over(w_all)
        )
        # var_pop from exact moments: E[x²] − μ² (clamped: the
        # subtraction can go -1e-18 on constant series)
        varp_win = F.greatest(
            F.sum(dq(v * v)).over(w_all).cast("double") / Q
            / F.count(v).over(w_all)
            - mean_win * mean_win,
            F.lit(0.0),
        )
    else:
        mean_win = F.avg(v).over(w_all)
        varp_win = F.var_pop(v).over(w_all)

    d = (
        df.withColumn("__lag", F.lag(v).over(w))
        .withColumn("__chg", F.abs(v - F.col("__lag")))
        .withColumn("__mean", mean_win)
        .withColumn("__varp", varp_win)
        .withColumn(
            "__peak",
            F.coalesce((v > F.lag(v).over(w)) & (v > F.lead(v).over(w)), F.lit(False)),
        )
        # NULL values are explicitly NOT above the mean (they reset the
        # streak) — leaving the comparison NULL would make resets
        # depend on three-valued-logic subtleties the oracle would have
        # to replicate bug-for-bug
        .withColumn("__above", F.coalesce(v > F.col("__mean"), F.lit(False)))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "__last_not_above",
            F.max(F.when(~F.col("__above"), F.col("__rn"))).over(w_run),
        )
        .withColumn(
            "__streak",
            F.when(
                F.col("__above"),
                F.col("__rn") - F.coalesce(F.col("__last_not_above"), F.lit(0)),
            ).otherwise(F.lit(0)),
        )
    )
    if fft_k:
        # series length for the DFT angle — same w_all spec as the
        # mean/var windows, so no new Exchange
        d = d.withColumn("__n", F.count(F.lit(1)).over(w_all))
    chg = F.col("__chg")
    ac_term = (v - F.col("__mean")) * (F.col("__lag") - F.col("__mean"))
    if exact_sums:
        mean_expr = dsum(v) / F.count(v)
        sum_expr = dsum(v)
        energy_expr = dsum(v * v)
        mac_expr = dsum(chg) / F.count(chg)
        ac_num = dsum(ac_term)
        cid_expr = F.sqrt(dsum(chg * chg))
        # sample std from the exact moments: (Σx² − (Σx)²/n)/(n−1),
        # clamped (the subtraction can go −1e−18 on constant series)
        std_expr = F.when(
            F.count(v) > 1,
            F.sqrt(
                F.greatest(
                    (energy_expr - sum_expr * sum_expr / F.count(v))
                    / (F.count(v) - 1),
                    F.lit(0.0),
                )
            ),
        )
    else:
        mean_expr = F.avg(v)
        sum_expr = F.sum(v)
        energy_expr = F.sum(v * v)
        mac_expr = F.avg(chg)
        ac_num = F.sum(ac_term)
        cid_expr = F.sqrt(F.sum(chg * chg))
        std_expr = F.stddev_samp(v)
    fft_aggs = []
    for k in fft_k:
        # angle written as (2πk)·t / n with 2πk folded to ONE Python
        # double and the same association order in the oracle SQL:
        # multiply and divide are IEEE-exact, so both engines see the
        # identical angle double
        ck = 2.0 * math.pi * float(k)
        theta = F.lit(ck) * (F.col("__rn") - 1).cast("double") / F.col(
            "__n"
        ).cast("double")

        def q6(c):
            # transcendental outputs are the one implementation-defined
            # step — snap to the 1e-6 grid before any arithmetic
            return F.floor(c * 1e6 + F.lit(0.5)) / 1e6

        re_term = v * q6(F.cos(theta))
        im_term = -v * q6(F.sin(theta))
        if exact_sums:
            re_expr, im_expr = dsum(re_term), dsum(im_term)
        else:
            re_expr, im_expr = F.sum(re_term), F.sum(im_term)
        fft_aggs += [
            re_expr.alias(f"{prefix}_fft{k}_re"),
            im_expr.alias(f"{prefix}_fft{k}_im"),
            # sqrt/× are exact; Catalyst dedups the repeated aggregates
            F.sqrt(re_expr * re_expr + im_expr * im_expr).alias(
                f"{prefix}_fft{k}_abs"
            ),
        ]
    return d.groupBy(entity_col).agg(
        F.count(v).alias(f"{prefix}_length"),
        mean_expr.alias(f"{prefix}_mean"),
        std_expr.alias(f"{prefix}_std"),
        F.min(v).alias(f"{prefix}_min"),
        F.max(v).alias(f"{prefix}_max"),
        sum_expr.alias(f"{prefix}_sum"),
        energy_expr.alias(f"{prefix}_abs_energy"),
        mac_expr.alias(f"{prefix}_mean_abs_change"),
        F.min_by(v, F.col(time_col)).alias(f"{prefix}_first"),
        F.max_by(v, F.col(time_col)).alias(f"{prefix}_last"),
        F.sum(F.col("__peak").cast("long")).alias(f"{prefix}_n_peaks"),
        F.sum(F.col("__above").cast("long")).alias(f"{prefix}_count_above_mean"),
        F.max("__streak").alias(f"{prefix}_longest_strike_above_mean"),
        # autocorr denominator guarded: n<=1 or zero variance yield
        # NULL (a plain division would give NULL in Spark but ±inf in
        # some engines — the guard makes the semantics explicit)
        F.when(
            (F.count(v) > 1) & (F.max("__varp") > 0),
            ac_num / ((F.count(v) - 1) * F.max("__varp")),
        ).alias(f"{prefix}_autocorr1"),
        cid_expr.alias(f"{prefix}_cid_ce"),
        *fft_aggs,
    )
