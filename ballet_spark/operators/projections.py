"""Projections + remaining sklearn-surface transforms (SURVEY.md §2.3).

- :class:`Normalizer` — row-wise Lp normalization across the input
  columns (stateless expression).
- :class:`GaussianRandomProjection` / :class:`SparseRandomProjection`
  — fixed seeded projection matrix applied as expressions (the matrix
  is tiny and compiles into the plan as literals; no UDF needed for
  the typical ≤ a-few-hundred output dims).
- :class:`QuantileTransformer` — map values to [0,1] by the train
  quantile grid with linear interpolation (sklearn semantics with
  ``n_quantiles`` grid points); fit = one exact/approx percentile agg,
  transform = a compiled piecewise-linear expression.
- :class:`YeoJohnson` — fixed-λ Yeo-Johnson power transform
  (feature_engine surface; λ is a parameter, not MLE-fit, which the
  docstring flags explicitly).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ballet_spark.operators.base import SparkTransformer
from ballet_spark.operators.fitted import AggFittedTransformer


class Normalizer(SparkTransformer):
    """Row-wise Lp normalization over the feature's input columns
    (sklearn Normalizer)."""

    def __init__(self, norm: str = "l2"):
        if norm not in ("l1", "l2", "max"):
            raise ValueError(norm)
        self.norm = norm

    def transform_exprs(self, in_exprs, ctx):
        doubles = [e.cast("double") for e in in_exprs]
        if self.norm == "l1":
            denom = sum([F.abs(e) for e in doubles], F.lit(0.0))
        elif self.norm == "l2":
            denom = F.sqrt(sum([e * e for e in doubles], F.lit(0.0)))
        else:
            denom = F.greatest(*[F.abs(e) for e in doubles]) if len(doubles) > 1 else F.abs(doubles[0])
        return [F.when(denom != 0, e / denom).otherwise(e) for e in doubles]


class GaussianRandomProjection(SparkTransformer):
    """y = X @ R with a fixed seeded N(0, 1/k) matrix
    (sklearn GaussianRandomProjection; ballet/eng/external/sklearn.py:17)."""

    def __init__(self, n_components: int = 4, seed: int = 42):
        self.n_components = n_components
        self.seed = seed

    def fit(self, df, cols, ctx, y=None):
        rng = np.random.default_rng(self.seed)
        self.matrix_ = rng.standard_normal((len(cols), self.n_components)) / np.sqrt(
            self.n_components
        )
        return self

    def transform_exprs(self, in_exprs, ctx):
        doubles = [e.cast("double") for e in in_exprs]
        out = []
        for j in range(self.n_components):
            comp = sum(
                (doubles[i] * F.lit(float(self.matrix_[i, j])) for i in range(len(doubles))),
                F.lit(0.0),
            )
            out.append(comp)
        return out


class SparseRandomProjection(SparkTransformer):
    """Achlioptas sparse projection: entries ±sqrt(s/k) w.p. 1/2s, else
    0 (s = sqrt(d)) — sklearn SparseRandomProjection defaults."""

    def __init__(self, n_components: int = 4, seed: int = 42):
        self.n_components = n_components
        self.seed = seed

    def fit(self, df, cols, ctx, y=None):
        d = len(cols)
        s = max(1.0, np.sqrt(d))
        rng = np.random.default_rng(self.seed)
        draws = rng.random((d, self.n_components))
        vals = np.zeros((d, self.n_components))
        scale = np.sqrt(s / self.n_components)
        vals[draws < 1 / (2 * s)] = scale
        vals[draws > 1 - 1 / (2 * s)] = -scale
        self.matrix_ = vals
        return self

    transform_exprs = GaussianRandomProjection.transform_exprs


class QuantileTransformer(AggFittedTransformer):
    """Map to [0,1] by the train quantile grid, linear interpolation
    between grid points, clipped at the tails (sklearn
    QuantileTransformer(output_distribution='uniform') semantics on an
    ``n_quantiles``-point grid)."""

    def __init__(self, n_quantiles: int = 11, exact: bool = True):
        if n_quantiles < 2:
            raise ValueError("n_quantiles >= 2")
        self.n_quantiles = n_quantiles
        self.exact = exact

    def _agg_exprs(self, c):
        qs = [i / (self.n_quantiles - 1) for i in range(self.n_quantiles)]
        if self.exact:
            return {f"q{i}": F.percentile(c, F.lit(q)) for i, q in enumerate(qs)}
        return {
            f"q{i}": F.percentile_approx(c, F.lit(q), F.lit(10000))
            for i, q in enumerate(qs)
        }

    def _apply(self, e, p):
        n = self.n_quantiles
        e = e.cast("double")
        # piecewise linear: locate the grid segment, interpolate
        expr = F.lit(1.0)
        for i in reversed(range(n - 1)):
            lo, hi = p[f"q{i}"], p[f"q{i+1}"]
            frac = F.lit(i / (n - 1)) + F.when(
                hi != lo, (e - lo) / (hi - lo) * F.lit(1.0 / (n - 1))
            ).otherwise(F.lit(0.0))
            expr = F.when(e <= hi, frac).otherwise(expr)
        expr = F.when(e < p["q0"], F.lit(0.0)).otherwise(expr)
        clipped = F.least(F.greatest(expr, F.lit(0.0)), F.lit(1.0))
        # NULL/NaN inputs propagate (sklearn semantics) — every when()
        # condition above is NULL-false, so without the guard missing
        # values would fall through to the 1.0 base case
        return F.when(e.isNull() | F.isnan(e), e).otherwise(clipped)


def yeo_johnson_expr(e, lmbda: float):
    """Yeo-Johnson power transform at fixed λ (public formula)."""
    e = e.cast("double")
    if lmbda == 0.0:
        pos = F.log1p(e)
    else:
        pos = (F.pow(e + 1.0, F.lit(lmbda)) - 1.0) / F.lit(lmbda)
    if lmbda == 2.0:
        neg = -F.log1p(-e)
    else:
        neg = -(F.pow(-e + 1.0, F.lit(2.0 - lmbda)) - 1.0) / F.lit(2.0 - lmbda)
    return F.when(e >= 0, pos).otherwise(neg)


class YeoJohnson(SparkTransformer):
    """Fixed-λ Yeo-Johnson (feature_engine YeoJohnsonTransformer
    surface; λ is a hyperparameter here — MLE fitting of λ is a
    driver-side scalar optimization left for a later round)."""

    def __init__(self, lmbda: float = 0.0):
        self.lmbda = lmbda

    def transform_exprs(self, in_exprs, ctx):
        return [yeo_johnson_expr(e, self.lmbda) for e in in_exprs]
