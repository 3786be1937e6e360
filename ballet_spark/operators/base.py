"""Transformer protocol + core stateless/composite transformers.

Mirrors the reference transformer algebra (ballet/eng/base.py,
ballet/transformer.py) with a Spark-native execution contract:

- ``fit(train_df, cols, ctx, y)`` may run aggregation *jobs* over the
  train slice and stores small params driver-side (or as a params
  DataFrame) — the fit/transform leakage discipline of
  ballet/eng/base.py:94-148;
- ``transform_exprs(in_exprs, ctx)`` returns Column expressions when the
  operator is expressible inside one Catalyst ``select`` (the fast path
  — whole-stage codegen, zero extra shuffles), or ``None``;
- ``transform_df(df, cols, alias, ctx)`` is the fallback for operators
  that need a params-table join or a grouped pandas UDF; it must
  *preserve* existing columns and returns ``(df, new_output_names)``.
"""

from __future__ import annotations

import copy as _copy
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class SparkTransformer:
    """Base operator. Subclasses override ``fit`` and ``transform_exprs``
    (preferred) or ``transform_df`` (join/UDF path)."""

    def copy(self) -> "SparkTransformer":
        return _copy.deepcopy(self)

    def fit(self, df: DataFrame, cols: list[str], ctx, y=None) -> "SparkTransformer":
        return self

    def transform_exprs(self, in_exprs: list[Column], ctx) -> list[Column] | None:
        return None

    def transform_df(self, df: DataFrame, cols: list[str], alias: str, ctx):
        exprs = self.transform_exprs([F.col(c) for c in cols], ctx)
        if exprs is None:
            raise NotImplementedError(f"{type(self).__name__} has no transform path")
        names = [alias] if len(exprs) == 1 else [f"{alias}_{i}" for i in range(len(exprs))]
        return df.select("*", *[e.alias(n) for e, n in zip(exprs, names)]), names


class Identity(SparkTransformer):
    """Pass-through (ballet/eng/misc.py:25-30)."""

    def transform_exprs(self, in_exprs, ctx):
        return list(in_exprs)


class SparkFunctionTransformer(SparkTransformer):
    """Apply a Column-expression builder (ballet/eng/base.py:41-61
    ``SimpleFunctionTransformer`` for expressible funcs). ``fn`` receives
    the input Columns and returns a Column or list of Columns."""

    def __init__(self, fn: Callable):
        self.fn = fn

    def transform_exprs(self, in_exprs, ctx):
        out = self.fn(*in_exprs)
        return list(out) if isinstance(out, (list, tuple)) else [out]


class PandasSeriesTransformer(SparkTransformer):
    """Vectorized pandas UDF step (Series… → Series), the sanctioned
    slow path per BASELINE.json input_hint (no per-row Python). The same
    python function doubles as the test oracle's pandas kernel."""

    def __init__(self, fn: Callable, return_type: str = "double"):
        self.fn = fn
        self.return_type = return_type

    def transform_exprs(self, in_exprs, ctx):
        udf = F.pandas_udf(self.fn, self.return_type)
        return [udf(*in_exprs)]


class SubsetTransformer(SparkTransformer):
    """Nested transform of a *different* column subset
    (ballet/eng/base.py:329-361; tuple sugar ballet/transformer.py:290-309)."""

    def __init__(self, input, transformer: SparkTransformer):
        self.input = input
        self.transformer = transformer

    def _own_cols(self, df_or_none, cols_fallback=None):
        if isinstance(self.input, str):
            return [self.input]
        if callable(self.input) and not isinstance(self.input, (list, tuple)):
            got = self.input(df_or_none)
            # a selector returning one name must not explode into
            # characters (same guard as Feature.resolve_input)
            return [got] if isinstance(got, str) else list(got)
        return list(self.input)

    def fit(self, df, cols, ctx, y=None):
        own = self._own_cols(df)
        self.transformer.fit(df, own, ctx, y=y)
        self._fitted_cols = own
        return self

    def transform_exprs(self, in_exprs, ctx):
        own = getattr(self, "_fitted_cols", None) or self._own_cols(None)
        return self.transformer.transform_exprs([F.col(c) for c in own], ctx)

    def transform_df(self, df, cols, alias, ctx):
        own = getattr(self, "_fitted_cols", None) or self._own_cols(df)
        return self.transformer.transform_df(df, own, alias, ctx)


class TransformerPipeline(SparkTransformer):
    """Sequential composition (list sugar, ballet/transformer.py:43-50).

    Fitting step *k+1* uses step *k*'s (lazy) transform output on the
    train frame — identical to sklearn Pipeline fit semantics without
    materializing intermediates eagerly.
    """

    def __init__(self, steps: Sequence[SparkTransformer]):
        self.steps = list(steps)

    def fit(self, df, cols, ctx, y=None):
        cur_df, cur_cols = df, list(cols)
        for i, step in enumerate(self.steps):
            step.fit(cur_df, cur_cols, ctx, y=y)
            cur_df, cur_cols = step.transform_df(cur_df, cur_cols, f"__pipe{i}", ctx)
        return self

    def transform_exprs(self, in_exprs, ctx):
        exprs = list(in_exprs)
        for step in self.steps:
            exprs = step.transform_exprs(exprs, ctx)
            if exprs is None:
                return None
        return exprs

    def transform_df(self, df, cols, alias, ctx):
        exprs = self.transform_exprs([F.col(c) for c in cols], ctx)
        if exprs is not None:
            names = [alias] if len(exprs) == 1 else [
                f"{alias}_{i}" for i in range(len(exprs))
            ]
            return df.select("*", *[e.alias(n) for e, n in zip(exprs, names)]), names
        cur_df, cur_cols = df, list(cols)
        for i, step in enumerate(self.steps):
            # intermediates MUST reuse the fit-time aliases (__pipe{i}):
            # stateful df-path steps key their params by the column
            # names they were fitted on, so step k+1's input names have
            # to match between fit and transform; only the final step's
            # OUTPUT takes the caller's alias
            nm = alias if i == len(self.steps) - 1 else f"__pipe{i}"
            cur_df, cur_cols = step.transform_df(cur_df, cur_cols, nm, ctx)
        return cur_df, cur_cols


class ColumnSelector(SparkTransformer):
    """Projection (ballet/eng/misc.py:159-170)."""

    def __init__(self, cols: Sequence[str]):
        self.cols = [cols] if isinstance(cols, str) else list(cols)

    def transform_exprs(self, in_exprs, ctx):
        return [F.col(c) for c in self.cols]


class ValueReplacer(SparkTransformer):
    """``X[X == value] = replacement`` (ballet/eng/misc.py:58-75)."""

    def __init__(self, value, replacement):
        self.value = value
        self.replacement = replacement

    def transform_exprs(self, in_exprs, ctx):
        return [
            F.when(e == F.lit(self.value), F.lit(self.replacement)).otherwise(e)
            for e in in_exprs
        ]


class NullFiller(SparkTransformer):
    """Replace nulls/NaN (ballet/eng/missing.py:20-38). The reference's
    default null test ``pd.isnull`` maps to NULL-or-NaN for doubles."""

    def __init__(self, replacement=0.0, also_nan: bool = True):
        self.replacement = replacement
        self.also_nan = also_nan

    def transform_exprs(self, in_exprs, ctx):
        out = []
        for e in in_exprs:
            filled = F.coalesce(e, F.lit(self.replacement))
            if self.also_nan:
                # cast-to-double guard lets this compile for non-numeric
                # inputs too (when-condition NULL ⇒ otherwise branch)
                filled = F.when(
                    F.isnan(e.cast("double")), F.lit(self.replacement)
                ).otherwise(filled)
            out.append(filled)
        return out


class NullIndicator(SparkTransformer):
    """``isnull → int`` (ballet/eng/missing.py:41-45)."""

    def __init__(self, also_nan: bool = True):
        self.also_nan = also_nan

    def transform_exprs(self, in_exprs, ctx):
        if self.also_nan:
            return [
                (
                    e.isNull()
                    | F.coalesce(F.isnan(e.cast("double")), F.lit(False))
                ).cast("int")
                for e in in_exprs
            ]
        return [e.isNull().cast("int") for e in in_exprs]
