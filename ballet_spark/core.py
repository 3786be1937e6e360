"""Core model: Feature definitions compiled to one Catalyst plan.

Re-expresses the reference's abstractions (ballet/feature.py:47-66,
ballet/pipeline.py:19-42, ballet/transformer.py:25-50,290-309) as
declarative Spark operators:

- a :class:`Feature` binds *input columns* to a *transformer* and names
  its outputs — the reference's ``Feature(input, transformer, name,
  output)`` (ballet/feature.py:47-66);
- a transformer is a :class:`~ballet_spark.operators.base.SparkTransformer`
  with a **fit stage** (aggregations over the train slice producing a
  small params object/table — never recomputed on transform rows, the
  reference's leakage discipline, ballet/eng/base.py:94-148) and a
  **transform stage** that compiles to Column expressions or, when a
  params-table join / grouped pandas UDF is required, a DataFrame →
  DataFrame step;
- a :class:`FeatureEngineeringPipeline` fits every feature on the train
  slice and merges all transform stages into the minimum number of
  selects/joins, so Catalyst sees one wide plan and prunes/pushes/CSEs
  across features (ballet/pipeline.py:19-42 concatenation semantics).

Desugaring mirrors ballet/transformer.py:290-309: ``None`` → identity,
a Python callable → a function transformer, a tuple ``(input,
transformer)`` → a subset transformer on other columns, a nested
``Feature`` → reuse of that feature's transformer on its own inputs,
and a list → sequential composition.
"""

from __future__ import annotations

import functools
import hashlib
import re
import types
from dataclasses import dataclass, field
from typing import Callable, Sequence

try:
    import numpy as np
except ImportError:  # pragma: no cover
    np = None

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ballet_spark.operators.base import (
    Identity,
    SparkFunctionTransformer,
    SparkTransformer,
    SubsetTransformer,
    TransformerPipeline,
)


class LeakageError(ValueError):
    """A feature attempted to read data after its as-of timestamp."""


@dataclass
class PipelineContext:
    """Execution context shared by all operators of one pipeline.

    ``entity_col``/``time_col`` define the point-in-time key (url,
    warc_ts per BASELINE.json). ``point_in_time`` arms the compile-time
    leakage guard: window frames must end at or before the current row
    and ``lead``/future frames are rejected (SURVEY.md §4.2) unless the
    transformer is explicitly whitelisted as a label builder.
    """

    entity_col: str = "url"
    time_col: str = "warc_ts"
    point_in_time: bool = True

    @property
    def keys(self) -> list[str]:
        return [self.entity_col, self.time_col]

    def check_frame(self, end_offset, what: str = "window") -> None:
        """Leakage guard: reject frames extending past the current row."""
        if self.point_in_time and end_offset is not None and end_offset > 0:
            raise LeakageError(
                f"{what} reads {end_offset} rows/units past the as-of "
                f"timestamp; point-in-time mode forbids future data"
            )


def _code_key(code) -> str:
    """Canonical process-stable string for a code object. Nested
    code objects (a lambda/genexp inside the function) appear in
    ``co_consts``, and their default repr embeds a memory address —
    recurse into them instead of repr-ing them. Non-code consts go
    through ``_value_key``, NOT repr: a frozenset constant (compiled
    from an ``x in {...}`` literal) reprs in hash order, which varies
    with PYTHONHASHSEED — exactly the cross-process instability this
    function exists to prevent (_value_key sorts set elements)."""
    parts = [code.co_code.hex()]
    for c in code.co_consts:
        parts.append(_code_key(c) if hasattr(c, "co_code") else _value_key(c))
    parts.extend(code.co_names)
    return "(" + ",".join(parts) + ")"


_DEFAULT_REPR_RE = re.compile(r"<[\w.]+ object at 0x[0-9a-fA-F]+>")
# Any hex address in a fallback repr (bound methods, functools.partial,
# custom __repr__s that embed id(self)) is per-process noise: mask the
# digits, keep the surrounding structure as distinguishing info.
_HEX_ADDR_RE = re.compile(r"0x[0-9a-fA-F]+")


def _value_key(v, depth: int = 0) -> str:
    """Process-stable key for a captured value.

    Primitives repr exactly (a literal ``'0x1f'`` string must NOT be
    masked); containers recurse with sets/dicts ordered by element key
    so the result doesn't depend on ``PYTHONHASHSEED``; functions
    recurse through ``_callable_key`` (their closures may themselves
    capture functions). Arbitrary objects use class identity plus
    their ``vars()`` recursed — two instances differing only in
    attributes must hash apart, and the default ``<... object at
    0x...>`` repr (memory address: different every process) is never
    allowed into the key."""
    if depth > 8:
        return "<deep>"
    if v is None or isinstance(v, (bool, int, float, complex, str, bytes)):
        return repr(v)
    if isinstance(v, functools.partial):
        # partial's repr embeds the wrapped function's address; recurse
        # through func/args/keywords instead so the key is content-based
        return (
            "p("
            + _value_key(v.func, depth + 1)
            + ";a:" + ",".join(_value_key(a, depth + 1) for a in v.args)
            + ";k:" + ",".join(
                f"{k}={_value_key(v.keywords[k], depth + 1)}"
                for k in sorted(v.keywords)
            )
            + ")"
        )
    if np is not None and isinstance(v, np.ndarray):
        # repr truncates large arrays ('...') — distinct arrays would
        # collide; hash shape+dtype+contents instead. Object dtype must
        # be checked EXPLICITLY: tobytes() on dtype=object does not
        # raise, it silently serializes PyObject POINTER bytes — a
        # per-process address key, the exact instability this function
        # exists to prevent.
        if v.dtype.hasobject:
            return "nd(" + _value_key(v.tolist(), depth + 1) + ")"
        body = np.ascontiguousarray(v).tobytes()
        return (
            f"nd[{v.shape},{v.dtype}]:"
            + hashlib.md5(body).hexdigest()[:16]
        )
    if callable(v) and hasattr(v, "__code__"):
        return "fn:" + _callable_key(v, depth + 1)
    if hasattr(v, "co_code"):
        return _code_key(v)
    if isinstance(v, (tuple, list)):
        tag = "t" if isinstance(v, tuple) else "l"
        return tag + "(" + ",".join(_value_key(x, depth + 1) for x in v) + ")"
    if isinstance(v, (set, frozenset)):
        return "s(" + ",".join(sorted(_value_key(x, depth + 1) for x in v)) + ")"
    if isinstance(v, dict):
        items = sorted(
            (_value_key(k, depth + 1), _value_key(x, depth + 1))
            for k, x in v.items()
        )
        return "d(" + ",".join(f"{k}:{x}" for k, x in items) + ")"
    cls = f"{type(v).__module__}.{type(v).__qualname__}"
    try:
        state = vars(v)
    except TypeError:
        state = None
    if state is not None:
        items = sorted(
            (k, _value_key(x, depth + 1)) for k, x in state.items()
        )
        return f"o[{cls}](" + ",".join(f"{k}={x}" for k, x in items) + ")"
    r = repr(v)
    if _DEFAULT_REPR_RE.search(r):
        # default object repr embeds a memory address — opaque but
        # stable beats unique-per-process
        return f"o[{cls}]<opaque>"
    # custom reprs may still embed id(self) (or a wrapped function's
    # address) — mask the hex digits, keep the structure
    return f"o[{cls}]{_HEX_ADDR_RE.sub('0x', r)}"


def _callable_key(fn: Callable, depth: int = 0) -> str:
    """Identity + bytecode + *captured state*: ``__defaults__``,
    ``__kwdefaults__``, and closure cell values all fold in, so two
    closures built from the same code with different captured
    parameters hash differently (a resumed materialize() must NOT
    treat a re-parameterized feature as already complete)."""
    if isinstance(fn, functools.partial):
        # no __code__/__name__ of its own: key on func+bound args, else
        # every partial collapses to one identity
        return "partial|" + _value_key(fn, depth)
    name = getattr(fn, "__name__", "selector")
    ident = f"{getattr(fn, '__module__', '')}.{getattr(fn, '__qualname__', name)}"
    code = getattr(fn, "__code__", None)
    if code is not None:
        ident += "|" + _code_key(code)
    defaults = getattr(fn, "__defaults__", None) or ()
    if defaults:
        ident += "|d:" + ",".join(_value_key(v, depth) for v in defaults)
    kwdefaults = getattr(fn, "__kwdefaults__", None) or {}
    if kwdefaults:
        ident += "|k:" + ",".join(
            f"{k}={_value_key(kwdefaults[k], depth)}" for k in sorted(kwdefaults)
        )
    closure = getattr(fn, "__closure__", None) or ()
    if closure:
        cells = []
        for cell in closure:
            try:
                cells.append(_value_key(cell.cell_contents, depth))
            except ValueError:  # unfilled cell (recursive def mid-construction)
                cells.append("<empty>")
        ident += "|c:" + ",".join(cells)
    bound = getattr(fn, "__self__", None)
    if bound is not None and not isinstance(bound, types.ModuleType):
        # bound method: two instances' .f share code+closure; the
        # receiver's state must fold in or they hash identically
        ident += "|self:" + _value_key(bound, depth + 1)
    return ident


def _hash_callable(fn: Callable) -> str:
    """Deterministic across processes: hash the callable's identity
    (module.qualname), compiled bytecode, defaults, and closure cell
    values — NEVER ``repr(fn)`` or raw ``repr(co_consts)``, whose
    embedded memory addresses would give a resumed job different
    auto-generated column names than the run that wrote the matrix."""
    name = getattr(fn, "__name__", "selector")
    ident = _callable_key(fn)
    return f"{name}_{hashlib.md5(ident.encode()).hexdigest()[:6]}"


def desugar_transformer(spec) -> SparkTransformer:
    """ballet/transformer.py:290-309 sugar, Spark-side."""
    if spec is None:
        return Identity()
    if isinstance(spec, SparkTransformer):
        return spec
    if isinstance(spec, Feature):
        return SubsetTransformer(spec.input, desugar_transformer(spec.transformer))
    if isinstance(spec, tuple) and len(spec) == 2:
        return SubsetTransformer(spec[0], desugar_transformer(spec[1]))
    if isinstance(spec, (list,)):
        return TransformerPipeline([desugar_transformer(s) for s in spec])
    if callable(spec):
        return SparkFunctionTransformer(spec)
    raise TypeError(f"cannot desugar transformer spec: {spec!r}")


@dataclass
class Feature:
    """``Feature(input, transformer, name, output)``.

    ``input``: column name, list of names, or a callable evaluated
    against the DataFrame schema at compile time (the reference
    evaluates callables against the pandas frame at fit time,
    ballet/feature.py:25-31).
    """

    input: str | Sequence[str] | Callable
    transformer: object = None
    name: str | None = None
    output: str | None = None
    description: str = ""
    source: str = ""
    options: dict = field(default_factory=dict)

    def __post_init__(self):
        self._transformer = desugar_transformer(self.transformer)
        if self.name is None and self.output is None:
            if isinstance(self.input, str):
                base = self.input
            elif callable(self.input) and not isinstance(self.input, (list, tuple)):
                base = _hash_callable(self.input)
            else:
                base = "_".join(self.input)
            self.name = f"feat_{base}"

    @property
    def alias(self) -> str:
        return self.output or self.name.replace(" ", "_").lower()

    def resolve_input(self, df: DataFrame) -> list[str]:
        if isinstance(self.input, str):
            return [self.input]
        if callable(self.input) and not isinstance(self.input, (list, tuple)):
            sel = self.input(df)
            return [sel] if isinstance(sel, str) else list(sel)
        return list(self.input)

    # -- single-feature convenience (reference Feature.pipeline,
    #    ballet/feature.py:91-123) ------------------------------------
    def pipeline(self, **ctx_kwargs) -> "FeatureEngineeringPipeline":
        return FeatureEngineeringPipeline([self], **ctx_kwargs)


def output_names(feature: Feature, n_out: int) -> list[str]:
    """Multi-output aliasing ``alias_0..alias_{q-1}``
    (ballet/pipeline.py:48-65)."""
    if n_out == 1:
        return [feature.alias]
    return [f"{feature.alias}_{i}" for i in range(n_out)]


class FittedFeaturePipeline:
    """Result of :meth:`FeatureEngineeringPipeline.fit` — immutable
    fitted states; ``transform`` never re-aggregates over its input."""

    def __init__(
        self,
        pipeline: "FeatureEngineeringPipeline",
        states: list,
        fit_cols: list[list[str]] | None = None,
    ):
        self.pipeline = pipeline
        self._states = states
        self._fit_cols = fit_cols

    def transform(self, df: DataFrame) -> DataFrame:
        ctx = self.pipeline.ctx
        keys = [k for k in ctx.keys if k in df.columns]
        expr_outputs: list[Column] = []
        cur = df
        df_names: list[str] = []

        for i, (feat, tr) in enumerate(zip(self.pipeline.features, self._states)):
            # inputs were resolved against the TRAIN schema at fit —
            # re-running a callable selector against the transform frame
            # could resolve different/reordered columns and silently
            # misalign them with the positionally-keyed fitted params
            if self._fit_cols is not None:
                cols = self._fit_cols[i]
            else:
                cols = feat.resolve_input(df)
            exprs = tr.transform_exprs([F.col(c) for c in cols], ctx)
            if exprs is not None:
                names = output_names(feat, len(exprs))
                expr_outputs.extend(e.alias(n) for e, n in zip(exprs, names))
            else:
                # params-table join / grouped pandas UDF path: chains on
                # ``cur``, must preserve existing columns
                cur, names = tr.transform_df(cur, cols, feat.alias, ctx)
                df_names.extend(names)

        # Pure-expr features resolve by name against ``cur`` (a superset
        # of df's columns), so one final select merges both paths and
        # Catalyst prunes/CSEs across all features.
        return cur.select(
            *[F.col(k) for k in keys],
            *expr_outputs,
            *[F.col(n) for n in df_names],
        )


class FeatureEngineeringPipeline:
    """Applies each feature and horizontally concatenates the outputs
    (ballet/pipeline.py:19-42). Empty feature list ⇒ key-only frame,
    the analog of ``NullTransformer``'s ``np.empty((n, 0))``
    (ballet/eng/misc.py:119-127)."""

    def __init__(
        self,
        features: Sequence[Feature],
        entity_col: str = "url",
        time_col: str = "warc_ts",
        point_in_time: bool = True,
    ):
        self.features = list(features)
        self.ctx = PipelineContext(entity_col, time_col, point_in_time)

    def fit(self, train_df: DataFrame, y: str | None = None) -> FittedFeaturePipeline:
        """``y`` is the LABEL COLUMN NAME inside ``train_df`` (the
        supervised encoders aggregate it distributedly; see
        encoders.py) — not a separate label DataFrame."""
        if y is not None and not isinstance(y, str):
            raise TypeError(
                "y must be the label column name (a str) present in "
                f"train_df, got {type(y).__name__}"
            )
        states = []
        fit_cols = []
        for feat in self.features:
            cols = feat.resolve_input(train_df)
            tr = feat._transformer.copy()
            tr.fit(train_df, cols, self.ctx, y=y)
            states.append(tr)
            fit_cols.append(cols)
        return FittedFeaturePipeline(self, states, fit_cols)

    def fit_transform(self, df: DataFrame, y: str | None = None) -> DataFrame:
        return self.fit(df, y).transform(df)


class EncoderPipeline:
    """y-only transformer pipeline (C8, ballet/encoder.py:7-55): the
    label column runs through the same transformer algebra as features,
    producing the encoded target column ``y``."""

    def __init__(self, steps, y_col: str = "y"):
        self.y_col = y_col
        self._tr = desugar_transformer(list(steps) if isinstance(steps, (list, tuple)) else [steps])

    def fit(self, df: DataFrame, ctx: PipelineContext | None = None):
        self._ctx = ctx or PipelineContext(point_in_time=False)
        self._tr.fit(df, [self.y_col], self._ctx)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if not hasattr(self, "_ctx"):
            raise RuntimeError(
                "EncoderPipeline.transform called before fit — call "
                "fit(df) (or fit_transform) first"
            )
        out, names = self._tr.transform_df(df, [self.y_col], "y_encoded", self._ctx)
        return out.select(*df.columns, *[F.col(n) for n in names])

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)


@dataclass
class EngineerFeaturesResult:
    """C9 result bundle (ballet/pipeline.py:74-81): the wide matrix,
    the features that produced it, the fitted pipeline, and the
    (optionally encoded) target frame."""

    X_df: DataFrame
    features: list
    pipeline: "FittedFeaturePipeline"
    X: DataFrame
    y_df: DataFrame | None = None
    encoder: EncoderPipeline | None = None
    y: DataFrame | None = None


def engineer_features(
    X_df: DataFrame,
    features: Sequence[Feature],
    y_df: DataFrame | None = None,
    y_col: str | None = None,
    encoder: EncoderPipeline | None = None,
    entity_col: str = "url",
    time_col: str = "warc_ts",
) -> EngineerFeaturesResult:
    """Build + fit the pipeline from all features, materialize the wide
    matrix, optionally encode the target (ballet/pipeline.py:84-119)."""
    pipe = FeatureEngineeringPipeline(
        features, entity_col=entity_col, time_col=time_col
    )
    fitted = pipe.fit(X_df, y=y_col)
    X = fitted.transform(X_df)
    y = None
    if encoder is not None and y_df is not None:
        y = encoder.fit_transform(y_df)
    return EngineerFeaturesResult(
        X_df=X_df, features=list(features), pipeline=fitted, X=X,
        y_df=y_df, encoder=encoder, y=y,
    )
