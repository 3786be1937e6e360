"""MLBlocks-style primitive adapters (reference surface:
/root/reference/ballet/mlprimitives/__init__.py:42-71
``make_engineer_features`` / ``make_encode_target``, :86
``DropMissingTargets``; primitive JSON annotations under
ballet/mlprimitives/primitives/).

The reference packages a *project's* pipeline as reusable ML-pipeline
primitives, detecting the project from a package slug / path / cwd.
The engine has no filesystem project — the :class:`FeatureRegistry` is
the project — so the adapters take a registry (or an explicit feature
list) and hand back FRESH, unfitted pipeline objects, the analog of
the reference's ``deepcopy`` contract: a primitive instance fitted
inside one ML pipeline must never leak fitted state into the next.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ballet_spark.core import (
    EncoderPipeline,
    Feature,
    FeatureEngineeringPipeline,
    PipelineContext,
)
from ballet_spark.registry import FeatureRegistry


def make_engineer_features(
    registry: FeatureRegistry | None = None,
    features: Sequence[Feature] | None = None,
    owner: str | None = None,
    entity_col: str = "url",
    time_col: str = "warc_ts",
) -> FeatureEngineeringPipeline:
    """The ``engineer_features`` primitive: a fresh, unfitted
    :class:`FeatureEngineeringPipeline` over the registry's features
    (optionally one ``owner``'s) or an explicit list — the engine
    analog of ``make_engineer_features`` returning a deep copy of the
    project pipeline (reference :42-54)."""
    if (registry is None) == (features is None):
        raise ValueError("pass exactly one of registry= or features=")
    feats = list(features) if features is not None else registry.collect(owner)
    if not feats:
        raise ValueError("no features to build the primitive from")
    return FeatureEngineeringPipeline(
        feats, entity_col=entity_col, time_col=time_col
    )


class RobustEncoderPipeline(EncoderPipeline):
    """``make_robust_encoder(..., can_skip_transform_none=True)``
    analog (reference :57-71): transform of ``None`` returns ``None``
    instead of raising, so a scoring-only ML pipeline (no labels at
    predict time) can run the same primitive graph as training."""

    def __init__(self, steps, y_col: str = "y", can_skip_transform_none: bool = True):
        super().__init__(steps, y_col=y_col)
        self.can_skip_transform_none = can_skip_transform_none

    def transform(self, df: DataFrame | None) -> DataFrame | None:
        if df is None:
            if self.can_skip_transform_none:
                return None
            raise ValueError("target frame is None and skipping is disabled")
        return super().transform(df)

    def fit_transform(self, df: DataFrame | None) -> DataFrame | None:
        if df is None and self.can_skip_transform_none:
            return None
        return super().fit_transform(df)


def make_encode_target(
    steps, y_col: str = "y", can_skip_transform_none: bool = True
) -> RobustEncoderPipeline:
    """The ``encode_target`` primitive: a fresh robust encoder pipeline
    over the given transformer steps (reference :57-71)."""
    return RobustEncoderPipeline(
        steps, y_col=y_col, can_skip_transform_none=can_skip_transform_none
    )


def drop_missing_targets(
    X_df: DataFrame,
    y_df: DataFrame,
    y_col: str = "y",
    key_cols: Sequence[str] = ("url", "warc_ts"),
) -> tuple[DataFrame, DataFrame]:
    """``DropMissingTargets`` (reference :74-86) distributed: the
    reference builds a boolean mask over the target vector and
    row-aligns X by position; positional alignment does not exist on a
    distributed frame, so the engine drops NULL/NaN-target rows from
    ``y_df`` and KEY-aligns X with a semi-join on ``key_cols`` — the
    same surviving rows, join-aligned instead of index-aligned."""
    from pyspark.sql.types import DoubleType, FloatType

    # "missing" = NULL for any dtype, plus NaN for float targets only —
    # casting a categorical/string target to double would throw under
    # ANSI mode (the reference's DropMissingTargets handles any dtype)
    cond = F.col(y_col).isNotNull()
    if isinstance(y_df.schema[y_col].dataType, (DoubleType, FloatType)):
        cond = cond & ~F.isnan(F.col(y_col))
    y_ok = y_df.filter(cond)
    X_ok = X_df.join(
        y_ok.select(*key_cols).distinct(), on=list(key_cols), how="semi"
    )
    return X_ok, y_ok


def fit_context(
    entity_col: str = "url", time_col: str = "warc_ts", point_in_time: bool = False
) -> PipelineContext:
    """Context helper for fitting encoder primitives outside a feature
    pipeline (label encoding is not a point-in-time computation)."""
    return PipelineContext(
        entity_col=entity_col, time_col=time_col, point_in_time=point_in_time
    )
