"""mlprimitives adapter surface (reference
ballet/mlprimitives/__init__.py:42-86): primitives are fresh/unfitted
per call, robust encoder skips None, DropMissingTargets key-aligns."""

import pytest
from pyspark.sql import functions as F

from ballet_spark.core import Feature
from ballet_spark.mlprimitives import (
    drop_missing_targets,
    fit_context,
    make_encode_target,
    make_engineer_features,
)
from ballet_spark.operators.base import SparkFunctionTransformer
from ballet_spark.registry import FeatureRegistry


def _registry():
    reg = FeatureRegistry()
    reg.register(
        "alice/feature_len",
        Feature("text", SparkFunctionTransformer(lambda c: F.length(c)), output="t_len"),
    )
    reg.register(
        "bob/feature_upper",
        Feature(
            "lang", SparkFunctionTransformer(lambda c: F.upper(c)), output="lang_u"
        ),
    )
    return reg


def test_make_engineer_features_from_registry(spark, webtext_df):
    pipe = make_engineer_features(registry=_registry())
    out = pipe.fit(webtext_df).transform(webtext_df)
    assert {"t_len", "lang_u"} <= set(out.columns)
    # owner filter
    pipe_a = make_engineer_features(registry=_registry(), owner="alice")
    out_a = pipe_a.fit(webtext_df).transform(webtext_df)
    assert "t_len" in out_a.columns and "lang_u" not in out_a.columns
    # fresh object per call (deepcopy contract): fitting one must not
    # alias the other
    assert make_engineer_features(registry=_registry()) is not pipe


def test_make_engineer_features_arg_validation():
    with pytest.raises(ValueError, match="exactly one"):
        make_engineer_features()
    with pytest.raises(ValueError, match="exactly one"):
        make_engineer_features(registry=_registry(), features=[])
    with pytest.raises(ValueError, match="no features"):
        make_engineer_features(registry=FeatureRegistry())


def test_robust_encoder_skips_none(spark):
    enc = make_encode_target([lambda c: c * 2], y_col="y")
    assert enc.transform(None) is None
    assert enc.fit_transform(None) is None
    df = spark.createDataFrame([(1.0,), (2.0,)], "y double")
    out = enc.fit(df, fit_context()).transform(df)
    vals = sorted(r[-1] for r in out.collect())
    assert vals == [2.0, 4.0]
    strict = make_encode_target([None], can_skip_transform_none=False)
    with pytest.raises(ValueError, match="None"):
        strict.transform(None)


def test_drop_missing_targets_key_aligns(spark):
    X = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 30.0)],
        "url string, warc_ts int, f double",
    )
    y = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, None), ("b", 1, float("nan"))],
        "url string, warc_ts int, y double",
    )
    X_ok, y_ok = drop_missing_targets(X, y)
    assert [tuple(r) for r in y_ok.collect()] == [("a", 1, 1.0)]
    assert [tuple(r) for r in X_ok.collect()] == [("a", 1, 10.0)]


def test_drop_missing_targets_string_labels(spark):
    """Categorical targets must work: only NULL counts as missing (a
    double-cast would throw under ANSI mode on 'spam')."""
    X = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0)], "url string, warc_ts int, f double"
    )
    y = spark.createDataFrame(
        [("a", 1, "spam"), ("a", 2, None)], "url string, warc_ts int, y string"
    )
    X_ok, y_ok = drop_missing_targets(X, y)
    assert [r["y"] for r in y_ok.collect()] == ["spam"]
    assert X_ok.count() == 1
