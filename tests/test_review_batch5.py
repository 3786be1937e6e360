"""Regressions for the fifth review batch: pipeline fit/transform
naming, selector handling, fit-time input pinning, process-stable
hashing, registry provenance, unseen-row validation."""

import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from ballet_spark.core import Feature, FeatureEngineeringPipeline


def test_stateful_step_after_step_in_pipeline(spark, webtext_df):
    """A stateful df-path step fitted mid-pipeline keys its params by
    the fit-time intermediate column names — transform must reproduce
    those names exactly."""
    from ballet_spark.operators.base import NullFiller
    from ballet_spark.operators.fitted import Groupwise, StandardScaler

    df = webtext_df.withColumn("text_len", F.length("text").cast("double"))
    feat = Feature(
        "text_len", [NullFiller(), Groupwise(StandardScaler(), by="lang")],
        output="z",
    )
    m = FeatureEngineeringPipeline([feat]).fit(df).transform(df)
    assert m.filter(F.col(m.columns[-1]).isNotNull()).count() > 0


def test_subset_selector_single_string_not_exploded(spark, webtext_df):
    feat = Feature("text", ((lambda df: "text"), None), output="t2")
    m = FeatureEngineeringPipeline([feat]).fit(webtext_df).transform(webtext_df)
    assert "t2" in m.columns  # would raise AnalysisException on 't','e','x','t'


def test_callable_input_pinned_at_fit(spark):
    """A callable selector resolves against the TRAIN schema; a
    transform frame with extra/reordered columns must not remap the
    fitted params."""
    from ballet_spark.operators.fitted import StandardScaler

    train = spark.createDataFrame(
        [("u", float(i), float(i) * 100.0) for i in range(10)],
        "url string, a double, b double",
    ).withColumn("warc_ts", F.timestamp_seconds(F.col("a")))
    # selector: all double columns in schema order
    feat = Feature(
        lambda df: [c for c, t in df.dtypes if t == "double"],
        StandardScaler(),
        output="s",
    )
    fitted = FeatureEngineeringPipeline([feat]).fit(train)
    # new frame with an extra double column FIRST in the schema
    shifted = train.select(
        F.lit(1e9).alias("zz"), "url", "warc_ts", "a", "b"
    )
    out = fitted.transform(shifted).toPandas()
    # column a scaled by a's own fit stats: mean 4.5, stddev_pop
    # ~2.8723 -> min value (0-4.5)/2.8723 ~ -1.5667. If the selector
    # re-resolved against the shifted schema, 'a' would be scaled by
    # zz/b stats instead and neither assertion holds.
    import numpy as np

    a_scaled = sorted(out["s_0"].tolist())
    assert abs(np.mean(a_scaled)) < 1e-9  # a scaled by its own stats
    assert a_scaled[0] == pytest.approx(-1.5667, abs=1e-3)


def test_hash_callable_stable_across_processes():
    """Nested lambdas put code objects into co_consts; their repr
    embeds addresses. The hash must be identical in separate
    interpreter processes."""
    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from ballet_spark.core import _hash_callable\n"
        "def sel(df):\n"
        "    return sorted(['a', 'bb'], key=lambda c: len(c))\n"
        "print(_hash_callable(sel))\n"
    )
    outs = {
        subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, check=True
        ).stdout.strip()
        for _ in range(2)
    }
    assert len(outs) == 1, outs


def test_registry_does_not_mutate_callers_feature(spark):
    from ballet_spark.registry import FeatureRegistry

    f = Feature("text", None, output="t")
    reg = FeatureRegistry()
    reg.register("alice/feature_t", f)
    reg2 = FeatureRegistry()
    reg2.register("bob/feature_t", f)
    assert f.source == ""  # caller's object untouched
    assert reg.features["alice/feature_t"].source == "alice/feature_t"
    assert reg2.features["bob/feature_t"].source == "bob/feature_t"


def test_validate_feature_catches_unseen_group_failure(spark):
    """A params-join operator with handle_unknown='error' must FAIL the
    new-rows check (the holdout now contains genuinely unseen
    entities)."""
    from ballet_spark.operators.fitted import Groupwise, SimpleImputer
    from ballet_spark.validation.checks import validate_feature

    rows = [(f"u{i}", float(i), float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "url string, sec double, text_len double").select(
        "url", F.timestamp_seconds("sec").alias("warc_ts"), "text_len"
    )
    bad = Feature(
        "text_len",
        Groupwise(SimpleImputer("mean"), by="url", handle_unknown="error"),
        output="g",
    )
    res = validate_feature(bad, df)
    assert any("can_transform_new_rows" in f for f in res.failures)


def test_backfill_job_requires_input_or_generate():
    from scripts.backfill_job import main

    with pytest.raises(SystemExit):
        main(["--output", "/tmp/x", "--lineage", "/tmp/y", "--snapshot", "s"])
