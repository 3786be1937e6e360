"""Window operators vs pandas group-wise oracles.

Oracle semantics follow the reference tests: SingleLagger vs
``groupby(...).shift`` (tests/eng/test_ts.py:9-37), LagImputer vs
group-wise ffill (ballet/eng/missing.py:12-17).
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ballet_spark.core import Feature, FeatureEngineeringPipeline, LeakageError
from ballet_spark.operators.window_ops import (
    CumAgg,
    Delta,
    ForwardFill,
    Lag,
    Lead,
    MultiLag,
    Rolling,
    SnapshotIndex,
    TimeSinceLast,
)
import pytest


def _prep(webtext_pdf):
    pdf = webtext_pdf.copy()
    pdf["text_len"] = pdf["text"].str.len().astype("float64")
    return pdf.sort_values(["url", "warc_ts"], kind="mergesort")


def _run(webtext_df, feature):
    out = (
        FeatureEngineeringPipeline([feature])
        .fit(webtext_df)
        .transform(webtext_df)
        .toPandas()
        .sort_values(["url", "warc_ts"], kind="mergesort")
    )
    return out


def test_lag(webtext_df, webtext_pdf):
    df = webtext_df.withColumn("text_len", F.length("text").cast("double"))
    out = _run(df, Feature("text_len", Lag(1), output="lag1"))
    oracle = _prep(webtext_pdf)
    oracle["lag1"] = oracle.groupby("url")["text_len"].shift(1)
    assert np.allclose(
        out["lag1"].to_numpy(dtype=float),
        oracle["lag1"].to_numpy(dtype=float),
        equal_nan=True,
    )


def test_multi_lag(webtext_df, webtext_pdf):
    df = webtext_df.withColumn("text_len", F.length("text").cast("double"))
    out = _run(df, Feature("text_len", MultiLag([1, 2]), output="ml"))
    oracle = _prep(webtext_pdf)
    for i, k in enumerate([1, 2]):
        exp = oracle.groupby("url")["text_len"].shift(k).to_numpy(dtype=float)
        got = out[f"ml_{i}"].to_numpy(dtype=float)
        assert np.allclose(got, exp, equal_nan=True)


def test_forward_fill(webtext_df, webtext_pdf):
    # lang is intermittently null by construction
    out = _run(webtext_df, Feature("lang", ForwardFill(), output="lang_ffill"))
    oracle = _prep(webtext_pdf)
    oracle["lang_ffill"] = oracle.groupby("url")["lang"].ffill()
    got = out["lang_ffill"].fillna("__NULL__").to_numpy()
    exp = oracle["lang_ffill"].fillna("__NULL__").to_numpy()
    assert (got == exp).all()


def test_rolling_mean(webtext_df, webtext_pdf):
    df = webtext_df.withColumn("text_len", F.length("text").cast("double"))
    out = _run(df, Feature("text_len", Rolling("mean", 3), output="rm"))
    oracle = _prep(webtext_pdf)
    oracle["rm"] = (
        oracle.groupby("url")["text_len"]
        .rolling(3, min_periods=1)
        .mean()
        .reset_index(level=0, drop=True)
    )
    assert np.allclose(
        out["rm"].to_numpy(dtype=float),
        oracle["rm"].to_numpy(dtype=float),
        equal_nan=True,
    )


def test_delta_and_cumsum(webtext_df, webtext_pdf):
    df = webtext_df.withColumn("text_len", F.length("text").cast("double"))
    out_d = _run(df, Feature("text_len", Delta(1), output="d1"))
    out_c = _run(df, Feature("text_len", CumAgg("sum"), output="cs"))
    oracle = _prep(webtext_pdf)
    exp_d = oracle.groupby("url")["text_len"].diff(1).to_numpy(dtype=float)
    exp_c = oracle.groupby("url")["text_len"].cumsum().to_numpy(dtype=float)
    assert np.allclose(out_d["d1"].to_numpy(dtype=float), exp_d, equal_nan=True)
    assert np.allclose(out_c["cs"].to_numpy(dtype=float), exp_c, equal_nan=True)


def test_snapshot_index_and_gap(webtext_df, webtext_pdf):
    out_i = _run(webtext_df, Feature("url", SnapshotIndex(), output="idx"))
    out_g = _run(webtext_df, Feature("url", TimeSinceLast(), output="gap"))
    oracle = _prep(webtext_pdf)
    exp_i = oracle.groupby("url").cumcount().to_numpy()
    assert (out_i["idx"].to_numpy() == exp_i).all()
    exp_g = (
        oracle.groupby("url")["warc_ts"].diff().dt.total_seconds().to_numpy()
    )
    assert np.allclose(out_g["gap"].to_numpy(dtype=float), exp_g, equal_nan=True)


def test_leakage_guard_rejects_lead(webtext_df):
    feat = Feature("lang", Lead(1), output="nxt")
    with pytest.raises(LeakageError):
        _run(webtext_df, feat)
    # explicit whitelist for label construction works
    out = _run(webtext_df, Feature("lang", Lead(1, allow_future=True), output="nxt"))
    assert "nxt" in out.columns


def test_zero_temporal_leakage_poison_row(spark, webtext_pdf):
    """Inject one far-future poison row per url; all feature values at
    earlier timestamps must be unchanged (FIXTURES.md §6 leakage probe)."""
    base = spark.createDataFrame(webtext_pdf).withColumn(
        "text_len", F.length("text").cast("double")
    )
    poison_pdf = (
        webtext_pdf.groupby("url", as_index=False)
        .agg({"warc_ts": "max"})
        .assign(
            warc_ts=lambda d: d["warc_ts"] + pd.Timedelta(days=3650),
            html=b"<html><body><p>POISON</p></body></html>",
            text="POISON",
            lang="xx",
        )
    )[["url", "warc_ts", "html", "text", "lang"]]
    poisoned = spark.createDataFrame(poison_pdf).withColumn(
        "text_len", F.length("text").cast("double")
    )
    full = base.unionByName(poisoned)

    feats = [
        Feature("text_len", Lag(1), output="lag1"),
        Feature("text_len", Rolling("mean", 3), output="rm"),
        Feature("lang", ForwardFill(), output="lf"),
    ]
    pipe = FeatureEngineeringPipeline(feats)
    clean = pipe.fit(base).transform(base).toPandas()
    dirty = pipe.fit(full).transform(full).toPandas()
    # restrict to original timestamps
    key = ["url", "warc_ts"]
    merged = clean.merge(dirty, on=key, suffixes=("_c", "_d"))
    assert len(merged) == len(clean)
    assert np.allclose(
        merged["lag1_c"].to_numpy(float), merged["lag1_d"].to_numpy(float), equal_nan=True
    )
    assert np.allclose(
        merged["rm_c"].to_numpy(float), merged["rm_d"].to_numpy(float), equal_nan=True
    )
    assert (
        merged["lf_c"].fillna("∅") == merged["lf_d"].fillna("∅")
    ).all()
