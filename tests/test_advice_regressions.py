"""Regression tests for the round-1 ADVICE findings: short-doc n-grams,
NULL-keyed skew split / Groupwise, Trend with NULLs in the window, and
duplication-sensitive materialization digests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ballet_spark.core import Feature, PipelineContext
from ballet_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    word_ngrams,
)
from ballet_spark.operators.fitted import Groupwise, SimpleImputer
from ballet_spark.operators.window_ops import Trend
from ballet_spark.plans.skew import asof_join_skew


def test_word_ngrams_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "one two three four"), (2, "one two"), (3, ""), (4, "solo"),
         (5, None)],
        "doc_id long, text string",
    )
    out = df.select("doc_id", word_ngrams(F.col("text"), 3).alias("g")).collect()
    by_id = {r["doc_id"]: r["g"] for r in out}
    assert by_id[1] == ["one two three", "two three four"]
    assert by_id[2] == []
    assert by_id[3] == []
    assert by_id[4] == []
    assert by_id[5] == []  # NULL text routes to the empty-array branch
    # the full dedup jobs must survive short/empty docs end-to-end
    assert ngram_jaccard_pairs(df, threshold=0.1).count() >= 0
    assert minhash_lsh_pairs(df, num_hashes=8, bands=4, threshold=0.1).count() >= 0


def test_asof_skew_keeps_null_keys(spark):
    right = spark.createDataFrame(
        [("a", 1.0, 10.0), ("a", 2.0, 20.0), (None, 1.0, 5.0)],
        "url string, sec double, v double",
    ).select("url", F.timestamp_seconds("sec").alias("warc_ts"), "v")
    probes = spark.createDataFrame(
        [("a", 3.0), (None, 3.0)], "url string, sec double"
    ).select("url", F.timestamp_seconds("sec").alias("ts"))
    plain = asof_join_skew(probes, right, head=["a"]).toPandas()
    # the NULL-keyed probe row must survive the head/tail split
    assert len(plain) == 2
    null_row = plain[plain["url"].isna()]
    assert len(null_row) == 1


def test_groupwise_null_group_seen_in_train(spark):
    train = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 10.0), (None, 20.0), ("a", None)],
        "g string, x double",
    )
    tr = Groupwise(SimpleImputer(strategy="mean"), by="g", handle_unknown="error")
    ctx = PipelineContext(entity_col="g", time_col="x", point_in_time=False)
    tr.fit(train, ["x"], ctx)
    out, names = tr.transform_df(train, ["x"], "imp", ctx)
    pdf = out.toPandas()  # must NOT raise "Unknown group: null"
    filled = pdf[pdf["g"].isna()]["imp"].tolist()
    assert sorted(filled) == [10.0, 20.0]
    a_imp = pdf[(pdf["g"] == "a") & (pdf["x"].isna())]["imp"].iloc[0]
    assert a_imp == pytest.approx(2.0)


def test_trend_null_masked_index_sums(spark):
    # window of 3 rows with a NULL in the middle: slope must use only
    # the rows where y is present for ALL of n, Σt, Σt², Σty, Σy
    df = spark.createDataFrame(
        [("u", 1.0, 0.0), ("u", 2.0, None), ("u", 3.0, 4.0)],
        "url string, warc_ts double, y double",
    )
    ctx = PipelineContext()
    (expr,) = Trend(window=3).transform_exprs([F.col("y")], ctx)
    got = (
        df.select("warc_ts", expr.alias("slope"))
        .orderBy("warc_ts")
        .toPandas()["slope"]
        .tolist()
    )
    # at t=3: rows (idx=0, y=0) and (idx=2, y=4) -> slope = 2.0 exactly
    assert got[2] == pytest.approx(2.0)


def test_digest_is_duplication_sensitive(spark, tmp_path):
    from ballet_spark.plans.materialize import row_digest

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    doubled = df.unionAll(df)
    d1 = df.agg(row_digest(df).alias("d")).first()["d"]
    d2 = doubled.agg(row_digest(doubled).alias("d")).first()["d"]
    assert d1 != d2  # XOR would self-cancel; SUM must not
