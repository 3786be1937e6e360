"""Regressions for the fourth review batch: tie-safe ordered target
encoding, NULL discipline in Winsorizer/KBins/RareLabel/splits, BaseN
unseen-collision, ordinal cardinality guard, discovery averaging."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ballet_spark.core import PipelineContext


def test_ordered_target_encode_tie_safe(spark):
    """Two rows sharing (category, ts) must neither see each other's
    label nor depend on partition order — both get the stats of rows
    STRICTLY earlier in time."""
    from ballet_spark.operators.encoders import OrderedTargetEncoder

    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 2.0, 0.0), ("a", 2.0, 1.0), ("a", 3.0, 1.0)],
        "cat string, t double, y double",
    )
    ctx = PipelineContext(entity_col="cat", time_col="t", point_in_time=True)
    enc = OrderedTargetEncoder(y_col="y", a=1.0).fit(df, ["cat"], ctx)
    (expr,) = enc.transform_exprs([F.col("cat")], ctx)
    got = df.select("t", "y", expr.alias("ote")).collect()
    by = {}
    for r in got:
        by.setdefault(r["t"], []).append(r["ote"])
    # S=3, C=4, prior=0.75. t=1: (0*4+3)/(1*4)=0.75
    assert by[1.0][0] == pytest.approx(0.75)
    # t=2 rows BOTH see only t=1 stats: (1*4+3)/(2*4)=0.875 — identical
    assert by[2.0][0] == by[2.0][1] == pytest.approx(0.875)
    # t=3 sees all three earlier rows: (2*4+3)/(4*4)=0.6875
    assert by[3.0][0] == pytest.approx(0.6875)


def test_winsorizer_and_kbins_preserve_nulls(spark):
    from ballet_spark.operators.fitted import KBinsDiscretizer, Winsorizer

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 21)] + [(None,)], "x double"
    )
    ctx = PipelineContext(point_in_time=False)
    w = Winsorizer(0.05, 0.95).fit(df, ["x"], ctx)
    out, names = w.transform_df(df, ["x"], "xw", ctx)
    assert out.filter(F.col(names[0]).isNull()).count() == 1  # not imputed to lo
    for strat in ("quantile", "uniform"):
        kb = KBinsDiscretizer(n_bins=4, strategy=strat).fit(df, ["x"], ctx)
        out, names = kb.transform_df(df, ["x"], "xb", ctx)
        assert out.filter(F.col(names[0]).isNull()).count() == 1, strat


def test_rare_label_frequent_null_category(spark):
    from ballet_spark.operators.encoders import RareLabelEncoder

    rows = [(None,)] * 5 + [("a",)] * 4 + [("z",)]
    df = spark.createDataFrame(rows, "cat string")
    ctx = PipelineContext(point_in_time=False)
    enc = RareLabelEncoder(tol=0.2).fit(df, ["cat"], ctx)
    out, names = enc.transform_df(df, ["cat"], "r", ctx)
    vals = [r[names[0]] for r in out.collect()]
    # NULL is 50% frequent: stays NULL (a real category), never 'Rare'
    assert vals.count(None) == 5
    assert vals.count("a") == 4
    assert vals.count("Rare") == 1  # the singleton 'z'


def test_basen_unseen_gets_unique_zero_vector(spark):
    from ballet_spark.operators.encoders import BaseNEncoder

    train = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "cat string")
    test = spark.createDataFrame(
        [("a",), ("d",), ("zz",), (None,)], "cat string"
    )
    ctx = PipelineContext(point_in_time=False)
    enc = BaseNEncoder(base=2).fit(train, ["cat"], ctx)
    exprs = enc.transform_exprs([F.col("cat")], ctx)
    rows = test.select("cat", *[e.alias(f"d{i}") for i, e in enumerate(exprs)]).collect()
    vecs = {r["cat"]: tuple(r[f"d{i}"] for i in range(len(exprs))) for r in rows}
    assert vecs["zz"] == vecs[None]  # unknowns share the zero vector
    assert all(v == 0 for v in vecs["zz"])
    # and no real category collides with it
    assert vecs["a"] != vecs["zz"] and vecs["d"] != vecs["zz"]


def test_ordinal_encoder_cardinality_guard(spark):
    from ballet_spark.operators.encoders import OrdinalEncoder

    df = spark.range(50).select(F.col("id").cast("string").alias("cat"))
    ctx = PipelineContext(point_in_time=False)
    with pytest.raises(ValueError, match="distinct categories"):
        OrdinalEncoder(max_categories=10).fit(df, ["cat"], ctx)
    OrdinalEncoder(max_categories=100).fit(df, ["cat"], ctx)  # under cap: fine


def test_train_val_split_covers_null_ts(spark):
    from ballet_spark.plans.splits import train_val_split

    df = spark.createDataFrame(
        [(1, 1.0), (2, 5.0), (3, None)], "id long, ts double"
    )
    tr, va = train_val_split(df, 2.0, time_col="ts")
    assert tr.count() + va.count() == 3  # nothing vanishes
    assert va.filter("id = 3").count() == 1  # default: undated -> val
    tr2, va2 = train_val_split(df, 2.0, time_col="ts", on_null="drop")
    assert tr2.count() + va2.count() == 2


def test_discover_averages_stats_over_feature_columns(spark):
    from ballet_spark.validation.discovery import discover

    df = spark.createDataFrame(
        [(float(i), float(i) * 10) for i in range(1, 11)], "a double, b double"
    )
    out = discover(df, {"f": ["a", "b"]})
    rec = out[out.feature == "f"].iloc[0]
    # mean = avg(mean(a)=5.5, mean(b)=55) = 30.25, not mean(a)
    assert rec["mean"] == pytest.approx(30.25)
    assert rec["ncols"] == 2


def test_stopword_ratio_empty_list_is_zero(spark):
    from ballet_spark.functions.text import stopword_ratio

    df = spark.createDataFrame([("the cat and the dog",)], "text string")
    r_default = df.select(stopword_ratio(F.col("text")).alias("r")).first()["r"]
    r_empty = df.select(stopword_ratio(F.col("text"), []).alias("r")).first()["r"]
    assert r_default > 0
    assert r_empty == 0.0


def test_gopher_filter_rejects_unknown_threshold(spark):
    from ballet_spark.functions.text import gopher_filter

    df = spark.createDataFrame([(1, "some text here")], "doc_id long, text string")
    with pytest.raises(TypeError, match="unknown gopher threshold"):
        gopher_filter(df, minwords=5)  # typo'd key must not pass silently
