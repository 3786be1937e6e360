"""Regressions for the sixth review batch: matched-row as-of
semantics, deterministic ties, ts-dtype coercion, collision guard,
NULL propagation in QuantileTransformer/multimodal, url key escaping,
empty-entropy guard."""

import pytest
from pyspark.sql import functions as F

from ballet_spark.core import PipelineContext
from ballet_spark.operators.asof import asof_join, asof_join_broadcast


def _ts(df, *cols):
    for c in cols:
        df = df.withColumn(c, F.timestamp_seconds(F.col(c)))
    return df


def test_asof_null_in_matched_row_stays_null(spark):
    """The matched (latest) right row's NULL value must NOT be
    backfilled from an older right row — merge_asof takes the matched
    row as-is, on BOTH strategies."""
    right = _ts(
        spark.createDataFrame(
            [("e", 1.0, 10.0), ("e", 5.0, None)], "url string, rts double, v double"
        ),
        "rts",
    )
    left = _ts(spark.createDataFrame([("e", 6.0)], "url string, ts double"), "ts")
    for fn in (asof_join, asof_join_broadcast):
        row = fn(left, right, on="url", left_ts="ts", right_ts="rts").first()
        assert row["v"] is None, fn.__name__
        assert row["__matched_ts"] is not None
    # and with tolerance 2s the (out-of-tolerance-at-t=1) older value
    # must not reappear either
    row = asof_join(
        left, right, on="url", left_ts="ts", right_ts="rts", tolerance_s=2
    ).first()
    assert row["v"] is None


def test_asof_tie_deterministic_and_paths_agree(spark):
    """Equal-timestamp right rows resolve identically (max value
    tuple) on the window and broadcast paths."""
    right = _ts(
        spark.createDataFrame(
            [("e", 3.0, 1.0), ("e", 3.0, 2.0)], "url string, rts double, v double"
        ),
        "rts",
    ).repartition(4)
    left = _ts(spark.createDataFrame([("e", 3.0)], "url string, ts double"), "ts")
    a = asof_join(left, right, on="url", left_ts="ts", right_ts="rts").first()
    b = asof_join_broadcast(left, right, on="url", left_ts="ts", right_ts="rts").first()
    assert a["v"] == b["v"] == 2.0


def test_asof_mixed_ts_types_order_chronologically(spark):
    """timestamp probe vs ISO-string right ts: ordering must be
    chronological, not lexicographic ('T' > ' ' would hide matches)."""
    right = spark.createDataFrame(
        [("e", "2024-01-02T10:00:00", 7.0)], "url string, rts string, v double"
    )
    left = _ts(
        spark.createDataFrame(
            [("e", 1704189605.0)], "url string, ts double"  # 10:00:05 UTC
        ),
        "ts",
    )
    row = asof_join(left, right, on="url", left_ts="ts", right_ts="rts").first()
    assert row["v"] == 7.0


def test_asof_rejects_colliding_value_columns(spark):
    right = _ts(
        spark.createDataFrame([("e", 1.0, 1.0)], "url string, rts double, score double"),
        "rts",
    )
    left = _ts(
        spark.createDataFrame([("e", 2.0, 9.0)], "url string, ts double, score double"),
        "ts",
    )
    for fn in (asof_join, asof_join_broadcast):
        with pytest.raises(ValueError, match="collide"):
            fn(left, right, on="url", left_ts="ts", right_ts="rts")
        # suffix disambiguates
        out = fn(left, right, on="url", left_ts="ts", right_ts="rts", suffix="_r")
        assert "score_r" in out.columns and "score" in out.columns


def test_quantile_transformer_propagates_nulls(spark):
    from ballet_spark.operators.projections import QuantileTransformer

    df = spark.createDataFrame([(float(i),) for i in range(1, 21)] + [(None,)], "x double")
    ctx = PipelineContext(point_in_time=False)
    qt = QuantileTransformer(n_quantiles=5).fit(df, ["x"], ctx)
    out, names = qt.transform_df(df, ["x"], "q", ctx)
    assert out.filter(F.col(names[0]).isNull()).count() == 1


def test_url_query_param_escapes_regex_keys(spark):
    from ballet_spark.functions.url import url_query_param

    df = spark.createDataFrame(
        [("http://x.com/p?abc=2&a.c=1&id%5B%5D=3",)], "u string"
    )
    got = df.select(
        url_query_param(F.col("u"), "a.c").alias("dotted"),
        url_query_param(F.col("u"), "id[]").alias("arr"),  # must not throw
    ).first()
    assert got["dotted"] == "1"  # '.' must not match 'b' in abc


def test_image_features_survives_null_meta(spark):
    from ballet_spark.functions.multimodal import image_features

    df = spark.createDataFrame(
        [("u1", 1.0, bytearray(b"xx"), {"mime": "image/png", "width": 2, "height": 2}),
         ("u2", 2.0, None, None)],
        "url string, warc_ts double, media binary, "
        "media_meta map<string,string>",
    ).withColumn("warc_ts", F.timestamp_seconds("warc_ts")).withColumn(
        "media_meta",
        F.when(F.col("url") == "u1",
               F.struct(F.lit("image/png").alias("mime"), F.lit(2).alias("width"),
                        F.lit(2).alias("height"))),
    )
    out = image_features(df, fake=True).collect()
    by = {r["url"]: r for r in out}
    assert by["u2"]["phash"] is None and by["u2"]["mime"] is None
    assert by["u1"]["phash"] is not None


def test_shannon_entropy_empty_frame(spark):
    from ballet_spark.validation.entropy import shannon_entropy_spark

    empty = spark.createDataFrame([], "c string")
    assert shannon_entropy_spark(empty, ["c"]) == 0.0


def test_frame_sample_plan_rejects_zero_frames(spark):
    from ballet_spark.functions.multimodal import frame_sample_plan

    with pytest.raises(ValueError, match="n_frames"):
        frame_sample_plan(spark.range(1), n_frames=0)
