"""Structured Streaming features vs batch oracles: identical semantics
through the streaming path driven to completion on a file source."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ballet_spark.sources.webtext import WEBTEXT_DDL
from ballet_spark.streaming.stream_features import (
    run_stream_to_memory,
    stream_running_features,
    stream_sessionize,
    stream_windowed_stats,
)


@pytest.fixture(scope="module")
def stream_source(spark, webtext_pdf, tmp_path_factory):
    """File-backed stream + batch twin. A far-future sentinel row pushes
    the final watermark past every real window so append mode emits all
    of them (otherwise the trailing window per the global max event
    time stays unfinalized when the stream drains)."""
    import pandas as pd

    path = str(tmp_path_factory.mktemp("stream") / "pages")
    sentinel = pd.DataFrame(
        {
            "url": ["__sentinel__"],
            "warc_ts": [webtext_pdf["warc_ts"].max() + pd.Timedelta(days=30)],
            "html": [b""],
            "text": [""],
            "lang": [None],
        }
    )
    pdf = pd.concat([webtext_pdf, sentinel], ignore_index=True)
    df = spark.createDataFrame(pdf).withColumn(
        "text_len", F.length("text").cast("double")
    )
    df.write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    real = F.col("url") != "__sentinel__"
    return (
        spark.readStream.schema(schema).parquet(path),
        spark.read.parquet(path).filter(real),
    )


def test_stream_windowed_stats_matches_batch(spark, stream_source):
    stream, batch = stream_source
    out = stream_windowed_stats(stream, window="6 hours")
    run_stream_to_memory(out, "win_out", "append")
    got = (
        spark.sql("select * from win_out where url != '__sentinel__'")
        .toPandas()
        .sort_values(["url", "window_start"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp = (
        batch.groupBy(F.window("warc_ts", "6 hours").alias("win"), "url")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg("text_len").alias("mean_value"),
            F.max("text_len").alias("max_value"),
        )
        .select(
            "url",
            F.col("win.start").alias("window_start"),
            "n_events",
            "mean_value",
        )
        .toPandas()
        .sort_values(["url", "window_start"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
    assert np.allclose(
        got["mean_value"].to_numpy(float), exp["mean_value"].to_numpy(float)
    )


def test_stream_sessionize_matches_batch_gaps(spark, stream_source, webtext_pdf):
    stream, _ = stream_source
    out = stream_sessionize(stream, gap="30 minutes")
    run_stream_to_memory(out, "sess_out", "append")
    got = spark.sql(
        "select * from sess_out where url != '__sentinel__'"
    ).toPandas()
    # oracle: pandas gap-based session count per url (session_window
    # closes when the NEXT event is > gap after the previous)
    pdf = webtext_pdf.sort_values(["url", "warc_ts"])
    gaps = pdf.groupby("url")["warc_ts"].diff().dt.total_seconds()
    n_sessions = ((gaps > 1800) | gaps.isna()).groupby(pdf["url"]).sum()
    got_counts = got.groupby("url").size()
    assert (got_counts.sort_index() == n_sessions.sort_index()).all()
    # event counts conserved
    assert got["n_events"].sum() == len(webtext_pdf)


def test_stream_running_features_state(spark, stream_source, webtext_pdf):
    stream, _ = stream_source
    out = stream_running_features(stream)
    run_stream_to_memory(out, "run_out", "update")
    got = spark.sql(
        "select * from run_out where url != '__sentinel__'"
    ).toPandas()
    # one batch ⇒ one state row per url with full counts
    exp_counts = webtext_pdf.groupby("url").size()
    got_counts = got.set_index("url")["count"]
    assert (got_counts.sort_index() == exp_counts.sort_index()).all()
    exp_mean = webtext_pdf.assign(tl=webtext_pdf["text"].str.len()).groupby("url")[
        "tl"
    ].mean()
    assert np.allclose(
        got.set_index("url")["mean_value"].sort_index().to_numpy(float),
        exp_mean.sort_index().to_numpy(float),
    )


def test_stream_dedup_first_seen_per_content(spark, stream_source):
    from ballet_spark.streaming.stream_features import stream_dedup

    stream_df, batch_df = stream_source
    out = stream_dedup(stream_df, watermark="365 days")
    run_stream_to_memory(out, "dedup_sink", "append")
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT content_md5) AS d "
        "FROM dedup_sink WHERE url <> '__sentinel__'"
    ).collect()[0]
    # one row per distinct content hash, no hash emitted twice
    assert got["n"] == got["d"]
    exp = batch_df.select(F.md5("text")).distinct().count()
    assert got["n"] == exp


def test_stream_interval_join_matches_batch(spark, stream_source, tmp_path):
    """Stream-stream interval join produces exactly the batch range
    join's row set (same key, right ts within (0, 1h] of left ts)."""
    from ballet_spark.streaming.stream_features import stream_interval_join

    stream_df, batch_df = stream_source
    # right side: the same pages shifted 30 min — every page matches its
    # own future snapshots within the hour
    right_path = str(tmp_path / "right")
    batch_df.select(
        "url",
        (F.col("warc_ts") + F.expr("INTERVAL 30 MINUTES")).alias("event_ts"),
        F.col("text_len").alias("v"),
    ).write.mode("overwrite").parquet(right_path)
    schema = spark.read.parquet(right_path).schema
    right_stream = spark.readStream.schema(schema).parquet(right_path)

    out = stream_interval_join(
        stream_df.select("url", "warc_ts"),
        right_stream,
        watermark="365 days",
    ).select("l.url", "l.warc_ts", "r.event_ts")
    run_stream_to_memory(out, "ij_sink", "append")
    got = spark.sql(
        "SELECT count(*) AS n FROM ij_sink WHERE url <> '__sentinel__'"
    ).collect()[0]["n"]

    l, r = batch_df.alias("lb"), spark.read.parquet(right_path).alias("rb")
    exp = l.join(
        r,
        (F.col("lb.url") == F.col("rb.url"))
        & (F.col("rb.event_ts") >= F.col("lb.warc_ts"))
        & (F.col("rb.event_ts") <= F.expr("lb.warc_ts + INTERVAL 1 HOUR")),
    ).count()
    assert got == exp and got > 0


def test_running_features_null_mean_and_event_time_carry(spark, tmp_path):
    """Batch-parity semantics of the stateful running operator:
    mean_value uses F.avg's null handling (nulls excluded from the
    denominator), and the ffill carry is event-time-latest even when a
    LATER micro-batch delivers an OLDER within-watermark row."""
    import pandas as pd

    base = pd.Timestamp("2026-01-01 10:00:00")
    f1 = pd.DataFrame(  # first batch: the NEWER row arrives first
        {
            "url": ["u", "u"],
            "warc_ts": [base + pd.Timedelta(hours=1), base + pd.Timedelta(minutes=90)],
            "text_len": [10.0, None],
            "lang": ["en", None],
        }
    )
    f2 = pd.DataFrame(  # second batch: older (but in-watermark) row
        {
            "url": ["u"],
            "warc_ts": [base],
            "text_len": [30.0],
            "lang": ["fr"],
        }
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(f1).write.mode("overwrite").parquet(src + "/b1")
    spark.createDataFrame(f2).write.mode("overwrite").parquet(src + "/b2")
    schema = spark.read.parquet(src + "/b1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = stream_running_features(stream, watermark="10 hours")
    run_stream_to_memory(out, "run_parity", "update")
    # update mode: take the LAST emitted state row for the entity
    got = spark.sql("select * from run_parity").toPandas().iloc[-1]
    assert got["count"] == 3
    # mean over non-null values only: (10 + 30) / 2, never /3
    assert got["mean_value"] == pytest.approx(20.0)
    # 'fr' (09:00) arrived after 'en' (11:00) but must NOT win the carry
    assert got["last_val"] == "en"


def test_stream_asof_matches_batch(spark, tmp_path):
    """Streaming probes through stream_asof_features return row-for-row
    what the batch as-of join returns on the same probes."""
    import pandas as pd

    from ballet_spark.operators.asof import asof_join_broadcast
    from ballet_spark.streaming.stream_features import stream_asof_features

    base = pd.Timestamp("2026-02-01 00:00:00")
    feats = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["a", "a", "b"],
                "warc_ts": [base, base + pd.Timedelta(hours=2), base],
                "text_len": [10.0, 20.0, 7.0],
            }
        )
    )
    probes_pdf = pd.DataFrame(
        {
            "url": ["a", "a", "b", "c"],
            "ts": [
                base + pd.Timedelta(hours=1),
                base + pd.Timedelta(hours=3),
                base + pd.Timedelta(minutes=30),
                base + pd.Timedelta(hours=1),
            ],
        }
    )
    src = str(tmp_path / "probes")
    spark.createDataFrame(probes_pdf).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_asof_features(stream, feats)
    run_stream_to_memory(out, "asof_serve", "append")
    got = sorted(map(tuple, spark.sql("select * from asof_serve").collect()))
    want = sorted(
        map(tuple, asof_join_broadcast(spark.read.parquet(src), feats).collect())
    )
    assert got == want
    # spot semantics: probe a@1h sees 10.0, a@3h sees 20.0, c matches nothing
    by = {(r[0], r[1]): r[2] for r in got}
    assert by[("a", probes_pdf["ts"][0])] == 10.0
    assert by[("a", probes_pdf["ts"][1])] == 20.0
    assert by[("c", probes_pdf["ts"][3])] is None


def test_stream_curation_kernels_match_batch(spark, stream_source):
    """The round-4 curation kernels (PII redaction + LM scoring against
    a batch-fitted model) are stateless column expressions / broadcast
    lookups, so they compose with readStream unchanged and match the
    batch result row-for-row — the streaming ingest path of a training
    corpus can scrub and score online."""
    from ballet_spark.functions.lm import (
        fit_char_bigram_lm,
        score_char_bigram_lm,
    )
    from ballet_spark.functions.text import pii_counts, redact_pii

    stream, batch = stream_source
    # fit offline on the batch slice (the production shape: models fit
    # per snapshot, serve on the stream)
    lm = fit_char_bigram_lm(batch, "text")

    def curate(df):
        counts = pii_counts(F.col("text"))
        scored = score_char_bigram_lm(
            df.select("url", "warc_ts", "text"), lm, "text"
        )
        return scored.select(
            "url",
            "warc_ts",
            redact_pii(F.col("text")).alias("clean"),
            counts["email"].alias("n_email"),
            F.round(F.col("lm_logp"), 6).alias("lm_logp"),
        )

    out = curate(stream.filter(F.col("url") != "__sentinel__"))
    run_stream_to_memory(out, "curate_sink", "append")
    got = spark.sql("SELECT * FROM curate_sink").toPandas()
    exp = curate(batch).toPandas()
    key = ["url", "warc_ts"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    assert (got["clean"] == exp["clean"]).all()
    assert (got["lm_logp"].to_numpy() == exp["lm_logp"].to_numpy()).all()
