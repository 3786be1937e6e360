"""As-of join vs pandas ``merge_asof`` oracle (FIXTURES.md §6)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ballet_spark.operators.asof import asof_join, asof_join_broadcast


def _probe_frame(webtext_pdf, seed=3):
    """Probe timestamps between/around snapshots, per url."""
    rng = np.random.default_rng(seed)
    rows = []
    for url, gr in webtext_pdf.groupby("url"):
        ts = gr["warc_ts"].sort_values().tolist()
        lo, hi = ts[0], ts[-1]
        for i in range(3):
            offset = pd.Timedelta(hours=int(rng.integers(-48, 72)))
            rows.append({"url": url, "ts": lo + (hi - lo) * (i / 2 if len(ts) > 1 else 0) + offset})
    return pd.DataFrame(rows)


def _oracle(left_pdf, right_pdf, value_col, tolerance=None):
    l = left_pdf.sort_values("ts", kind="mergesort").reset_index(drop=True)
    r = (
        right_pdf[["url", "warc_ts", value_col]]
        .sort_values("warc_ts", kind="mergesort")
        .reset_index(drop=True)
    )
    kwargs = {}
    if tolerance is not None:
        kwargs["tolerance"] = pd.Timedelta(seconds=tolerance)
    return pd.merge_asof(
        l, r, left_on="ts", right_on="warc_ts", by="url", direction="backward", **kwargs
    )


def _check(out_pdf, oracle_pdf, value_col):
    a = out_pdf.sort_values(["url", "ts"], kind="mergesort").reset_index(drop=True)
    b = oracle_pdf.sort_values(["url", "ts"], kind="mergesort").reset_index(drop=True)
    assert len(a) == len(b)
    assert np.allclose(
        a[value_col].to_numpy(dtype=float),
        b[value_col].to_numpy(dtype=float),
        equal_nan=True,
    )


def test_asof_join_union_window(spark, webtext_df, webtext_pdf):
    right_pdf = webtext_pdf.copy()
    right_pdf["text_len"] = right_pdf["text"].str.len().astype(float)
    right = webtext_df.withColumn("text_len", F.length("text").cast("double")).select(
        "url", "warc_ts", "text_len"
    )
    left_pdf = _probe_frame(webtext_pdf)
    left = spark.createDataFrame(left_pdf)

    out = asof_join(left, right, on="url", left_ts="ts", right_ts="warc_ts").toPandas()
    _check(out, _oracle(left_pdf, right_pdf, "text_len"), "text_len")


def test_asof_join_exact_match_inclusive(spark, webtext_df, webtext_pdf):
    """A probe exactly at a snapshot timestamp sees that snapshot."""
    right = webtext_df.withColumn("text_len", F.length("text").cast("double")).select(
        "url", "warc_ts", "text_len"
    )
    left_pdf = webtext_pdf[["url", "warc_ts"]].rename(columns={"warc_ts": "ts"})
    left = spark.createDataFrame(left_pdf)
    out = asof_join(left, right, on="url", left_ts="ts", right_ts="warc_ts").toPandas()
    right_pdf = webtext_pdf.copy()
    right_pdf["text_len"] = right_pdf["text"].str.len().astype(float)
    _check(out, _oracle(left_pdf, right_pdf, "text_len"), "text_len")
    assert out["text_len"].notna().all()


def test_asof_join_tolerance(spark, webtext_df, webtext_pdf):
    right = webtext_df.withColumn("text_len", F.length("text").cast("double")).select(
        "url", "warc_ts", "text_len"
    )
    right_pdf = webtext_pdf.copy()
    right_pdf["text_len"] = right_pdf["text"].str.len().astype(float)
    left_pdf = _probe_frame(webtext_pdf)
    left = spark.createDataFrame(left_pdf)
    tol = 6 * 3600
    out = asof_join(
        left, right, on="url", left_ts="ts", right_ts="warc_ts", tolerance_s=tol
    ).toPandas()
    _check(out, _oracle(left_pdf, right_pdf, "text_len", tolerance=tol), "text_len")


def test_asof_join_broadcast_matches_smj(spark, webtext_df, webtext_pdf):
    right = webtext_df.withColumn("text_len", F.length("text").cast("double")).select(
        "url", "warc_ts", "text_len"
    )
    left_pdf = _probe_frame(webtext_pdf)
    left = spark.createDataFrame(left_pdf)
    a = (
        asof_join(left, right, on="url", left_ts="ts", right_ts="warc_ts")
        .select("url", "ts", "text_len")
        .toPandas()
    )
    b = (
        asof_join_broadcast(left, right, on="url", left_ts="ts", right_ts="warc_ts")
        .select("url", "ts", "text_len")
        .toPandas()
    )
    a = a.sort_values(["url", "ts"]).reset_index(drop=True)
    b = b.sort_values(["url", "ts"]).reset_index(drop=True)
    assert np.allclose(
        a["text_len"].to_numpy(float), b["text_len"].to_numpy(float), equal_nan=True
    )


def test_asof_strategies_agree_on_random_adversarial_inputs(spark):
    """Window and broadcast paths must return IDENTICAL rows on random
    inputs engineered for the hard cases: tied timestamps (both within
    the right side and probe==right), NULL values in matched rows,
    entities with empty histories, and tolerance cutoffs. This is the
    invariant the skew splitter relies on to union the two paths."""
    import numpy as np

    from ballet_spark.operators.asof import asof_join, asof_join_broadcast

    rng = np.random.default_rng(1234)
    for trial in range(4):
        n_r, n_l = 60, 40
        ents = [f"e{i}" for i in range(6)] + ["lonely"]
        right_rows = [
            (
                str(rng.choice(ents[:6])),          # no history for 'lonely'
                float(rng.integers(0, 12)),          # coarse grid -> many ties
                None if rng.random() < 0.25 else float(rng.integers(0, 100)),
            )
            for _ in range(n_r)
        ]
        left_rows = [
            (str(rng.choice(ents)), float(rng.integers(0, 14)))
            for _ in range(n_l)
        ]
        right = spark.createDataFrame(
            right_rows, "url string, rts double, v double"
        ).select("url", F.timestamp_seconds("rts").alias("rts"), "v")
        left = spark.createDataFrame(
            left_rows, "url string, ts double"
        ).select("url", F.timestamp_seconds("ts").alias("ts")).repartition(5)
        for tol in (None, 3):
            a = asof_join(
                left, right, on="url", left_ts="ts", right_ts="rts",
                tolerance_s=tol,
            )
            b = asof_join_broadcast(
                left, right, on="url", left_ts="ts", right_ts="rts",
                tolerance_s=tol,
            )
            ra = sorted(map(tuple, a.collect()))
            rb = sorted(map(tuple, b.collect()))
            # broadcast path can't match NULL-keyed probes; none here
            assert ra == rb, (trial, tol)
