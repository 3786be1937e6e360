"""Sessionization vs pandas cumulative-gap oracle."""

import numpy as np

from ballet_spark.operators.sessionize import session_stats, sessionize


GAP = 24 * 3600


def _oracle_sessions(webtext_pdf):
    pdf = webtext_pdf.sort_values(["url", "warc_ts"], kind="mergesort").copy()
    gaps = pdf.groupby("url")["warc_ts"].diff().dt.total_seconds()
    pdf["session_id"] = (gaps > GAP).astype(int).groupby(pdf["url"]).cumsum()
    return pdf


def test_sessionize(webtext_df, webtext_pdf):
    out = (
        sessionize(webtext_df, gap_s=GAP)
        .toPandas()
        .sort_values(["url", "warc_ts"], kind="mergesort")
    )
    oracle = _oracle_sessions(webtext_pdf)
    assert (out["session_id"].to_numpy() == oracle["session_id"].to_numpy()).all()


def test_session_stats(webtext_df, webtext_pdf):
    out = (
        session_stats(webtext_df, gap_s=GAP)
        .toPandas()
        .sort_values(["url", "session_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    oracle = _oracle_sessions(webtext_pdf)
    exp = (
        oracle.groupby(["url", "session_id"])
        .agg(
            session_start=("warc_ts", "min"),
            session_end=("warc_ts", "max"),
            n_events=("warc_ts", "count"),
        )
        .reset_index()
        .sort_values(["url", "session_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(out) == len(exp)
    assert (out["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
    assert (out["session_start"].to_numpy() == exp["session_start"].to_numpy()).all()
    dur = (exp["session_end"] - exp["session_start"]).dt.total_seconds().to_numpy()
    assert np.allclose(out["duration_s"].to_numpy(float), dur)
