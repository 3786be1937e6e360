"""ExactSubstr dedup (Lee et al. 2022): planted repeated spans, edge
cases, partitioning invariance, and a DuckDB replay on synthetic docs."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ballet_spark.operators.dedup import dedup_substrings


def _run(spark, rows, k, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_substrings(df, k=k, **kw).toPandas()
    return out.set_index("doc_id").sort_index()


def test_planted_cross_doc_span(spark):
    span = "w1 w2 w3 w4 w5 w6 w7"
    rows = [
        (1, f"a b {span} c d"),
        (2, f"x {span} y z"),
    ]
    out = _run(spark, rows, k=5)
    # doc 1 is the first occurrence of every repeated 5-window: intact
    assert out.loc[1, "text"] == f"a b {span} c d"
    assert out.loc[1, "n_removed_tokens"] == 0
    # doc 2 loses the full 7-token span (union of its 3 repeated windows)
    assert out.loc[2, "text"] == "x y z"
    assert out.loc[2, "n_removed_tokens"] == 7


def test_within_doc_repeat(spark):
    rows = [(1, "a b c a b c")]
    out = _run(spark, rows, k=3)
    # window "a b c" repeats at pos 0 and 3; pos 3 removed
    assert out.loc[1, "text"] == "a b c"
    assert out.loc[1, "n_removed_tokens"] == 3


def test_short_null_empty_docs(spark):
    rows = [(1, "only four tokens here"), (2, ""), (3, None), (4, "a b")]
    out = _run(spark, rows, k=5)
    assert out.loc[1, "text"] == "only four tokens here"
    assert out.loc[2, "text"] == ""
    assert out.loc[3, "text"] == ""
    assert out.loc[4, "text"] == "a b"
    assert (out["n_removed_tokens"] == 0).all()


def test_out_col_and_reserved_names(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = dedup_substrings(df, k=2, out_col="cleaned").toPandas()
    assert set(out.columns) == {"doc_id", "text", "cleaned", "n_removed_tokens"}
    for bad in ("n_removed_tokens", "__cleaned", "__nrem", "__id"):
        with pytest.raises(ValueError, match="reserves"):
            dedup_substrings(df.withColumn(bad, F.lit(1)), k=2)
    with pytest.raises(ValueError, match="k must be"):
        dedup_substrings(df, k=1)


def _synthetic_rows(n=60, seed=7):
    rng = np.random.default_rng(seed)
    vocab = [f"t{i}" for i in range(30)]
    rows = []
    for i in range(n):
        toks = list(rng.choice(vocab, size=int(rng.integers(3, 40))))
        rows.append((i, " ".join(toks)))
    # plant some exact spans across docs
    boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    for i in (5, 17, 33):
        rows[i] = (i, rows[i][1] + " " + boiler)
    return rows


def test_partitioning_invariance(spark):
    rows = _synthetic_rows()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = (
        dedup_substrings(df.repartition(1), k=5)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        dedup_substrings(df.repartition(7, "doc_id"), k=5)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    removed = a[a["n_removed_tokens"] > 0]
    assert len(removed) >= 2  # the planted boilerplate got cut


def test_duckdb_oracle_parity(spark):
    """Exact replay: DuckDB groups on the window STRING (collision-free)
    — agreement also validates the md5-fingerprint route."""
    rows = _synthetic_rows(n=80, seed=11)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        dedup_substrings(df, k=5)
        .select("doc_id", "text", "n_removed_tokens")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = con.execute("""
        WITH d AS (SELECT doc_id,
                          list_filter(string_split_regex(text, '\\s+'),
                                      x -> x <> '') AS w
                   FROM docs),
        wins AS (SELECT doc_id, i AS pos,
                        array_to_string(w[i+1:i+5], ' ') AS win
                 FROM d, unnest(generate_series(0, len(w) - 5)) t(i)),
        r AS (SELECT doc_id, pos,
                     row_number() OVER (PARTITION BY win
                                        ORDER BY doc_id, pos) AS rn,
                     count(*) OVER (PARTITION BY win) AS cnt
              FROM wins),
        rem AS (SELECT DISTINCT doc_id, j
                FROM r, unnest(generate_series(pos, pos + 4)) g(j)
                WHERE rn > 1),
        tok AS (SELECT doc_id, i, w[i+1] AS t
                FROM d, unnest(generate_series(0, len(w) - 1)) g(i)),
        kept AS (SELECT tok.doc_id,
                        coalesce(string_agg(t, ' ' ORDER BY i)
                            FILTER (WHERE rem.j IS NULL), '') AS cleaned,
                        count(*) FILTER (WHERE rem.j IS NOT NULL) AS nr
                 FROM tok LEFT JOIN rem
                   ON rem.doc_id = tok.doc_id AND rem.j = tok.i
                 GROUP BY tok.doc_id)
        SELECT d.doc_id, coalesce(kept.cleaned, '') AS text,
               coalesce(kept.nr, 0)::BIGINT AS n_removed_tokens
        FROM d LEFT JOIN kept USING (doc_id) ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(got, want)


def test_rewrapped_repeat_is_found(spark):
    """The operator's raison d'être (review round 5): a >=k-token
    repeat re-wrapped with newlines instead of spaces must fingerprint
    identically to its space-joined first occurrence."""
    rows = [
        (1, "w1 w2 w3 w4 w5 w6 tail one"),
        (2, "head w1 w2\nw3 w4\tw5 w6 other"),  # same 6-token span, re-wrapped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        dedup_substrings(df, k=5, out_col="cleaned")
        .orderBy("doc_id").collect()
    )
    assert out[0]["n_removed_tokens"] == 0
    assert out[1]["n_removed_tokens"] == 6
    assert out[1]["cleaned"] == "head other"
