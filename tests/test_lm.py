"""Char-bigram LM perplexity scoring (functions/lm.py): numpy oracle,
partitioning invariance, gate behavior, bounded fit output."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from ballet_spark.functions.lm import (
    BOS,
    N_SYM,
    Q,
    _symbols,
    fit_char_bigram_lm,
    perplexity_filter,
    score_char_bigram_lm,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the the the the the the the",
    "zzzzz qqqqq xxxxx jjjjj",
    "héllo wörld — caffè naïve",  # multi-byte chars → one OOV each
    "a",
    "",
]


def _numpy_lm(texts):
    m = np.zeros((N_SYM + 1) * N_SYM, dtype=np.int64)
    for t in texts:
        s = _symbols(t)
        if not len(s):
            continue
        prev = np.concatenate([[BOS], s[:-1]])
        np.add.at(m, prev * N_SYM + s, 1)
    m = m.reshape(N_SYM + 1, N_SYM)
    p = (m + 1.0) / (m.sum(axis=1, keepdims=True) + N_SYM)
    return m, np.floor(np.log(p) * Q + 0.5).astype(np.int64)


def test_lm_fit_and_score_match_numpy(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )
    lm = fit_char_bigram_lm(df, "text")
    counts_m, lq = _numpy_lm(TEXTS)

    got = {(r["prev"], r["cur"]): (r["n"], r["logp_q"]) for r in lm.collect()}
    assert len(got) == (N_SYM + 1) * N_SYM  # full smoothed grid
    for (pv, cu), (n, q) in got.items():
        assert n == counts_m[pv, cu], (pv, cu)
        assert q == lq[pv, cu], (pv, cu)

    scored = {
        r["doc_id"]: (r["lm_logp"], r["lm_logp_ppl"])
        for r in score_char_bigram_lm(df, lm).collect()
    }
    for i, t in enumerate(TEXTS):
        if not t:
            assert scored[i][0] is None
            continue
        s = _symbols(t)
        prev = np.concatenate([[BOS], s[:-1]])
        exp = (int(lq[prev, s].sum()) / Q) / len(s)
        assert abs(scored[i][0] - exp) < 1e-12, t
        assert abs(scored[i][1] - math.exp(-exp)) < 1e-9

    # repeated common bigrams score better (lower ppl) than gibberish
    assert scored[2][1] < scored[3][1]


def test_lm_partitioning_invariance(spark):
    """Exact integer scoring ⇒ identical results under any
    partitioning, for both fit and score."""
    rows = [(i, TEXTS[i % (len(TEXTS) - 1)]) for i in range(60)]
    df1 = spark.createDataFrame(rows, "doc_id int, text string").coalesce(1)
    df7 = spark.createDataFrame(rows, "doc_id int, text string").repartition(7)
    lm1, lm7 = fit_char_bigram_lm(df1), fit_char_bigram_lm(df7)
    t1 = {(r["prev"], r["cur"]): r["logp_q"] for r in lm1.collect()}
    t7 = {(r["prev"], r["cur"]): r["logp_q"] for r in lm7.collect()}
    assert t1 == t7
    s1 = {r["doc_id"]: r["lm_logp"] for r in score_char_bigram_lm(df1, lm1).collect()}
    s7 = {r["doc_id"]: r["lm_logp"] for r in score_char_bigram_lm(df7, lm7).collect()}
    assert s1 == s7  # bit-exact, not allclose


def test_perplexity_filter_gates(spark):
    corpus = [(i, "the cat sat on the mat and the dog ran") for i in range(30)]
    corpus += [(100, "qzxj wvkq zzxq jjqx qqqq")]
    df = spark.createDataFrame(corpus, "doc_id int, text string")
    lm = fit_char_bigram_lm(df, "text")
    ppls = {
        r["doc_id"]: r["lm_logp_ppl"]
        for r in score_char_bigram_lm(df, lm).collect()
    }
    # threshold between the natural-text ppl and the gibberish ppl
    thr = (ppls[0] + ppls[100]) / 2
    assert ppls[100] > ppls[0]
    kept = perplexity_filter(df, lm, max_ppl=thr)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 100 not in ids and 0 in ids


def test_lm_fit_output_is_bounded(spark):
    """The fit's shuffle input is per-batch partial matrices — row
    count ≤ grid size regardless of corpus size."""
    df = spark.createDataFrame(
        [(i, "some text " * 20) for i in range(500)], "doc_id int, text string"
    ).repartition(13)
    lm = fit_char_bigram_lm(df)
    assert lm.count() == (N_SYM + 1) * N_SYM
