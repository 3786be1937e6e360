"""Property-based tests (hypothesis) for the pure-Python/numpy kernels
shared between the engine and its oracles: simhash, rolling
fingerprints, gram hashing, and the contrast matrices. These kernels
are the correctness boundary between the Spark plans and the SQL
oracles, so they get fuzzed harder than example-based tests go."""

import hashlib

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ballet_spark.operators.dedup import simhash_pdf
from ballet_spark.operators.encoders import contrast_matrix
from ballet_spark.functions.text import rolling_fingerprint_pdf

texts = st.text(
    alphabet=st.sampled_from("abcdefg XYZ.!?\t\n"), min_size=0, max_size=200
)


def _simhash_reference(t: str, bits: int = 64) -> int:
    """Slow, obviously-correct simhash: per-token bit-vote loop."""
    votes = [0] * bits
    for tok in t.split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for j in range(bits):
            votes[j] += 1 if (h >> j) & 1 else -1
    v = 0
    for j in range(bits):
        if votes[j] > 0:
            v |= 1 << j
    return v - (1 << 64) if v >= (1 << 63) else v


@settings(max_examples=150, deadline=None)
@given(texts)
def test_simhash_matches_slow_reference(t):
    got = simhash_pdf(pd.Series([t])).iloc[0]
    assert got == _simhash_reference(t)


@settings(max_examples=100, deadline=None)
@given(texts)
def test_simhash_invariant_under_token_spacing(t):
    """SimHash is a bag-of-tokens function: whitespace runs don't
    matter."""
    respaced = "  ".join(t.split())
    a = simhash_pdf(pd.Series([t])).iloc[0]
    b = simhash_pdf(pd.Series([respaced])).iloc[0]
    assert a == b


def _fingerprint_reference(t: str, k: int = 8, mod: int = 2**61 - 1) -> int:
    """Direct polynomial over every window — no rolling update."""
    B = 1_000_003
    data = t.encode("utf-8")

    def poly(bs):
        h = 0
        for ch in bs:
            h = (h * B + ch) % mod
        return h

    if len(data) < k:
        return poly(data)
    return min(poly(data[i : i + k]) for i in range(len(data) - k + 1))


@settings(max_examples=150, deadline=None)
@given(texts)
def test_rolling_fingerprint_matches_direct_polynomial(t):
    got = rolling_fingerprint_pdf(pd.Series([t])).iloc[0]
    assert got == _fingerprint_reference(t)


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=2, max_value=12))
def test_contrast_matrices_code_properties(k):
    # every scheme: k rows, k-1 columns, columns sum to zero over levels
    # (contrasts are orthogonal to the intercept) except sum-coding's
    # indicator structure which still sums to zero by construction
    for scheme in ("helmert", "sum", "backward_difference", "polynomial"):
        m = np.array(contrast_matrix(scheme, k))
        assert m.shape == (k, k - 1)
        assert np.allclose(m.sum(axis=0), 0.0, atol=1e-9)
    # polynomial contrasts are orthonormal
    p = np.array(contrast_matrix("polynomial", k))
    assert np.allclose(p.T @ p, np.eye(k - 1), atol=1e-9)


def test_pii_redaction_kernels(spark):
    """redact_pii / pii_counts: every pattern kind, overlap ordering
    (email local parts and IPs must not be re-matched as ids), and a
    clean doc."""
    from pyspark.sql import functions as F

    from ballet_spark.functions.text import pii_counts, redact_pii

    rows = [
        (1, "reach me at jane.doe+spam@mail.example.org today"),
        (2, "server 192.168.1.254 then 8.8.8.8"),
        (3, "call 555-123-4567 or 555 987 6543"),
        (4, "account 123456789 and order 98765432109876"),
        (5, "mixed: bob@x.io on 10.0.0.1 dial 111-222-3333 ref 999999999"),
        (6, "no pii here, just words and the number 42"),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "i int, t string")
    counts = pii_counts(F.col("t"))
    out = {
        r["i"]: r
        for r in df.select(
            "i",
            *[counts[k].alias(k) for k in ("email", "ipv4", "phone", "long_id")],
            redact_pii(F.col("t")).alias("red"),
        ).collect()
    }
    assert out[1]["email"] == 1 and "[EMAIL]" in out[1]["red"]
    assert "@" not in out[1]["red"]
    assert out[2]["ipv4"] == 2 and out[2]["red"].count("[IP]") == 2
    assert out[3]["phone"] == 2 and out[3]["red"].count("[PHONE]") == 2
    assert out[4]["long_id"] == 2 and out[4]["red"].count("[ID]") == 2
    r5 = out[5]
    assert (r5["email"], r5["ipv4"], r5["phone"], r5["long_id"]) == (1, 1, 1, 1)
    for tok in ("[EMAIL]", "[IP]", "[PHONE]", "[ID]"):
        assert tok in r5["red"]
    assert out[6]["red"] == rows[5][1]  # untouched
    assert out[7]["red"] is None  # NULL propagates
