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
