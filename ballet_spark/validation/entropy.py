"""Entropy / mutual-information estimators (SURVEY.md §2.4 V1–V4).

Same estimator semantics as the reference (ballet/validation/
entropy.py:19-23,65-87,104-148,199-322,327-470): mixed
discrete/continuous datasets via ``H(x) = H(d) + H(c|d)``, the discrete
part by empirical pmf (Shannon), the continuous part by the KSG
k-nearest-neighbor estimator (Kraskov, Stögbauer, Grassberger 2004,
Phys. Rev. E 69) with k=3 and the Chebyshev metric. The column
discreteness heuristic uses the reference's exact thresholds
(unique-count > 20 or distinct-fraction < 0.05).

This is an independent numpy implementation (the container has no
scipy/sklearn): digamma via recurrence + asymptotic series, kNN and
radius counts by brute-force distance matrix — fine because the KSG
kernel only ever runs on a bounded driver-side SAMPLE.

Distributed front-ends: when every column is discrete, the Shannon
entropy is computed EXACTLY and distributed (one groupBy count — scales
to the full table); the KSG path samples (the reference's subsampling
hook is an identity placeholder, ballet/validation/common.py:260-261 —
here it is real).
"""

from __future__ import annotations

import math

import numpy as np

N_NEIGHBORS = 3  # KSG k (entropy.py:19)
DISC_COL_UNIQUE_COUNT_THRESH = 20  # entropy.py:22
DISC_COL_UNIQUE_FRACTION_THRESH = 0.05  # entropy.py:23
DEFAULT_SAMPLE_N = 2000

_EULER_MASCHERONI = 0.57721566490153286060


def digamma(x):
    """ψ(x) for x > 0: recurrence to x ≥ 6, then the standard
    asymptotic series (Abramowitz & Stegun 6.3.18)."""
    x = np.asarray(x, dtype=float)
    scalar = x.ndim == 0
    x = np.atleast_1d(x).copy()
    out = np.zeros_like(x)
    # recurrence psi(x) = psi(x+1) - 1/x until x >= 6
    for _ in range(10):
        small = x < 6
        if not small.any():
            break
        out[small] -= 1.0 / x[small]
        x[small] += 1.0
    inv = 1.0 / x
    inv2 = inv * inv
    out += (
        np.log(x)
        - 0.5 * inv
        - inv2 * (1.0 / 12 - inv2 * (1.0 / 120 - inv2 / 252))
    )
    return float(out[0]) if scalar else out


def _as2d(x) -> np.ndarray:
    x = np.asarray(x)
    if x.ndim == 1:
        x = x.reshape(-1, 1)
    return x


def is_column_disc(col: np.ndarray) -> bool:
    """The reference's discreteness heuristic, thresholds preserved
    (entropy.py:65-87)."""
    if issubclass(col.dtype.type, np.integer):
        return True
    if issubclass(col.dtype.type, np.bool_):
        return True
    with np.errstate(invalid="ignore"):
        rounding_error = col - col.astype(int)
    if np.allclose(rounding_error, np.zeros(col.size)):
        return True
    uniques, counts = np.unique(col, return_counts=True)
    if np.max(counts) > DISC_COL_UNIQUE_COUNT_THRESH:
        return True
    if (uniques.size / col.size) < DISC_COL_UNIQUE_FRACTION_THRESH:
        return True
    return False


def _disc_mask(x: np.ndarray) -> np.ndarray:
    return np.array([is_column_disc(x[:, j]) for j in range(x.shape[1])])


def _empirical_pk(x: np.ndarray):
    x = _as2d(x)
    events, counts = np.unique(x, axis=0, return_counts=True)
    return counts / x.shape[0], events


def _cheb_dists(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise Chebyshev distances (|a| × |b|), brute force."""
    return np.max(np.abs(a[:, None, :] - b[None, :, :]), axis=2)


def compute_epsilon(x: np.ndarray) -> np.ndarray:
    """Twice the Chebyshev distance of each point to its k-th nearest
    *continuous-subspace* neighbor; k grows past ties at distance 0
    (entropy.py:104-148). All-discrete ⇒ -inf."""
    x = _as2d(x)
    n = x.shape[0]
    disc = _disc_mask(x)
    if disc.all():
        return np.full((n, 1), -np.inf)
    c = x[:, ~disc].astype(float)
    d = _cheb_dists(c, c)
    np.fill_diagonal(d, np.inf)
    d_sorted = np.sort(d, axis=1)
    k = N_NEIGHBORS
    distances = np.zeros(n)
    while not np.all(distances) and k < n:
        distances = d_sorted[:, k - 1]
        k += 1
    return (2.0 * distances).reshape(-1, 1)


def _disc_entropy(x: np.ndarray) -> float:
    pk, _ = _empirical_pk(x)
    pk = pk[pk > 0]
    return float(-np.sum(pk * np.log(pk)))


def _n_within_radius(x: np.ndarray, radius: np.ndarray) -> np.ndarray:
    """Points strictly within radius (self counted, exact-radius
    excluded via nextafter, matching entropy.py:150-194)."""
    x = _as2d(x).astype(float)
    r = np.nextafter(radius.ravel(), 0)
    d = _cheb_dists(x, x)
    return (d < r[:, None]).sum(axis=1)


def _cont_entropy(x: np.ndarray, epsilon: np.ndarray) -> float:
    x = _as2d(x).astype(float)
    n, d = x.shape
    nx = _n_within_radius(x, epsilon / 2.0)
    # Chebyshev unit-ball volume = 1 ⇒ log term vanishes
    with np.errstate(divide="ignore"):
        log_eps = np.log(epsilon.ravel())
    return float(-np.mean(digamma(nx + 1)) + digamma(n) + d * np.mean(log_eps))


def _entropy(x: np.ndarray, epsilon: np.ndarray) -> float:
    x = _as2d(x)
    n, d = x.shape
    if n <= 1 or d == 0:
        return 0.0
    disc = _disc_mask(x)
    if disc.all():
        return _disc_entropy(x)
    if (~disc).all():
        return _cont_entropy(x, epsilon)
    dd = _as2d(x[:, disc])
    cc = _as2d(x[:, ~disc])
    pk, events = _empirical_pk(dd)
    h_c_d = 0.0
    for p_i, ev in zip(pk, events):
        mask = np.all(dd == ev, axis=1)
        h_c_d += p_i * _cont_entropy(cc[mask, :], epsilon[mask, :])
    return _disc_entropy(dd) + h_c_d


def estimate_entropy(x) -> float:
    """V1 — nonnegative dataset entropy (entropy.py:327-368)."""
    x = _as2d(x)
    eps = compute_epsilon(x)
    return max(0.0, _entropy(x, eps))


def estimate_mutual_information(x, y) -> float:
    """V2 — I(x;y) = H(x)+H(y)−H(x,y) with shared epsilon
    (entropy.py:433-470)."""
    x, y = _as2d(x), _as2d(y)
    xy = np.concatenate((x, y), axis=1)
    eps = compute_epsilon(xy)
    return max(0.0, _entropy(x, eps) + _entropy(y, eps) - _entropy(xy, eps))


def estimate_conditional_information(x, y, z) -> float:
    """V3 — I(x;y|z) = H(xz)+H(yz)−H(xyz)−H(z) (entropy.py:371-430)."""
    x, y, z = _as2d(x), _as2d(y), _as2d(z)
    xz = np.concatenate((x, z), axis=1)
    yz = np.concatenate((y, z), axis=1)
    xyz = np.concatenate((x, y, z), axis=1)
    eps = compute_epsilon(xyz)
    return max(
        0.0,
        _entropy(xz, eps) + _entropy(yz, eps) - _entropy(xyz, eps) - _entropy(z, eps),
    )


# ---------------------------------------------------------------------
# Distributed front-ends
# ---------------------------------------------------------------------


def shannon_entropy_spark(df, cols) -> float:
    """EXACT distributed Shannon entropy of the (joint) discrete
    columns: one groupBy count — runs on the full table at any scale."""
    from pyspark.sql import functions as F

    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n"))
    row = counts.agg(
        F.sum("n").alias("total"),
        F.sum(F.col("n") * F.log(F.col("n"))).alias("nlogn"),
    ).first()
    n = row["total"]
    if not n:  # empty input: sum() aggregates to NULL; H(∅) := 0
        return 0.0
    # H = log(N) - (1/N) Σ n_k log n_k
    return float(np.log(n) - row["nlogn"] / n)


def sample_to_numpy(df, cols, sample_n: int = DEFAULT_SAMPLE_N, seed: int = 42):
    """Bounded deterministic sample for the KSG kernels — the
    subsampling the reference left as a placeholder, made real."""
    # NULLs become NaN under to_numpy(float) and poison the KSG kernels
    # (NaN Chebyshev distances -> NaN MI); the information estimators
    # are defined over complete observations, so drop incomplete rows
    # BEFORE sampling (keeps the sample at target size).
    clean = df.select(*cols).na.drop()
    total = clean.count()
    frac = min(1.0, (sample_n * 1.2) / max(total, 1))
    pdf = clean.sample(fraction=frac, seed=seed).limit(sample_n).toPandas()
    return pdf.to_numpy(dtype=float)


def estimate_mutual_information_spark(
    df, x_cols, y_cols, sample_n: int = DEFAULT_SAMPLE_N, seed: int = 42
) -> float:
    """V2 front-end: sample once, estimate on the driver."""
    arr = sample_to_numpy(df, list(x_cols) + list(y_cols), sample_n, seed)
    nx = len(x_cols)
    return estimate_mutual_information(arr[:, :nx], arr[:, nx:])


def estimate_conditional_information_spark(
    df, x_cols, y_cols, z_cols, sample_n: int = DEFAULT_SAMPLE_N, seed: int = 42
) -> float:
    arr = sample_to_numpy(
        df, list(x_cols) + list(y_cols) + list(z_cols), sample_n, seed
    )
    nx, ny = len(x_cols), len(y_cols)
    return estimate_conditional_information(
        arr[:, :nx], arr[:, nx : nx + ny], arr[:, nx + ny :]
    )


def subset_entropies_cube(df, cols) -> dict[frozenset, float]:
    """EXACT Shannon entropy of EVERY subset of the discrete ``cols``
    in ONE pass: ``cube(*cols)`` emits every marginal's counts with a
    ``grouping_id`` tag (one Expand + one shuffle — 2^k × the input in
    the mapper, fine for the handful of low-cardinality columns GFSSF
    validates), then a tiny per-gid aggregation of Σn·ln n. Returns
    {frozenset(subset) → H}; H(∅) = 0 falls out of the total row.

    This is the distributed-and-SQL-replayable discrete path for GFSSF
    CMI terms: CMI(x;y|z) = H(xz) + H(yz) − H(z) − H(xyz), every term
    exact — no sampling, no KSG estimator variance. Requires non-NULL
    column values (cube marks aggregated-out columns with NULL, so
    data NULLs would collide; encode NULL as a sentinel first)."""
    from pyspark.sql import functions as F

    cols = list(cols)
    n = len(cols)
    cube = df.cube(*cols).agg(
        F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid")
    )
    # Σ n·ln(n) accumulates as MICROUNIT-QUANTIZED integral decimals
    # (the repo's exactness discipline): a raw double sum is
    # partition-order-dependent, so the booleans GFSSF derives from
    # these entropies could flip between runs or engines near a
    # threshold. With quantized terms the sum is associative and
    # engine-exact; only ln itself (1 ulp, absorbed by the grid except
    # ~1e-10 odds per term) and the final ln(total) remain
    # implementation-defined, so H snaps to a 1e-9 grid at the end.
    rows = (
        cube.groupBy("gid")
        .agg(
            F.sum("n").alias("total"),
            F.sum(
                F.floor(F.col("n") * F.log(F.col("n")) * 1e6 + F.lit(0.5))
                .cast("decimal(38,0)")
            ).alias("nlogn_q"),
        )
        .collect()
    )
    out = {}
    for r in rows:
        # grouping_id: bit (n-1-i) set ⟺ cols[i] aggregated OUT
        kept = frozenset(
            cols[i] for i in range(n) if not (r["gid"] >> (n - 1 - i)) & 1
        )
        total = r["total"]
        if not total:
            out[kept] = 0.0
            continue
        h = float(np.log(total) - (float(r["nlogn_q"]) / 1e6) / total)
        s = -1.0 if h < 0 else 1.0
        out[kept] = s * math.floor(abs(h) * 1e9 + 0.5) / 1e9 + 0.0
    return out


def cmi_discrete(H: dict, x, y, z=()) -> float:
    """CMI(x; y | z) from a :func:`subset_entropies_cube` dict."""
    zs = frozenset(z)
    return (
        H[zs | {x}] + H[zs | {y}] - H[zs] - H[zs | {x, y}]
    )
