"""Feature accept/prune validators (SURVEY.md §2.4 V5–V10).

Re-expresses the reference validator suite over Spark feature matrices:
feature values live in a wide DataFrame (one column set per feature);
cheap checks (variance) are distributed aggregations; information-
theoretic decisions (GFSSF, Li et al. ICDM'13 — the algorithm the
reference implements at ballet/validation/feature_acceptance/
validator.py:42-133 and feature_pruning/validator.py:30-78) run the KSG
kernels on a bounded sample of the matrix.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ballet_spark.validation.entropy import (
    estimate_conditional_information,
    estimate_entropy,
    sample_to_numpy,
)

LAMBDA_1_ADJUSTMENT = 64  # ballet/validation/gfssf.py:12
LAMBDA_2_ADJUSTMENT = 64  # ballet/validation/gfssf.py:13


# -- trivial accepters/pruners (V10) ----------------------------------


class AlwaysAccepter:
    def judge(self, *a, **k) -> bool:
        return True


class NeverAccepter:
    def judge(self, *a, **k) -> bool:
        return False


class RandomAccepter:
    """Accept with probability p (feature_acceptance/validator.py:27-39)."""

    def __init__(self, p: float = 0.5, seed: int | None = None):
        self.p = p
        self.rng = random.Random(seed)

    def judge(self, *a, **k) -> bool:
        return self.rng.random() < self.p


class NoOpPruner:
    def prune(self, *a, **k) -> list:
        return []


class RandomPruner:
    """Prune each feature with probability p."""

    def __init__(self, p: float = 0.5, seed: int | None = None):
        self.p = p
        self.rng = random.Random(seed)

    def prune(self, features, *a, **k) -> list:
        return [f for f in features if self.rng.random() < self.p]


# -- statistical accepters (V7, V8, V9) --------------------------------


class VarianceThresholdAccepter:
    """Accept iff EVERY output column's variance exceeds the threshold
    (feature_acceptance/validator.py:136-164; np.var ⇒ population
    variance). Distributed: one agg."""

    def __init__(self, threshold: float = 0.05):
        self.threshold = threshold

    def judge(self, matrix: DataFrame, feature_cols: list[str]) -> bool:
        row = matrix.agg(
            *[F.var_pop(F.col(c).cast("double")).alias(c) for c in feature_cols]
        ).first()
        return all(
            row[c] is not None and row[c] - self.threshold > 0
            for c in feature_cols
        )


class MutualInformationAccepter:
    """Accept iff MI(feature; y) > threshold
    (feature_acceptance/validator.py:167-219). ``handle_nan_targets``:
    'fail' ⇒ reject when y has NaN; 'ignore' ⇒ drop those rows."""

    def __init__(
        self,
        threshold: float = 0.05,
        handle_nan_targets: str = "fail",
        sample_n: int = 2000,
        seed: int = 42,
    ):
        self.threshold = threshold
        self.handle_nan_targets = handle_nan_targets
        self.sample_n = sample_n
        self.seed = seed

    def judge(
        self, matrix: DataFrame, feature_cols: list[str], y_col: str
    ) -> bool:
        from ballet_spark.validation.entropy import estimate_mutual_information

        arr = sample_to_numpy(
            matrix, list(feature_cols) + [y_col], self.sample_n, self.seed
        )
        z, y = arr[:, : len(feature_cols)], arr[:, len(feature_cols) :]
        if np.isnan(y).any():
            if self.handle_nan_targets == "fail":
                return False
            keep = ~np.isnan(y).any(axis=1)
            z, y = z[keep], y[keep]
        if np.isnan(z).any():
            keep = ~np.isnan(z).any(axis=1)
            z, y = z[keep], y[keep]
        mi = estimate_mutual_information(z, y)
        return mi > self.threshold


class CompoundAccepter:
    """all/any combination of accepters (validator.py:222-274)."""

    def __init__(self, accepters: list, agg: str = "all"):
        if agg not in ("all", "any"):
            raise ValueError(agg)
        self.accepters = accepters
        self.agg = agg

    def judge(self, *args, **kwargs) -> bool:
        votes = [a.judge(*args, **kwargs) for a in self.accepters]
        return all(votes) if self.agg == "all" else any(votes)


# -- GFSSF (V5, V6) ----------------------------------------------------


@dataclass
class GFSSFContext:
    """Sampled feature matrix for GFSSF decisions.

    ``feature_cols``: mapping feature name → list of its matrix columns.
    The sample is drawn ONCE; every CMI in the accept/prune loop reuses
    it (the reference transforms the validation split per feature —
    here the matrix is already materialized)."""

    matrix: DataFrame
    feature_cols: dict[str, list[str]]
    y_col: str
    sample_n: int = 2000
    seed: int = 42
    lmbda_1: float = 0.0
    lmbda_2: float = 0.0
    _data: dict = field(default_factory=dict, repr=False)

    def __post_init__(self):
        all_cols = [c for cols in self.feature_cols.values() for c in cols]
        arr = sample_to_numpy(
            self.matrix, all_cols + [self.y_col], self.sample_n, self.seed
        )
        i = 0
        for name, cols in self.feature_cols.items():
            self._data[name] = arr[:, i : i + len(cols)]
            i += len(cols)
        self.y = arr[:, i:]
        if np.isnan(self.y).any():
            raise ValueError("GFSSF does not support missing targets")
        if self.lmbda_1 <= 0:
            self.lmbda_1 = estimate_entropy(self.y) / LAMBDA_1_ADJUSTMENT
        if self.lmbda_2 <= 0:
            self.lmbda_2 = estimate_entropy(self.y) / LAMBDA_2_ADJUSTMENT

    def values(self, name: str) -> np.ndarray:
        return self._data[name]

    def concat(self, omit: list[str]) -> np.ndarray:
        keep = [
            self._data[n] for n in self.feature_cols if n not in omit
        ]
        if not keep:
            return np.zeros((self.y.shape[0], 1))
        return np.concatenate(keep, axis=1)

    def lambdas(self) -> tuple[float, float]:
        """λ normalization over current features (gfssf.py:36-50)."""
        num_features = len(self.feature_cols)
        num_cols = sum(len(c) for c in self.feature_cols.values())
        return self.lmbda_1 / num_features, self.lmbda_2 / max(num_cols, 1)


class GFSSFAccepter:
    """Accept a candidate iff for SOME omitted feature g (or none):
    CMI(candidate; y | Z−g) − CMI(g; y | Z−g) ≥ λ1 + λ2·(q_cand − q_g)
    — lines 1-8 of GFSSF (feature_acceptance/validator.py:42-133)."""

    def judge(self, ctx: GFSSFContext, candidate: str) -> bool:
        cand = ctx.values(candidate)
        n_cand_cols = cand.shape[1]
        lmbda_1, lmbda_2 = ctx.lambdas()
        others = [n for n in ctx.feature_cols if n != candidate]
        for omitted in [None, *others]:
            omit = [candidate] + ([omitted] if omitted else [])
            z = ctx.concat(omit=omit)
            cmi = estimate_conditional_information(cand, ctx.y, z)
            if omitted is not None:
                cmi_omit = estimate_conditional_information(
                    ctx.values(omitted), ctx.y, z
                )
                n_omit_cols = ctx.values(omitted).shape[1]
            else:
                cmi_omit, n_omit_cols = 0.0, 0
            statistic = cmi - cmi_omit
            threshold = lmbda_1 + lmbda_2 * (n_cand_cols - n_omit_cols)
            if statistic - threshold >= 0:
                return True
        return False


class GFSSFPruner:
    """Prune g iff CMI(g; y | Z−g) < λ1 + λ2·q_g — lines 12-13
    (feature_pruning/validator.py:34-78)."""

    def prune(self, ctx: GFSSFContext) -> list[str]:
        lmbda_1, lmbda_2 = ctx.lambdas()
        redundant = []
        for name in list(ctx.feature_cols):
            vals = ctx.values(name)
            z = ctx.concat(omit=[name] + redundant)
            cmi = estimate_conditional_information(vals, ctx.y, z)
            threshold = lmbda_1 + lmbda_2 * vals.shape[1]
            if cmi < threshold:
                redundant.append(name)
        return redundant


def gfssf_discrete_select(
    df,
    features: list[str],
    candidate: str,
    y_col: str,
) -> list[dict]:
    """End-to-end GFSSF accept+prune over DISCRETE feature columns with
    EXACT distributed entropies — the oracle-replayable sibling of
    :class:`GFSSFAccepter`/:class:`GFSSFPruner` (which use the KSG
    continuous estimator on a driver sample; reference
    ballet/validation/feature_acceptance/validator.py:42-133 and
    feature_pruning/validator.py:34-78).

    One ``cube`` pass (validation/entropy.py subset_entropies_cube)
    yields every subset entropy; every CMI in the accept loop and the
    sequential prune loop is then pure driver arithmetic, so the whole
    decision procedure replays in SQL from the same cube.

    Accept (GFSSF lines 1-8): the candidate joins the context; accept
    iff for no-omission or SOME omitted g:
    CMI(cand;y|Z−g) − CMI(g;y|Z−g) ≥ λ1 + λ2·(q_cand − q_g).
    Prune (lines 12-13) over the post-accept set, sequentially:
    g is redundant iff CMI(g;y|Z−g−redundant) < λ1 + λ2·q_g, with λs
    recomputed for the prune-stage feature set (each validator run
    builds its own context, as in the reference).

    Returns one dict per feature (existing + candidate): name, role,
    ``cmi_full`` = CMI(f;y|all others) (path-independent evidence),
    and ``kept``."""
    from ballet_spark.validation.entropy import cmi_discrete, subset_entropies_cube

    all_feats = list(features) + [candidate]
    H = subset_entropies_cube(df, all_feats + [y_col])
    h_y = H[frozenset([y_col])]

    # --- accept: context = existing ∪ candidate (1 col each) ---
    n_acc = len(all_feats)
    l1a = h_y / LAMBDA_1_ADJUSTMENT / n_acc
    l2a = h_y / LAMBDA_2_ADJUSTMENT / n_acc
    accepted = False
    for omitted in [None, *features]:
        z = [f for f in features if f != omitted]
        stat = cmi_discrete(H, candidate, y_col, z)
        if omitted is not None:
            stat -= cmi_discrete(H, omitted, y_col, z)
            thr = l1a  # q_cand − q_g = 1 − 1 = 0
        else:
            thr = l1a + l2a
        if stat - thr >= 0:
            accepted = True
            break

    # --- sequential prune over the post-accept set ---
    pset = list(features) + ([candidate] if accepted else [])
    redundant: list[str] = []
    if pset:  # empty when features=[] and the candidate was rejected
        l1p = h_y / LAMBDA_1_ADJUSTMENT / len(pset)
        l2p = h_y / LAMBDA_2_ADJUSTMENT / len(pset)
        for name in pset:
            z = [f for f in pset if f != name and f not in redundant]
            if cmi_discrete(H, name, y_col, z) < l1p + l2p:
                redundant.append(name)

    report = []
    for name in all_feats:
        role = "candidate" if name == candidate else "existing"
        others = [f for f in all_feats if f != name]
        kept = (
            (accepted and name not in redundant)
            if role == "candidate"
            else name not in redundant
        )
        report.append(
            {
                "feature": name,
                "role": role,
                "cmi_full": cmi_discrete(H, name, y_col, others),
                "kept": bool(kept),
                "h_y": h_y,
            }
        )
    return report
