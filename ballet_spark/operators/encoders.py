"""Categorical encoders: fit = groupBy(category) agg on TRAIN →
broadcast params join at transform (SURVEY.md §2.3
category_encoders/sklearn rows; reference re-exports at
ballet/eng/external/category_encoders.py:1-54, sklearn.py:4-12).

All params tables have one row per category — small by construction —
and are broadcast, so the 10^12-row side never shuffles for encoding.

``y`` is the name of a label column present in the train DataFrame
(the engine's analog of the reference's aligned ``y`` array).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ballet_spark.operators.base import SparkTransformer


class JoinFittedEncoder(SparkTransformer):
    """Base: one params row per category, broadcast-joined at transform.

    ``_fit_aggs()`` → list of agg exprs over the train group;
    ``_enc_expr()`` → encoding from those agg columns + global stats;
    ``_default()`` → value for categories unseen in train.
    """

    needs_y = False

    def _fit_aggs(self, y: str | None) -> list[Column]:
        raise NotImplementedError

    def _enc_expr(self) -> Column:
        raise NotImplementedError

    def _default(self) -> Column:
        return F.lit(None).cast("double")

    def _global_fit(self, df: DataFrame, y: str | None) -> None:
        """Hook for global stats (prior mean etc.)."""

    def fit(self, df: DataFrame, cols: list[str], ctx, y=None):
        if self.needs_y and y is None:
            raise ValueError(f"{type(self).__name__} requires y (label column name)")
        self._cols = cols
        self._global_fit(df, y)
        self.params_: dict[str, DataFrame] = {}
        for c in cols:
            self.params_[c] = (
                df.groupBy(F.col(c).alias("__g"))
                .agg(*self._fit_aggs(y))
                .select("__g", self._enc_expr().alias("__enc"))
            )
        return self

    def transform_df(self, df, cols, alias, ctx):
        out_names = []
        cur = df
        for i, c in enumerate(cols):
            name = alias if len(cols) == 1 else f"{alias}_{i}"
            p = self.params_[c].withColumnRenamed("__enc", f"__enc_{name}")
            cur = cur.join(
                F.broadcast(p), cur[c].eqNullSafe(F.col("__g")), "left"
            )
            cur = cur.select(
                *[F.col(x) for x in cur.columns if x not in ("__g", f"__enc_{name}")],
                F.coalesce(F.col(f"__enc_{name}"), self._default()).alias(name),
            )
            out_names.append(name)
        return cur, out_names


class CountEncoder(JoinFittedEncoder):
    """Category → its train frequency (category_encoders CountEncoder).
    Unseen ⇒ 0."""

    def _fit_aggs(self, y):
        return [F.count(F.lit(1)).alias("__n")]

    def _enc_expr(self):
        return F.col("__n").cast("double")

    def _default(self):
        return F.lit(0.0)


class TargetEncoder(JoinFittedEncoder):
    """Smoothed mean-target encoding (category_encoders TargetEncoder):
    ``prior*(1-w) + group_mean*w`` with
    ``w = 1/(1+exp(-(n - min_samples_leaf)/smoothing))``.
    Unseen ⇒ prior."""

    needs_y = True

    def __init__(self, smoothing: float = 1.0, min_samples_leaf: int = 1):
        self.smoothing = smoothing
        self.min_samples_leaf = min_samples_leaf

    def _global_fit(self, df, y):
        self.prior_ = df.agg(F.avg(F.col(y).cast("double"))).first()[0]

    def _fit_aggs(self, y):
        return [
            F.avg(F.col(y).cast("double")).alias("__m"),
            F.count(F.lit(1)).alias("__n"),
        ]

    def _enc_expr(self):
        w = F.lit(1.0) / (
            F.lit(1.0)
            + F.exp(
                -(F.col("__n") - F.lit(self.min_samples_leaf))
                / F.lit(self.smoothing)
            )
        )
        return F.lit(self.prior_) * (1 - w) + F.col("__m") * w

    def _default(self):
        return F.lit(self.prior_)


class MEstimateEncoder(JoinFittedEncoder):
    """(sum_y + m*prior) / (n + m) (category_encoders MEstimateEncoder).
    Unseen ⇒ prior."""

    needs_y = True

    def __init__(self, m: float = 1.0):
        self.m = m

    def _global_fit(self, df, y):
        self.prior_ = df.agg(F.avg(F.col(y).cast("double"))).first()[0]

    def _fit_aggs(self, y):
        return [
            F.sum(F.col(y).cast("double")).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        ]

    def _enc_expr(self):
        return (F.col("__s") + F.lit(self.m * self.prior_)) / (
            F.col("__n") + F.lit(self.m)
        )

    def _default(self):
        return F.lit(self.prior_)


class WOEEncoder(JoinFittedEncoder):
    """Weight of evidence for binary targets with Laplace regularization
    (category_encoders WOEEncoder):
    ``ln(((pos+reg)/(POS+2reg)) / ((neg+reg)/(NEG+2reg)))``. Unseen ⇒ 0."""

    needs_y = True

    def __init__(self, regularization: float = 1.0):
        self.reg = regularization

    def _global_fit(self, df, y):
        row = df.agg(
            F.sum(F.col(y).cast("double")).alias("pos"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        self.pos_ = float(row["pos"])
        self.neg_ = float(row["n"] - row["pos"])

    def _fit_aggs(self, y):
        return [
            F.sum(F.col(y).cast("double")).alias("__pos"),
            F.count(F.lit(1)).alias("__n"),
        ]

    def _enc_expr(self):
        pos_rate = (F.col("__pos") + F.lit(self.reg)) / F.lit(
            self.pos_ + 2 * self.reg
        )
        neg_rate = (F.col("__n") - F.col("__pos") + F.lit(self.reg)) / F.lit(
            self.neg_ + 2 * self.reg
        )
        return F.log(pos_rate / neg_rate)

    def _default(self):
        return F.lit(0.0)


class JamesSteinEncoder(JoinFittedEncoder):
    """Independent James-Stein shrinkage (category_encoders
    JamesSteinEncoder, independent model): ``prior + (1-B)*(mean-prior)``
    with ``B = group_var / (group_var + between_var)`` approximated by
    ``(var_y/n) / (var_y/n + var_between)``. Unseen ⇒ prior."""

    needs_y = True

    def _global_fit(self, df, y):
        row = df.agg(
            F.avg(F.col(y).cast("double")).alias("m"),
            F.var_pop(F.col(y).cast("double")).alias("v"),
        ).first()
        self.prior_ = float(row["m"])
        self.var_ = float(row["v"]) if row["v"] else 0.0

    def _fit_aggs(self, y):
        return [
            F.avg(F.col(y).cast("double")).alias("__m"),
            F.count(F.lit(1)).alias("__n"),
        ]

    def _enc_expr(self):
        if self.var_ == 0.0:
            return F.lit(self.prior_)
        b = (F.lit(self.var_) / F.col("__n")) / (
            F.lit(self.var_) / F.col("__n") + F.lit(self.var_)
        )
        return F.lit(self.prior_) + (F.lit(1.0) - b) * (
            F.col("__m") - F.lit(self.prior_)
        )

    def _default(self):
        return F.lit(self.prior_)


class LeaveOneOutEncoder(JoinFittedEncoder):
    """Leave-one-out target encoding. Standard ``transform`` (new rows)
    = plain train group mean; use :func:`loo_encode_train` for encoding
    the TRAIN rows themselves, which excludes each row's own target:
    ``(sum_group - y_row)/(n_group - 1)`` (category_encoders LOO).
    Unseen ⇒ prior."""

    needs_y = True

    def _global_fit(self, df, y):
        self.prior_ = df.agg(F.avg(F.col(y).cast("double"))).first()[0]

    def _fit_aggs(self, y):
        return [F.avg(F.col(y).cast("double")).alias("__m")]

    def _enc_expr(self):
        return F.col("__m")

    def _default(self):
        return F.lit(self.prior_)


def loo_encode_train(
    df: DataFrame, cat_col: str, y_col: str, out_col: str
) -> DataFrame:
    """LOO encoding of the train rows: window sum/count per category
    minus the own row — no join, one exchange on the category key.
    The singleton-category fallback (prior) is a scalar aggregate
    collected once, NOT a global window (which would funnel every row
    through one partition)."""
    from pyspark.sql import Window

    w = Window.partitionBy(cat_col)
    yc = F.col(y_col).cast("double")
    s, n = F.sum(yc).over(w), F.count(F.lit(1)).over(w)
    prior = df.agg(F.avg(yc)).first()[0]
    enc = F.when(n > 1, (s - yc) / (n - 1)).otherwise(F.lit(prior))
    return df.withColumn(out_col, enc)


class OrdinalEncoder(JoinFittedEncoder):
    """Category → dense index by sorted train order (sklearn
    OrdinalEncoder). Unseen ⇒ -1 (sklearn's unknown_value idiom).

    ``max_categories`` guards the global-sort index assignment: the
    no-partition row_number funnels every distinct category through one
    partition, which is fine for a bounded vocabulary and an OOM/stall
    on a web-scale key (URL host at 10^8 distinct) — fail loudly like
    the other driver-side encoders instead of hanging."""

    def __init__(self, max_categories: int = 100_000):
        self.max_categories = max_categories

    def fit(self, df, cols, ctx, y=None):
        self._cols = cols
        self.params_ = {}
        for c in cols:
            from pyspark.sql import Window

            distinct = df.select(F.col(c).alias("__g")).distinct()
            n = distinct.limit(self.max_categories + 1).count()
            if n > self.max_categories:
                raise ValueError(
                    f"{c}: > {self.max_categories} distinct categories — "
                    "ordinal indexing needs a global sort; use "
                    "HashingEncoder/FrequencyEncoder for unbounded keys "
                    "or raise max_categories explicitly"
                )
            w = Window.orderBy(F.col("__g"))
            self.params_[c] = distinct.select(
                "__g",
                (F.row_number().over(w) - 1).cast("double").alias("__enc"),
            )
        return self

    def _default(self):
        return F.lit(-1.0)


class OneHotEncoder(SparkTransformer):
    """One column per train category, sorted; unknown ⇒ all zeros
    (sklearn OneHotEncoder(handle_unknown='ignore')). The category list
    is collected to the driver at fit (guarded by ``max_categories``) and
    compiled to plain comparison expressions — no join at all."""

    def __init__(self, max_categories: int = 1000):
        self.max_categories = max_categories

    def fit(self, df, cols, ctx, y=None):
        self._cols = cols
        self.categories_ = {}
        for c in cols:
            # filter NULL before the limit: Spark sorts NULL first, so a
            # NULL would otherwise consume a limit slot and let a column
            # with max_categories+1 real categories slip past the guard
            # (the overflow category silently encoding as unseen)
            cats = [
                r[0]
                for r in df.select(c)
                .filter(F.col(c).isNotNull())
                .distinct()
                .orderBy(c)
                .limit(self.max_categories + 1)
                .collect()
            ]
            if len(cats) > self.max_categories:
                raise ValueError(
                    f"column {c} has >{self.max_categories} categories; "
                    f"use HashingEncoder or TargetEncoder at this cardinality"
                )
            self.categories_[c] = cats
        return self

    def transform_exprs(self, in_exprs, ctx):
        out = []
        for e, c in zip(in_exprs, self._cols):
            for cat in self.categories_[c]:
                out.append((e == F.lit(cat)).cast("int"))
        return [F.coalesce(o, F.lit(0)) for o in out]


class HashingEncoder(SparkTransformer):
    """Stateless feature hashing into ``n_components`` indicator columns
    via xxhash64 (category_encoders HashingEncoder shape). JVM-side,
    no fit, collision-tolerant at web-scale cardinalities."""

    def __init__(self, n_components: int = 8):
        self.n_components = n_components

    def transform_exprs(self, in_exprs, ctx):
        out = []
        for e in in_exprs:
            bucket = F.pmod(F.xxhash64(e.cast("string")), F.lit(self.n_components))
            for j in range(self.n_components):
                out.append((bucket == j).cast("int"))
        return out


class RareLabelEncoder(JoinFittedEncoder):
    """Replace categories rarer than ``tol`` (fraction of train rows)
    with 'Rare' (feature_engine RareLabelEncoder)."""

    def __init__(self, tol: float = 0.05, rare_label: str = "Rare"):
        self.tol = tol
        self.rare_label = rare_label

    def _global_fit(self, df, y):
        self.n_ = df.count()

    def _fit_aggs(self, y):
        return [F.count(F.lit(1)).alias("__n")]

    def _enc_expr(self):
        # boolean KEEP flag, not the encoded value: a frequent NULL
        # category's encoded value would itself be NULL, which the
        # transform-side coalesce could not tell apart from a join miss
        # (it would wrongly emit 'Rare' for a 50%-frequent NULL group)
        return F.col("__n") / F.lit(float(self.n_)) >= self.tol

    def _default(self):
        return F.lit(self.rare_label)

    def transform_df(self, df, cols, alias, ctx):
        # output is string-typed: original value where the category's
        # keep flag is true (NULL category stays NULL — it is a real
        # category under the eqNullSafe convention), 'Rare' when the
        # flag is false OR the join missed (unseen)
        out_names = []
        cur = df
        for i, c in enumerate(cols):
            name = alias if len(cols) == 1 else f"{alias}_{i}"
            p = self.params_[c].withColumnRenamed("__enc", f"__keep_{name}")
            cur = cur.join(F.broadcast(p), cur[c].eqNullSafe(F.col("__g")), "left")
            cur = cur.select(
                *[F.col(x) for x in cur.columns if x not in ("__g", f"__keep_{name}")],
                F.when(
                    F.coalesce(F.col(f"__keep_{name}"), F.lit(False)),
                    F.col(c).cast("string"),
                )
                .otherwise(F.lit(self.rare_label))
                .alias(name),
            )
            out_names.append(name)
        return cur, out_names


class MeanEncoder(JoinFittedEncoder):
    """Unsmoothed per-category target mean (feature_engine MeanEncoder).
    Unseen ⇒ prior."""

    needs_y = True

    def _global_fit(self, df, y):
        self.prior_ = df.agg(F.avg(F.col(y).cast("double"))).first()[0]

    def _fit_aggs(self, y):
        return [F.avg(F.col(y).cast("double")).alias("__m")]

    def _enc_expr(self):
        return F.col("__m")

    def _default(self):
        return F.lit(self.prior_)


class FrequencyEncoder(CountEncoder):
    """Category → train frequency FRACTION (feature_engine
    CountFrequencyEncoder with encoding_method='frequency')."""

    def _global_fit(self, df, y):
        self.n_ = df.count()

    def _enc_expr(self):
        return F.col("__n").cast("double") / F.lit(float(self.n_))


class BaseNEncoder(SparkTransformer):
    """Ordinal index in base N as digit columns (category_encoders
    BaseNEncoder; base=2 ⇒ BinaryEncoder). Fit collects the sorted
    category list (driver-side, guarded); transform is a when-chain to
    the index plus arithmetic digit extraction — no join."""

    def __init__(self, base: int = 2, max_categories: int = 10000):
        self.base = base
        self.max_categories = max_categories

    def fit(self, df, cols, ctx, y=None):
        self._cols = cols
        self.categories_ = {}
        for c in cols:
            # filter NULL before the limit: Spark sorts NULL first, so a
            # NULL would otherwise consume a limit slot and let a column
            # with max_categories+1 real categories slip past the guard
            # (the overflow category silently encoding as unseen)
            cats = [
                r[0]
                for r in df.select(c)
                .filter(F.col(c).isNotNull())
                .distinct()
                .orderBy(c)
                .limit(self.max_categories + 1)
                .collect()
            ]
            if len(cats) > self.max_categories:
                raise ValueError(f"{c}: too many categories for BaseNEncoder")
            self.categories_[c] = cats
        return self

    def transform_exprs(self, in_exprs, ctx):
        import math

        out = []
        for e, c in zip(in_exprs, self._cols):
            cats = self.categories_[c]
            # codes 1..n with unseen/NULL = 0 (category_encoders'
            # convention): the all-zero digit vector is then UNIQUE to
            # unknowns — a -1 sentinel would pmod to all-ones and
            # collide byte-identically with the highest real category
            idx = F.lit(0)
            for i, cat in enumerate(cats):
                idx = F.when(e == F.lit(cat), F.lit(i + 1)).otherwise(idx)
            n_digits = max(1, math.ceil(math.log(len(cats) + 1, self.base)))
            for d in range(n_digits):
                out.append(
                    F.pmod(
                        F.floor(idx / F.lit(self.base**d)), F.lit(self.base)
                    ).cast("int")
                )
        return out


class BinaryEncoder(BaseNEncoder):
    """category_encoders BinaryEncoder = BaseNEncoder(base=2)."""

    def __init__(self, max_categories: int = 10000):
        super().__init__(base=2, max_categories=max_categories)


def contrast_matrix(scheme: str, k: int) -> list[list[float]]:
    """Contrast matrix (k levels × k-1 columns) for the classic coding
    schemes the reference re-exports from category_encoders
    (/root/reference/ballet/eng/external/category_encoders.py:3-46,
    statsmodels contrast semantics):

    - ``helmert``: column j compares level j+1 against the mean of
      levels 0..j (statsmodels Helmert.code_without_intercept);
    - ``sum``: indicator for levels 0..k-2, last level = all -1;
    - ``backward_difference``: M[i][j] = -(k-1-j)/k if i<=j else (j+1)/k;
    - ``polynomial``: orthonormal polynomial trends (R contr.poly): QR
      of the centered Vandermonde, intercept column dropped, R-diagonal
      signs fixed so the linear term increases.
    """
    import numpy as np

    if k < 2:
        raise ValueError("contrast coding needs >= 2 categories")
    if scheme == "helmert":
        m = [
            [
                float(j + 1) if i == j + 1 else (-1.0 if i <= j else 0.0)
                for j in range(k - 1)
            ]
            for i in range(k)
        ]
    elif scheme == "sum":
        m = [
            [
                -1.0 if i == k - 1 else (1.0 if i == j else 0.0)
                for j in range(k - 1)
            ]
            for i in range(k)
        ]
    elif scheme == "backward_difference":
        m = [
            [
                -(k - 1 - j) / k if i <= j else (j + 1) / k
                for j in range(k - 1)
            ]
            for i in range(k)
        ]
    elif scheme == "polynomial":
        x = np.arange(1, k + 1, dtype=float)
        x = x - x.mean()
        v = np.vander(x, k, increasing=True)
        q, r = np.linalg.qr(v)
        q = q * np.sign(np.diag(r))
        m = q[:, 1:].tolist()
    else:
        raise ValueError(f"unknown contrast scheme: {scheme}")
    return m


class ContrastEncoder(SparkTransformer):
    """Helmert / Sum / Polynomial / BackwardDifference contrast coding —
    the last fit/transform family from the reference's endorsed
    category_encoders surface. Fit collects the sorted train category
    list (driver-side, guarded — contrast coding is only sensible at
    small k); transform compiles to a when-chain ordinal index × the
    contrast matrix as plain expressions: NO join, no shuffle, the
    10^12-row side streams through a single Project. Unseen/NULL
    categories encode to 0.0 in every contrast column."""

    def __init__(self, scheme: str = "helmert", max_categories: int = 200):
        contrast_matrix(scheme, 2)  # validate scheme eagerly
        self.scheme = scheme
        self.max_categories = max_categories

    def fit(self, df, cols, ctx, y=None):
        self._cols = cols
        self.categories_ = {}
        self.matrices_ = {}
        for c in cols:
            # filter NULL before the limit: Spark sorts NULL first, so a
            # NULL would otherwise consume a limit slot and let a column
            # with max_categories+1 real categories slip past the guard
            # (the overflow category silently encoding as unseen)
            cats = [
                r[0]
                for r in df.select(c)
                .filter(F.col(c).isNotNull())
                .distinct()
                .orderBy(c)
                .limit(self.max_categories + 1)
                .collect()
            ]
            if len(cats) > self.max_categories:
                raise ValueError(
                    f"column {c} has >{self.max_categories} categories; "
                    f"contrast coding is not meaningful at that cardinality"
                )
            self.categories_[c] = cats
            self.matrices_[c] = contrast_matrix(self.scheme, len(cats))
        return self

    def transform_exprs(self, in_exprs, ctx):
        out = []
        for e, c in zip(in_exprs, self._cols):
            cats, m = self.categories_[c], self.matrices_[c]
            for j in range(len(cats) - 1):
                expr = F.lit(0.0)
                for i, cat in enumerate(cats):
                    expr = F.when(e == F.lit(cat), F.lit(float(m[i][j]))).otherwise(expr)
                out.append(expr)
        return out


class OrderedTargetEncoder(SparkTransformer):
    """CatBoost-style ORDERED target encoding, point-in-time native:
    each row is encoded with the running target statistics of its
    category STRICTLY BEFORE the row's event time —
    ``(sum_y_before + a*prior) / (n_before + a)`` — so train rows never
    see their own or future labels (category_encoders CatBoostEncoder
    semantics with the engine's time column as the permutation order;
    zero-leakage by construction). One window over (category, time)."""

    def __init__(self, y_col: str, a: float = 1.0):
        self.y_col = y_col
        self.a = a

    def fit(self, df, cols, ctx, y=None):
        self._cols = cols
        ycol = y or self.y_col
        row = df.agg(
            F.sum(F.col(ycol).cast("double")).alias("s"),
            F.count(F.col(ycol)).alias("c"),
        ).first()
        self.sum_, self.count_ = float(row["s"]), float(row["c"])
        self.prior_ = self.sum_ / self.count_
        self._fitted_y = ycol
        return self

    def transform_exprs(self, in_exprs, ctx):
        from pyspark.sql import Window

        out = []
        for e in in_exprs:
            # STRICTLY-before must hold under tied event times too: a
            # ROWS frame ending at -1 includes same-instant rows in
            # arbitrary partition order (same-timestamp label leakage +
            # run-to-run nondeterminism). RANGE frames are tie-group
            # aware: cumulative-through-peers minus the peer group
            # itself = everything with ts strictly less than this row's,
            # independent of tie order. Both frames share one
            # (partitionBy, orderBy) → ONE Window node, one exchange.
            base = Window.partitionBy(e).orderBy(F.col(ctx.time_col))
            w_cum = base.rangeBetween(Window.unboundedPreceding, Window.currentRow)
            w_tie = base.rangeBetween(Window.currentRow, Window.currentRow)
            y = F.col(self._fitted_y).cast("double")
            s = F.coalesce(F.sum(y).over(w_cum), F.lit(0.0)) - F.coalesce(
                F.sum(y).over(w_tie), F.lit(0.0)
            )
            n = (
                F.coalesce(F.count(y).over(w_cum), F.lit(0))
                - F.coalesce(F.count(y).over(w_tie), F.lit(0))
            ).cast("double")
            # rational form (s*C + a*S) / ((n+a)*C): for integer-valued
            # labels this is ONE division of exactly-representable
            # operands, so independent engines produce bit-identical
            # doubles (prior-first formulations differ in the last ulp
            # and flip rounding boundaries)
            C, S = F.lit(self.count_), F.lit(self.sum_)
            out.append(
                (s * C + F.lit(self.a) * S) / ((n + F.lit(self.a)) * C)
            )
        return out
