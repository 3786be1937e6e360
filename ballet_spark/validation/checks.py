"""Feature-API checks (SURVEY.md §2.4 V11) — engine ``validate(feature)``.

The reference runs 14 software checks on a candidate feature
(ballet/validation/feature_api/checks.py:34-235): construction, fit/
transform on full and 1-row frames, row-count preservation, no
NaN/inf, deepcopy/pickle-ability. The engine analog validates a
:class:`~ballet_spark.core.Feature` against a sample DataFrame:

- compiles (desugar + input resolution against the schema);
- fits on the sample and on a 1-row slice;
- transforms the sample, a 1-row slice, and an unseen slice
  (fit-on-train / transform-on-new-rows);
- output row count == input row count for each;
- no NaN/inf in numeric outputs, not all-null;
- the transformer state deep-copies (our operators are plain picklable
  Python objects — the spec-is-data analog of the reference's
  pickling check).
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    passed: bool
    failures: list[str] = field(default_factory=list)
    advice: dict = field(default_factory=dict)


def _numeric_cols(df: DataFrame, cols: list[str]) -> list[str]:
    types = dict(df.dtypes)
    num = ("double", "float", "int", "bigint", "smallint", "tinyint", "decimal")
    return [c for c in cols if any(types[c].startswith(n) for n in num)]


def validate_feature(
    feature,
    sample: DataFrame,
    entity_col: str = "url",
    time_col: str = "warc_ts",
    y: str | None = None,
) -> CheckResult:
    from ballet_spark.core import FeatureEngineeringPipeline

    failures: list[str] = []

    def check(name: str, fn):
        try:
            fn()
            return True
        except Exception as e:  # noqa: BLE001 — report, don't crash CI
            failures.append(f"{name}: {type(e).__name__}: {e}")
            return False

    pipe = FeatureEngineeringPipeline(
        [feature], entity_col=entity_col, time_col=time_col
    )

    # can_deepcopy (checks.py:196-205 analog)
    check("can_deepcopy", lambda: copy.deepcopy(feature._transformer))

    # input resolves against schema
    if not check("input_resolves", lambda: feature.resolve_input(sample)):
        return CheckResult(False, failures)

    state = {}

    def _fit():
        state["fitted"] = pipe.fit(sample, y=y)

    if not check("can_fit", _fit):
        return CheckResult(False, failures)

    one = sample.limit(1)
    check("can_fit_one_row", lambda: pipe.fit(one, y=y))

    n_in = sample.count()
    out = {}

    def _force_count(df) -> int:
        """Row count that EVALUATES every column: a bare count() lets
        Catalyst prune the feature expressions entirely, so runtime
        errors inside them (raise_error on unseen groups, bad casts,
        UDF crashes) would never fire and the check would false-pass."""
        row = df.agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.count(F.col(c)).alias(f"__c{i}") for i, c in enumerate(df.columns)],
        ).first()
        return row["__n"]

    def _transform():
        out["df"] = state["fitted"].transform(sample)
        out["n"] = _force_count(out["df"])

    if not check("can_transform", _transform):
        return CheckResult(False, failures)

    if out["n"] != n_in:
        failures.append(f"row_count: {out['n']} != {n_in}")

    check(
        "can_transform_one_row",
        lambda: _force_count(state["fitted"].transform(one)),
    )

    # transform GENUINELY unseen rows (fit-on-train discipline): fit a
    # fresh copy on ~4/5 of entities and transform the held-out 1/5 —
    # a random subset of already-fitted rows would never catch
    # params-join operators that fail on unseen groups/entities
    bucket = F.pmod(F.xxhash64(F.coalesce(F.col(entity_col).cast("string"), F.lit(""))), F.lit(5))
    fit_part = sample.filter(bucket != 0)
    new_part = sample.filter(bucket == 0)

    def _transform_new():
        if fit_part.limit(1).count() == 0 or new_part.limit(1).count() == 0:
            return  # degenerate sample: nothing to hold out
        state["fitted_part"] = pipe.fit(fit_part, y=y)
        _force_count(state["fitted_part"].transform(new_part))

    check("can_transform_new_rows", _transform_new)

    # no NaN / inf / all-null outputs (checks.py:214-235)
    feat_cols = [c for c in out["df"].columns if c not in (entity_col, time_col)]
    num_cols = _numeric_cols(out["df"], feat_cols)
    if num_cols:
        bad = out["df"].select(
            *[
                F.sum(
                    (
                        F.isnan(F.col(c).cast("double"))
                        | F.col(c).cast("double").isin(float("inf"), float("-inf"))
                    ).cast("int")
                ).alias(c)
                for c in num_cols
            ]
        ).first()
        for c in num_cols:
            if bad[c] and bad[c] > 0:
                failures.append(f"has_nan_or_inf: column {c} ({bad[c]} rows)")
    # all-null outputs: ONE aggregation job for every column (a
    # filter/limit/count per column would launch q separate actions)
    if feat_cols and n_in > 0:
        nn = out["df"].agg(
            *[F.count(F.col(c)).alias(c) for c in feat_cols]
        ).first()
        for c in feat_cols:
            if nn[c] == 0:
                failures.append(f"all_null_output: column {c}")

    return CheckResult(not failures, failures)
