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

    def _transform():
        out["df"] = state["fitted"].transform(sample)
        out["n"] = out["df"].count()

    if not check("can_transform", _transform):
        return CheckResult(False, failures)

    if out["n"] != n_in:
        failures.append(f"row_count: {out['n']} != {n_in}")

    check(
        "can_transform_one_row",
        lambda: state["fitted"].transform(one).count(),
    )

    # transform new/unseen rows (fit-on-train discipline)
    holdout = sample.orderBy(F.rand(7)).limit(max(1, n_in // 5))
    check(
        "can_transform_new_rows",
        lambda: state["fitted"].transform(holdout).count(),
    )

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
    for c in feat_cols:
        nn = out["df"].filter(F.col(c).isNotNull()).limit(1).count()
        if nn == 0 and n_in > 0:
            failures.append(f"all_null_output: column {c}")

    return CheckResult(not failures, failures)
