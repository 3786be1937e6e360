"""salted_running_agg: the two-phase hot-entity prefix scan must equal
the plain single-window plan row-for-row (VERDICT r3 ask #4 / SURVEY §4
custom item 3)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ballet_spark.plans.skew import salted_running_agg

AGGS = ("sum", "count", "min", "max")


def _fixture(spark):
    """Zipf-ish: one hot key spanning many day-chunks with tied
    timestamps ON chunk boundaries, tail keys, NULL values, NULL
    timestamps, and a NULL key."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    # hot: 400 rows over ~20 days; values dyadic (k*0.5) so float sums
    # are exact under any regrouping and parity can be exact equality
    for i in range(400):
        ts = base + dt.timedelta(hours=i * 1.25)
        v = None if i % 37 == 0 else (i % 23) * 0.5 - 3.0
        rows.append(("hot.example", ts, v))
    # tied timestamps, including exactly at a chunk boundary (midnight)
    rows += [("hot.example", base + dt.timedelta(days=3), 100.0)] * 3
    rows += [("hot.example", base + dt.timedelta(days=3, hours=7), -2.5)] * 2
    # NULL event times on the hot key (must fold into carries
    # nulls-first, like the plain RANGE window)
    rows += [("hot.example", None, 9.5), ("hot.example", None, None)]
    for k in range(6):
        for i in range(10):
            rows.append(
                (f"tail{k}.example", base + dt.timedelta(hours=i * 40), i * 0.5)
            )
    rows.append((None, base, 7.0))
    rows.append((None, base + dt.timedelta(days=1), 8.0))
    pdf = pd.DataFrame(rows, columns=["url", "ts", "value"])
    return spark.createDataFrame(
        pdf, "url string, ts timestamp, value double"
    ).repartition(7)


def _canon(df):
    pdf = df.toPandas()
    return (
        pdf.sort_values(list(pdf.columns), kind="mergesort")
        .reset_index(drop=True)
        .fillna("∅")
    )


def test_salted_running_matches_plain_window(spark):
    df = _fixture(spark)
    plain = salted_running_agg(df, "url", "ts", "value", AGGS, head=[])
    salted = salted_running_agg(
        df, "url", "ts", "value", AGGS, head=["hot.example"],
        chunk_seconds=86_400,
    )
    got, exp = _canon(salted), _canon(plain)
    assert len(got) == len(exp) == df.count()
    pd.testing.assert_frame_equal(got, exp)


def test_salted_running_auto_head_and_tiny_chunks(spark):
    df = _fixture(spark)
    # auto head detection picks the hot key; 6h chunks exercise many
    # more carry boundaries
    salted = salted_running_agg(
        df, "url", "ts", "value", AGGS, top_k=1, chunk_seconds=6 * 3600
    )
    plain = salted_running_agg(df, "url", "ts", "value", AGGS, head=[])
    pd.testing.assert_frame_equal(_canon(salted), _canon(plain))


def test_salted_running_plan_shape(spark):
    """Head path: local windows partition by (key, chunk) and the carry
    joins back by broadcast — no single-partition window over the full
    hot key."""
    df = _fixture(spark)
    out = salted_running_agg(
        df, "url", "ts", "value", AGGS, head=["hot.example"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__chunk" in plan
    assert "BroadcastHashJoin" in plan
    # decimal value → associative sums: exercised for plan validity
    dec = df.withColumn("value", F.col("value").cast("decimal(18,6)"))
    out2 = salted_running_agg(
        dec, "url", "ts", "value", ("sum", "count"), head=["hot.example"]
    )
    plain2 = salted_running_agg(dec, "url", "ts", "value", ("sum", "count"), head=[])
    pd.testing.assert_frame_equal(_canon(out2), _canon(plain2))


def test_salted_running_rejects_bad_args(spark):
    df = _fixture(spark)
    with pytest.raises(ValueError, match="unsupported"):
        salted_running_agg(df, "url", "ts", "value", ("median",))
    with pytest.raises(ValueError, match="chunk_seconds"):
        salted_running_agg(df, "url", "ts", "value", chunk_seconds=0)


def test_salted_rolling_matches_plain_window(spark):
    """Trailing time-window (RANGE [t-D, t]) two-phase plan equals the
    plain window row-for-row, including ghost-boundary reads, tied
    timestamps exactly at chunk edges, NULL values/times/keys."""
    from ballet_spark.plans.skew import salted_rolling_agg

    df = _fixture(spark)
    for dur, chunk in [(3600 * 6, 86_400), (86_400, 86_400), (0, 3600)]:
        plain = salted_rolling_agg(df, "url", "ts", "value", dur, AGGS, head=[])
        salted = salted_rolling_agg(
            df, "url", "ts", "value", dur, AGGS,
            head=["hot.example"], chunk_seconds=chunk,
        )
        got, exp = _canon(salted), _canon(plain)
        assert len(got) == len(exp) == df.count(), (dur, chunk)
        pd.testing.assert_frame_equal(got, exp)

    # auto head detection path
    salted = salted_rolling_agg(df, "url", "ts", "value", 7200, AGGS, top_k=1)
    plain = salted_rolling_agg(df, "url", "ts", "value", 7200, AGGS, head=[])
    pd.testing.assert_frame_equal(_canon(salted), _canon(plain))


def test_salted_rolling_guards(spark):
    from ballet_spark.plans.skew import salted_rolling_agg

    df = _fixture(spark)
    with pytest.raises(ValueError, match="chunk_seconds"):
        salted_rolling_agg(
            df, "url", "ts", "value", 7200, AGGS, chunk_seconds=3600
        )
    with pytest.raises(ValueError, match="duration_s"):
        salted_rolling_agg(df, "url", "ts", "value", -1, AGGS)
    with pytest.raises(ValueError, match="unsupported"):
        salted_rolling_agg(df, "url", "ts", "value", 10, ("median",))
