"""DFS agg-feature synthesis, tsfresh-style feature vectors, and
moment-aggregate IterativeImputer."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ballet_spark.core import PipelineContext
from ballet_spark.operators.dfs import DFSAggFeatures, ts_features
from ballet_spark.operators.fitted import IterativeImputer


def test_dfs_depth1_matches_manual(spark):
    child = spark.createDataFrame(
        [(1, 10.0), (1, 30.0), (2, 5.0)], "k long, x double"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    out = (
        DFSAggFeatures(child, "k", ["x"], agg_primitives=("sum", "mean", "max"))
        .augment(parent, "k")
        .orderBy("k")
        .toPandas()
    )
    assert out["dfs_sum_x"].tolist()[:2] == [40.0, 5.0]
    assert out["dfs_mean_x"].tolist()[:2] == [20.0, 5.0]
    assert out["dfs_max_x"].tolist()[:2] == [30.0, 5.0]
    assert out["dfs_count"].tolist()[:2] == [2, 1]
    # parent key with no children: left join keeps the row, features NULL
    assert np.isnan(out.loc[2, "dfs_sum_x"])


def test_dfs_depth2_stacks(spark):
    child = spark.createDataFrame(
        [(1, 10.0), (1, 30.0), (2, 5.0)], "k long, x double"
    )
    parent = spark.createDataFrame([(1, 100), (2, 100), (3, 200)], "k long, g long")
    lvl1 = DFSAggFeatures(child, "k", ["x"], agg_primitives=("sum",)).augment(
        parent, "k"
    )
    lvl2 = (
        DFSAggFeatures(lvl1, "g", ["dfs_sum_x"], agg_primitives=("sum", "mean"))
        .features()
        .orderBy("g")
        .toPandas()
    )
    vals = lvl2["dfs_sum_dfs_sum_x"].tolist()
    assert vals[0] == 45.0 and np.isnan(vals[1])
    assert lvl2["dfs_mean_dfs_sum_x"].tolist()[0] == pytest.approx(22.5)
    assert lvl2["dfs_count"].tolist() == [2, 1]


def test_dfs_rejects_unknown_primitive(spark):
    with pytest.raises(ValueError, match="unknown agg primitives"):
        DFSAggFeatures(None, "k", ["x"], agg_primitives=("sum", "mode"))


def test_ts_features_hand_case(spark):
    df = spark.createDataFrame(
        [("u", 1.0, 1.0), ("u", 2.0, 4.0), ("u", 3.0, 2.0)],
        "e string, ts double, v double",
    )
    out = ts_features(df, "e", "ts", "v").toPandas().iloc[0]
    assert out["ts_length"] == 3
    assert out["ts_mean"] == pytest.approx(7.0 / 3)
    assert out["ts_min"] == 1.0 and out["ts_max"] == 4.0
    assert out["ts_sum"] == 7.0
    assert out["ts_abs_energy"] == pytest.approx(1 + 16 + 4)
    assert out["ts_mean_abs_change"] == pytest.approx((3 + 2) / 2)
    assert out["ts_first"] == 1.0 and out["ts_last"] == 2.0
    # order-dependent additions: series 1,4,2; mean 7/3
    assert out["ts_n_peaks"] == 1  # 4 > both neighbors
    assert out["ts_count_above_mean"] == 1  # only 4 > 7/3
    assert out["ts_longest_strike_above_mean"] == 1
    # numpy oracles for the statistical additions
    x = np.array([1.0, 4.0, 2.0])
    mu, varp = x.mean(), x.var()
    expect_ac = ((x[1:] - mu) * (x[:-1] - mu)).sum() / ((len(x) - 1) * varp)
    assert out["ts_autocorr1"] == pytest.approx(expect_ac)
    assert out["ts_cid_ce"] == pytest.approx(np.sqrt(np.sum(np.diff(x) ** 2)))


def test_ts_features_autocorr_degenerate(spark):
    # constant series: zero variance -> NULL autocorr, cid_ce 0
    df = spark.createDataFrame(
        [("u", float(i), 3.0) for i in range(4)] + [("solo", 0.0, 9.0)],
        "e string, ts double, v double",
    )
    out = ts_features(df, "e", "ts", "v").toPandas().set_index("e")
    assert np.isnan(out.loc["u", "ts_autocorr1"])
    assert out.loc["u", "ts_cid_ce"] == 0.0
    # single-row series: n<=1 -> NULL autocorr, cid_ce NULL (no pairs)
    assert np.isnan(out.loc["solo", "ts_autocorr1"])


def test_ts_features_streaks_and_peaks(spark):
    # series: 0,5,6,7,0,8,9,0 -> mean 4.375; above-runs of len 3 and 2;
    # peaks at 7 (idx3) and 9 (idx6); boundary values can't be peaks
    vals = [0.0, 5.0, 6.0, 7.0, 0.0, 8.0, 9.0, 0.0]
    df = spark.createDataFrame(
        [("u", float(i), v) for i, v in enumerate(vals)],
        "e string, ts double, v double",
    )
    out = ts_features(df, "e", "ts", "v").toPandas().iloc[0]
    assert out["ts_longest_strike_above_mean"] == 3
    assert out["ts_count_above_mean"] == 5
    assert out["ts_n_peaks"] == 2
    # NULL values reset the streak and are never peaks/above
    vals2 = [5.0, 6.0, None, 7.0, 8.0]  # mean of non-null = 6.5
    df2 = spark.createDataFrame(
        [("u", float(i), v) for i, v in enumerate(vals2)],
        "e string, ts double, v double",
    )
    out2 = ts_features(df2, "e", "ts", "v").toPandas().iloc[0]
    assert out2["ts_longest_strike_above_mean"] == 2  # the 7,8 run
    assert out2["ts_count_above_mean"] == 2


def test_ts_features_single_exchange(spark):
    """The widened catalog (peaks/streak/count-above-mean) must still
    plan ONE Exchange before the final aggregation's own shuffle — the
    running-max streak form exists precisely to avoid a second
    data-sized shuffle on (entity, island)."""
    df = spark.createDataFrame(
        [("u%d" % (i % 5), float(i), float(i * 7 % 13)) for i in range(100)],
        "e string, ts double, v double",
    )
    plan = (
        ts_features(df, "e", "ts", "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exchanges: one hashpartitioning(e) for the windows (reused by the
    # partial+final agg) — anything beyond the agg's exchange is a
    # regression. AQE may add AQEShuffleRead wrappers; count Exchange
    # nodes only.
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, plan


def test_iterative_imputer_recovers_linear_signal(spark):
    # v = 3 + 2*x exactly; masked rows must be imputed exactly
    rows = [(i, float(i), 3.0 + 2.0 * i if i % 4 else None, float(i % 7))
            for i in range(40)]
    df = spark.createDataFrame(rows, "id long, x double, v double, z double")
    imp = IterativeImputer(feature_cols=["x", "z"], max_iter=1)
    ctx = PipelineContext(entity_col="id", time_col="x", point_in_time=False)
    imp.fit(df, ["v"], ctx)
    out, names = imp.transform_df(df, ["v"], "vi", ctx)
    pdf = out.orderBy("id").toPandas()
    assert names == ["vi"]
    for i in range(0, 40, 4):
        assert pdf.loc[i, "vi"] == pytest.approx(3.0 + 2.0 * i, abs=1e-6)
    # observed rows pass through exactly
    assert pdf.loc[1, "vi"] == 5.0


def test_iterative_imputer_degenerate_falls_back_to_mean(spark):
    # constant features -> singular system -> mean imputation
    df = spark.createDataFrame(
        [(1, 1.0, 1.0, 10.0), (2, 1.0, 1.0, 20.0), (3, 1.0, 1.0, None)],
        "id long, a double, b double, v double",
    )
    imp = IterativeImputer(feature_cols=["a", "b"], max_iter=1)
    ctx = PipelineContext(entity_col="id", time_col="a", point_in_time=False)
    imp.fit(df, ["v"], ctx)
    out, _ = imp.transform_df(df, ["v"], "vi", ctx)
    pdf = out.orderBy("id").toPandas()
    assert pdf.loc[2, "vi"] == pytest.approx(15.0)


def test_iterative_imputer_round_robin_sweeps_refine(spark):
    """Two mutually-predictive columns with disjoint missingness:
    sweep 2 must differ from sweep 1 (x's imputations feed y's refit
    through the working values) and move toward the true linear
    relationship y = 2x."""
    rows = []
    rng = np.random.default_rng(5)
    for i in range(400):
        x = float(rng.normal(10, 3))
        y = 2.0 * x + float(rng.normal(0, 0.01))
        # disjoint masks: x missing on i%10==0, y missing on i%10==1
        rows.append(
            (i, None if i % 10 == 0 else x, None if i % 10 == 1 else y)
        )
    df = spark.createDataFrame(rows, "i long, x double, y double")
    ctx = PipelineContext(entity_col="i", time_col="i", point_in_time=False)

    def run(max_iter):
        imp = IterativeImputer(feature_cols=["x", "y"], max_iter=max_iter)
        imp.fit(df, ["x", "y"], ctx)
        out, names = imp.transform_df(df, ["x", "y"], "imp", ctx)
        pdf = out.orderBy("i").toPandas()
        return pdf

    one, three = run(1), run(3)
    # sweeps actually change the result (the old loop was a no-op)
    assert not np.allclose(one["imp_0"], three["imp_0"])
    # and refine it: imputed x should approach y/2 where y is observed
    truth = one["y"].to_numpy() / 2.0
    mask = one["x"].isna().to_numpy() & ~one["y"].isna().to_numpy()
    err1 = np.abs(one["imp_0"].to_numpy()[mask] - truth[mask]).mean()
    err3 = np.abs(three["imp_0"].to_numpy()[mask] - truth[mask]).mean()
    assert err3 <= err1


def test_ts_features_exact_sums_partition_invariant(spark):
    """exact_sums: microunit integer accumulation makes every float
    feature BIT-identical across partitionings (float sums are only
    approximately equal), at a quantization of 5e-7."""
    rows = [("u%d" % (i % 7), float(i), float((i * 37 % 100) + 0.01 * (i % 13)))
            for i in range(2000)]
    df = spark.createDataFrame(rows, "e string, ts double, v double")
    a = (ts_features(df.repartition(1), "e", "ts", "v", exact_sums=True)
         .orderBy("e").toPandas())
    b = (ts_features(df.repartition(17), "e", "ts", "v", exact_sums=True)
         .orderBy("e").toPandas())
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        assert (av == bv).all(), c  # bitwise, not allclose
    # and the values agree with the float path to quantization error
    f = (ts_features(df, "e", "ts", "v").orderBy("e").toPandas())
    assert np.allclose(a["ts_mean"], f["ts_mean"], atol=1e-6)
    assert np.allclose(a["ts_std"], f["ts_std"], atol=1e-5, equal_nan=True)
    assert np.allclose(a["ts_autocorr1"], f["ts_autocorr1"], atol=1e-4,
                       equal_nan=True)


def test_dfs_exact_primitives_partition_invariant(spark):
    child = spark.createDataFrame(
        [(i % 5, 0.01 * ((i * 7919) % 1000)) for i in range(3000)],
        "k long, x double",
    )
    a = (DFSAggFeatures(child.repartition(1), "k", ["x"],
                        agg_primitives=("sum_exact", "mean_exact"))
         .features().orderBy("k").toPandas())
    b = (DFSAggFeatures(child.repartition(13), "k", ["x"],
                        agg_primitives=("sum_exact", "mean_exact"))
         .features().orderBy("k").toPandas())
    for c in ("dfs_sum_exact_x", "dfs_mean_exact_x"):
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c  # bitwise
    # agrees with the float primitive to quantization error
    f = (DFSAggFeatures(child, "k", ["x"], agg_primitives=("sum", "mean"))
         .features().orderBy("k").toPandas())
    assert np.allclose(a["dfs_sum_exact_x"], f["dfs_sum_x"], atol=1e-3)


def test_ts_fft_coefficients_match_numpy(spark):
    """fft_k features vs np.fft.fft on the same per-entity series —
    re/im/abs for k in 0..3, variable series lengths, plus the
    one-Exchange plan shape with fft_k on."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    rows = []
    for e in range(6):
        n = int(rng.integers(3, 40))
        for t in range(n):
            rows.append((f"e{e}", t, float(np.round(rng.normal(), 3))))
    pdf = pd.DataFrame(rows, columns=["ent", "ts", "value"])
    df = spark.createDataFrame(pdf)
    out = (
        ts_features(df, "ent", "ts", "value", fft_k=(0, 1, 2, 3))
        .toPandas()
        .set_index("ent")
    )
    for e, g in pdf.groupby("ent"):
        x = g.sort_values("ts")["value"].to_numpy()
        X = np.fft.fft(x)
        for k in (0, 1, 2, 3):
            got = out.loc[
                e, [f"ts_fft{k}_re", f"ts_fft{k}_im", f"ts_fft{k}_abs"]
            ].to_numpy(dtype=float)
            exp = np.array([X[k].real, X[k].imag, abs(X[k])])
            # 1e-6 cos/sin quantization × |x| sums ⇒ small abs tolerance
            assert np.allclose(got, exp, atol=2e-4), (e, k, got, exp)

    # exact_sums + fft keeps the single-Exchange single-Sort plan
    plan = (
        ts_features(df, "ent", "ts", "value", exact_sums=True, fft_k=(0, 1))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
