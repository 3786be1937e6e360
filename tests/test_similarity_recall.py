"""Recall guarantees for the approximate (LSH) similarity paths — the
100 TB defaults must not silently lose near-duplicates or neighbors.

- band-OR SRP near-dup dedup: ≥0.95 recall on PLANTED near-duplicates
  (cosine ≈ 0.99) with the default b=8, L=16 (analytic miss ≈ 8e-5);
- multi-probe cosine_topk_lsh: recall@5 ≥ 0.95 vs the exact
  cosine_topk at the entry query's b=3, L=20 parameters.
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ballet_spark.operators.dedup import embedding_neardup_pairs
from ballet_spark.operators.similarity import cosine_topk, cosine_topk_lsh

SF_DIR = "/root/testdata/sf0.001"


def test_planted_neardup_recall_lsh_default(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pdf = emb.toPandas()
    rng = np.random.default_rng(0)
    mat = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    noisy = mat[:50] + rng.standard_normal((50, 64)) * 0.02 * np.abs(mat[:50]).mean()
    base = pd.DataFrame(
        {
            "vec_id": pdf["vec_id"].astype("int64"),
            "embedding": pdf["embedding"].map(lambda a: [float(x) for x in a]),
        }
    )
    planted = pd.DataFrame(
        {
            "vec_id": (pdf["vec_id"][:50] + 100000).astype("int64"),
            "embedding": [[float(x) for x in r] for r in noisy],
        }
    )
    both = spark.createDataFrame(
        pd.concat([base, planted], ignore_index=True),
        "vec_id long, embedding array<double>",
    )
    found = embedding_neardup_pairs(both, threshold=0.9).toPandas()
    hits = set(zip(found["id_a"], found["id_b"]))
    want = {(int(i), int(i) + 100000) for i in pdf["vec_id"][:50]}
    recall = len(hits & want) / len(want)
    assert recall >= 0.95
    # every reported pair must genuinely clear the cosine threshold
    # (LSH only prunes candidates; the filter is exact)
    assert (found["cosine"] >= 0.9).all()


def test_lsh_topk_recall_vs_exact(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, q, k=5).select("query_id", "neighbor_id").toPandas()
    approx = (
        cosine_topk_lsh(emb, q, k=5, dim=64, n_planes=3, n_tables=20, seed=42)
        .select("query_id", "neighbor_id")
        .toPandas()
    )
    ex = set(map(tuple, exact.to_numpy()))
    ap = set(map(tuple, approx.to_numpy()))
    assert len(ex) == 100
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.95


def test_no_allpairs_default_plan(spark):
    """The default near-dup plan must join on the LSH (tbl, bucket)
    equi-key — a cartesian/broadcast-nested-loop all-pairs join may
    only appear under exact=True."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = embedding_neardup_pairs(emb, threshold=0.9)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_topk_recall_and_determinism(spark):
    """IVF on the fixture: deterministic fit, recall@5 ≥ 0.7 at
    n_probe=8/16 (the fixture's clusters are loose, so half the lists
    must be probed — the documented IVF recall knob)."""
    from ballet_spark.operators.similarity import ivf_fit, ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    cents = ivf_fit(emb, n_centroids=16, n_iter=3)
    cents2 = ivf_fit(emb.repartition(13), n_centroids=16, n_iter=3)
    assert np.allclose(cents, cents2)  # md5-seeded fit, partition-stable

    exact = cosine_topk(emb, q, k=5).toPandas()
    approx = ivf_topk(emb, q, cents, k=5, n_probe=8).toPandas()
    es = set(map(tuple, exact[["query_id", "neighbor_id"]].values))
    got = set(map(tuple, approx[["query_id", "neighbor_id"]].values))
    assert len(es & got) / len(es) >= 0.7
    # reported cosines are exact (re-rank is exact; IVF only prunes)
    merged = approx.merge(exact, on=["query_id", "neighbor_id"], suffixes=("_a", "_e"))
    assert np.allclose(merged["cosine_a"], merged["cosine_e"])


def test_ivf_topk_tight_clusters_high_recall(spark):
    """Planted tight clusters (IVF's design regime): 10 centers, small
    noise → recall@5 ≈ 1 with 2 probes of 10 lists."""
    from ballet_spark.operators.similarity import ivf_fit, ivf_topk

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((10, 64)) * 5.0
    rows = []
    for i in range(500):
        c = i % 10
        v = centers[c] + rng.standard_normal(64) * 0.3
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 15)
    cents = ivf_fit(df, n_centroids=10, n_iter=4)
    exact = cosine_topk(df, q, k=5).toPandas()
    approx = ivf_topk(df, q, cents, k=5, n_probe=2).toPandas()
    es = set(map(tuple, exact[["query_id", "neighbor_id"]].values))
    got = set(map(tuple, approx[["query_id", "neighbor_id"]].values))
    assert len(es & got) / len(es) >= 0.95


def test_similarity_accepts_string_ids(spark):
    """url-keyed vectors (the repo's primary entity key) must work in
    every ANN path — the output id columns keep the input dtype."""
    import numpy as np

    from ballet_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_lsh,
        ivf_fit,
        ivf_topk,
    )

    rng = np.random.default_rng(7)
    rows = [(f"https://d{i:03d}.org", rng.standard_normal(8).tolist())
            for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    queries = df.limit(3)
    exact = cosine_topk(df, queries, k=3)
    assert exact.schema["query_id"].dataType.simpleString() == "string"
    assert exact.count() == 9
    lsh = cosine_topk_lsh(df, queries, k=3, dim=8, n_planes=4, n_tables=4)
    assert lsh.schema["neighbor_id"].dataType.simpleString() == "string"
    assert lsh.count() > 0
    cents = ivf_fit(df, n_centroids=4, n_iter=1, vec_col="embedding")
    ivf = ivf_topk(df, queries, cents, k=3, n_probe=4)
    assert ivf.schema["query_id"].dataType.simpleString() == "string"
    assert ivf.count() == 9
