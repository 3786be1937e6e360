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
