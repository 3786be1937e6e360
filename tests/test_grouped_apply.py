"""Direct test for GroupedApply (E3 GroupedFunctionTransformer,
ballet/eng/base.py:64-91): arbitrary per-group pandas function via
applyInPandas vs a pandas groupby.apply oracle."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ballet_spark.core import PipelineContext
from ballet_spark.operators.fitted import GroupedApply


def test_grouped_apply_matches_pandas(spark, webtext_df, webtext_pdf):
    # defined inside the test: module-level functions in test files are
    # pickled by reference and the module isn't shipped to executors
    def rank_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["url", "warc_ts"]].copy()
        out["len_rank"] = pdf["text_len"].rank(method="average")
        return out

    df = webtext_df.withColumn("text_len", F.length("text").cast("double"))
    op = GroupedApply(
        rank_fn, schema="url string, warc_ts timestamp, len_rank double"
    )
    ctx = PipelineContext(entity_col="url", time_col="warc_ts")
    out, new_cols = op.transform_df(df, ["text_len"], "rank", ctx)
    got = (
        out.toPandas()
        .sort_values(["url", "warc_ts"], kind="mergesort")
        .reset_index(drop=True)
    )
    p = webtext_pdf.copy()
    p["text_len"] = p["text"].str.len().astype(float)
    exp = (
        p.assign(len_rank=p.groupby("url")["text_len"].rank(method="average"))
        .sort_values(["url", "warc_ts"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert np.allclose(got["len_rank"].to_numpy(float), exp["len_rank"].to_numpy(float))
    assert "len_rank" in new_cols
