"""Generator determinism + the byte-identical text-extraction invariant."""

import pandas as pd

from ballet_spark.functions.text import extract_text_col
from ballet_spark.sources.webtext import (
    extract_text,
    generate_webtext_pdf,
    generate_webtext_spark,
)


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf["html"] = pdf["html"].map(bytes)
    return pdf.sort_values(["url", "warc_ts"]).reset_index(drop=True)


def test_distributed_generator_matches_pandas(spark):
    pdf = generate_webtext_pdf(n_pages=60, seed=7)
    sdf = generate_webtext_spark(spark, n_pages=60, seed=7).toPandas()
    a, b = _canon(pdf), _canon(sdf)
    pd.testing.assert_frame_equal(a, b)


def test_generator_is_deterministic():
    a = generate_webtext_pdf(n_pages=30, seed=42)
    b = generate_webtext_pdf(n_pages=30, seed=42)
    pd.testing.assert_frame_equal(a, b)


def test_domain_skew_exists(webtext_pdf):
    counts = webtext_pdf["url"].str.extract(r"https://([^/]+)/")[0].value_counts()
    # Zipf head: the hottest domain should hold a clear plurality
    assert counts.iloc[0] >= 5 * max(1, counts.iloc[-1])


def test_text_extraction_byte_identical(spark, webtext_df, webtext_pdf):
    """UDF-extracted text equals the stored text column byte-for-byte,
    and equals the single-node oracle extraction."""
    out = (
        webtext_df.select(
            "url", "warc_ts", "text", extract_text_col(webtext_df.html).alias("ext")
        )
        .toPandas()
    )
    assert (out["text"] == out["ext"]).all()
    oracle = webtext_pdf.copy()
    oracle["ext"] = oracle["html"].map(lambda b: extract_text(bytes(b)))
    assert (oracle["ext"] == oracle["text"]).all()


def test_lang_has_nulls_for_ffill(webtext_pdf):
    assert webtext_pdf["lang"].isna().any()
    assert webtext_pdf["lang"].notna().any()
