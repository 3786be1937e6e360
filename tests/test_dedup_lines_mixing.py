"""dedup_lines (corpus-wide first-occurrence segment dedup) and
apply_mixing (mixing-table materialization) — crafted-case exactness
plus partitioning invariance, the two properties the 100 TB run relies
on."""

import hashlib
import math

from pyspark.sql import functions as F

from ballet_spark.operators.dedup import dedup_lines
from ballet_spark.operators.packing import (
    apply_mixing,
    hash_fraction,
    mixing_weights,
)


def _rows(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_dedup_lines_crafted(spark):
    rows = [
        (1, "a\nb\na"),  # within-doc repeat: second 'a' removed
        (2, "b\nc"),  # 'b' first seen at (1,1): removed here
        (3, "a\nb"),  # everything already seen: cleaned to ''
        (4, ""),  # empty doc survives with 0 removed
        (5, "d"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _rows(dedup_lines(df))
    assert out[1]["text"] == "a\nb" and out[1]["n_removed"] == 1
    assert out[2]["text"] == "c" and out[2]["n_removed"] == 1
    assert out[3]["text"] == "" and out[3]["n_removed"] == 2
    assert out[4]["text"] == "" and out[4]["n_removed"] == 0
    assert out[5]["text"] == "d" and out[5]["n_removed"] == 0
    assert len(out) == len(rows)


def test_dedup_lines_keeps_columns_and_out_col(spark):
    df = spark.createDataFrame(
        [(1, "x\ny", "en"), (2, "y\nz", "de")],
        "doc_id long, text string, lang string",
    )
    out = dedup_lines(df, out_col="cleaned")
    assert out.columns == ["doc_id", "text", "lang", "cleaned", "n_removed"]
    got = _rows(out)
    assert got[2]["text"] == "y\nz"  # original untouched
    assert got[2]["cleaned"] == "z" and got[2]["n_removed"] == 1
    assert got[1]["lang"] == "en"


def test_dedup_lines_partitioning_invariant(spark):
    rows = [(i, " ".join(["seg%d" % (j % 7) for j in range(i % 5 + 1)]).replace(" ", "\n")) for i in range(1, 60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, dedup_lines(df).collect()))
    b = sorted(map(tuple, dedup_lines(df.repartition(13)).collect()))
    assert a == b
    # global invariant: every distinct segment survives exactly once
    kept = (
        dedup_lines(df)
        .select(F.explode(F.split("text", "\n")).alias("s"))
        .filter(F.col("s") != "")
        .groupBy("s")
        .count()
        .collect()
    )
    assert kept and all(r["count"] == 1 for r in kept)


def _u(key, salt="mix"):
    h = hashlib.md5((salt + ("" if key is None else str(key))).encode())
    return int(h.hexdigest()[:13], 16) / float(1 << 52)


def test_hash_fraction_matches_python_and_null(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (None,)], "doc_id long"
    ).select("doc_id", hash_fraction("doc_id", "mix").alias("u"))
    for r in df.collect():
        assert r["u"] == _u(r["doc_id"])
        assert 0.0 <= r["u"] < 1.0


def test_apply_mixing_copy_semantics(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(200)],
        "doc_id long, lang string",
    )
    wts = spark.createDataFrame(
        [("en", 0.5), ("de", 2.25), ("fr", 9.0)], "grp string, weight double"
    )
    out = apply_mixing(docs, wts).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(200):
        w = 0.5 if i % 2 == 0 else 2.25
        u = _u(i)
        n = math.floor(w) + (1 if u < w - math.floor(w) else 0)
        got = by_doc.get(i, [])
        assert len(got) == n, (i, w, u, n, len(got))
        if n:
            assert sorted(r["copy_id"] for r in got) == list(range(1, n + 1))
            assert all(r["n_copies"] == n and r["weight"] == w for r in got)
    # every de doc gets at least its 2 integer epochs
    assert all(len(by_doc.get(i, [])) >= 2 for i in range(1, 200, 2))


def test_apply_mixing_drops_unconfigured_groups(spark):
    docs = spark.createDataFrame(
        [(1, "en"), (2, "zz")], "doc_id long, lang string"
    )
    wts = spark.createDataFrame([("en", 1.0)], "grp string, weight double")
    out = apply_mixing(docs, wts).collect()
    assert {r["lang"] for r in out} == {"en"}


def test_apply_mixing_composes_with_mixing_weights(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 4 else "de", "w " * (i % 9 + 1)) for i in range(1, 120)],
        "doc_id long, lang string, text string",
    )
    wts = mixing_weights(docs, {"en": 0.5, "de": 0.5}, by="lang")
    out = apply_mixing(docs.select("doc_id", "lang"), wts, by="lang")
    # deterministic: same result on any partitioning
    a = sorted(map(tuple, out.collect()))
    b = sorted(
        map(
            tuple,
            apply_mixing(
                docs.select("doc_id", "lang").repartition(7), wts, by="lang"
            ).collect(),
        )
    )
    assert a == b and a
