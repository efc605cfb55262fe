"""Operator-level dedup tests on synthetic corpora with PLANTED
duplicates — the driver tables contain none, so oracle parity alone
can't show the operators collapse anything. These pin the semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_go_streamer_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    shingles,
    with_minhash,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (3, "quick the brown fox jumps over the lazy dog near the river bank"),  # word-shuffled 1
    (4, "a completely different document about spark query planning and shuffles"),
    (5, "the quick brown fox jumps over the lazy dog near the river delta"),  # near dup of 1
    (6, "unrelated text with zero overlap whatsoever in any shingle at all"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_exact_dedup_collapses_exact_and_shuffled(spark):
    out = {
        r["doc_id"]: (r["canonical_id"], r["is_canonical"])
        for r in exact_dedup(_df(spark), "doc_id").collect()
    }
    # 1, 2 and 3 share a bag fingerprint (same word multiset/set)
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[3] == (1, False)
    assert out[4][1] and out[5][1] and out[6][1]


def test_minhash_finds_near_duplicates(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(_df(spark), "doc_id", min_intersection=2).collect()
    }
    # identical docs: jaccard 1.0 through the LSH path
    assert pairs[(1, 2)] == 1.0
    # near-dup (one word changed at the end): high but < 1
    assert (1, 5) in pairs and 0.5 < pairs[(1, 5)] < 1.0
    # the unrelated doc pairs with nothing
    assert not any(6 in p for p in pairs)


def test_shingle_construction(spark):
    df = spark.createDataFrame([(1, "a b c d")], "id int, text string")
    got = df.select(shingles(F.col("text")).alias("sh")).collect()[0]["sh"]
    assert sorted(got) == ["a b c", "b c d"]
    # short doc -> whole text as single shingle
    df2 = spark.createDataFrame([(1, "a b")], "id int, text string")
    got2 = df2.select(shingles(F.col("text")).alias("sh")).collect()[0]["sh"]
    assert got2 == ["a b"]


def test_minhash_signature_identical_for_identical_docs(spark):
    sigs = with_minhash(_df(spark), "text").select("doc_id", "sig0", "sig1").collect()
    by_id = {r["doc_id"]: (r["sig0"], r["sig1"]) for r in sigs}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[6]
