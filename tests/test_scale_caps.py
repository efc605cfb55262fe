"""Scale-guard properties: hot-bucket frequency caps, corpus-adaptive
LSH sizing, and the relational winnowing form."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.text import (
    winnow_fingerprint_rows,
    winnow_fingerprints,
)
from kafka_go_streamer_spark.operators.dedup import (
    MAX_BUCKET,
    cap_bucket,
    minhash_lsh_pairs,
)
from kafka_go_streamer_spark.plans.similarity import (
    BAND_BITS_MAX,
    TARGET_BUCKET,
    _adaptive_bits,
)


def test_cap_bucket_drops_only_hot_buckets(spark):
    rows = [("hot", i) for i in range(MAX_BUCKET + 5)] + [
        ("cold", i) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "key string, id int")
    kept = cap_bucket(df, "key").groupBy("key").count().collect()
    out = {r["key"]: r["count"] for r in kept}
    assert "hot" not in out  # over-cap bucket dropped entirely
    assert out["cold"] == 3  # under-cap bucket untouched


def test_minhash_hot_bucket_never_pairs(spark):
    """100 documents sharing identical text would form one quadratic
    bucket (100*99/2 pairs); the frequency cap must drop it."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(MAX_BUCKET * 3)], "doc_id long, text string"
    )
    assert minhash_lsh_pairs(docs, "doc_id", "text").count() == 0


def test_minhash_under_cap_still_pairs(spark):
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(5)], "doc_id long, text string"
    )
    assert minhash_lsh_pairs(docs, "doc_id", "text").count() == 10  # C(5,2)


@pytest.mark.parametrize(
    "n,expected_bits",
    [
        (16, 2),  # clamp floor
        (256, 4),  # 256/16=16 -> log2=4 (exact power of two)
        (500, 5),
        (2000, 7),
        (4096, 8),
        (10**6, 16),  # 1M/16 -> log2 ~ 15.9 -> 16 (pool edge)
        (10**9, 16),  # clamp ceiling (pool limit)
    ],
)
def test_adaptive_bits(spark, n, expected_bits):
    got = (
        spark.range(1)
        .select(_adaptive_bits(F.lit(n)).alias("p"))
        .collect()[0]["p"]
    )
    assert got == expected_bits


def test_adaptive_occupancy_bounded(spark):
    """Expected bucket occupancy n/2^P must stay ~TARGET_BUCKET (within
    2x) until the plane pool clamps — the property a fixed plane count
    lacks (its occupancy grows linearly with n)."""
    for n in (32, 100, 500, 2000, 4000):
        p = (
            spark.range(1)
            .select(_adaptive_bits(F.lit(n)).alias("p"))
            .collect()[0]["p"]
        )
        occupancy = n / 2**p
        if p < BAND_BITS_MAX:
            assert occupancy <= 2 * TARGET_BUCKET, (n, p, occupancy)


def test_neardup_centroid_count_is_sqrt_n(spark, sf_dir):
    """The near-dup IVF assignment must score against ceil(sqrt(n))
    centroids — the fix for round 2's linear centroid growth (c = n/64
    made the broadcast unbounded and assignment O(n^2/64))."""
    import math

    from kafka_go_streamer_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    expect = math.ceil(math.sqrt(n))
    nc = emb.agg(
        F.ceil(F.sqrt(F.count(F.lit(1)))).alias("_c")
    ).collect()[0]["_c"]
    assert nc == expect
    # and the query's distinct cell ids stay within that bound
    from kafka_go_streamer_spark.plans.registry import QUERIES

    cells = (
        QUERIES["sim_neardup_ivf_cells"](spark, sf_dir)
        .select("cell")
        .distinct()
        .count()
    )
    assert cells <= expect


def test_trained_ivf_probe_touches_one_cell(spark, sf_dir):
    """ann_ivf_search_trained must return rows from exactly one cell
    (nprobe=1 over trained cells) and its k must be >> the 4 fixed
    seeds of the regression-anchor IVF queries."""
    import math

    from kafka_go_streamer_spark.plans.registry import QUERIES
    from kafka_go_streamer_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    assert math.ceil(math.sqrt(n)) > 4
    rows = QUERIES["ann_ivf_search_trained"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 5
    assert len({r["cell"] for r in rows}) == 1


def test_winnowing_rows_matches_array_form(spark):
    texts = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "one two three four five six seven eight nine ten eleven"),
        (4, "short text"),  # < k words -> no fingerprints
        (5, "exactly three words"),  # 1 gram < w windows -> none
        (6, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    old = {
        (r["doc_id"], r["f"])
        for r in df.select(
            "doc_id", F.explode(winnow_fingerprints(F.col("text"))).alias("f")
        )
        .distinct()
        .collect()
    }
    new = {
        (r["doc_id"], r["fingerprint"])
        for r in winnow_fingerprint_rows(df).collect()
    }
    assert old == new
    assert {1, 2, 3} == {d for d, _ in new}  # docs 4-6 too short


def test_winnowing_pairs_capped_plan_has_window_filter(spark, sf_dir):
    """The pair query must contain the frequency-cap window (bounded
    bucket size) and still no cartesian anywhere."""
    from kafka_go_streamer_spark.plans.registry import QUERIES

    df = QUERIES["dedup_winnowing_pairs"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the cap is a count window over the fingerprint key
    assert "count(1) windowspecdefinition" in plan or "Window" in plan


def test_pack_shard_groups_bounded(spark, sf_dir):
    """No pandas group reaching the packer's Arrow fold may exceed
    PACK_SHARD_SPAN rows — the executor-memory bound that lets a
    billion-doc source pack without one task materializing it all."""
    from kafka_go_streamer_spark.plans.registry import QUERIES
    from kafka_go_streamer_spark.plans.training_ops import PACK_SHARD_SPAN

    out = QUERIES["pack_sequences_greedy"](spark, sf_dir)
    mx = (
        out.groupBy("source", "shard")
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]["mx"]
    )
    assert mx is not None and mx <= PACK_SHARD_SPAN


def _const_embeddings(spark, n, dim=8):
    """n near-identical vectors: all land in one LSH bucket per band."""
    rows = [(i, [0.3] * (dim - 1) + [0.01]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_lsh_bucket_pairs_hot_bucket_capped(spark):
    """A single bucket holding 3x MAX_BUCKET identical vectors must be
    dropped before the collect — no pairs, no unbounded per-row array."""
    from kafka_go_streamer_spark.operators.dedup import MAX_BUCKET
    from kafka_go_streamer_spark.plans.similarity import lsh_bucket_pairs

    assert lsh_bucket_pairs(_const_embeddings(spark, MAX_BUCKET * 3)).count() == 0


def test_lsh_bucket_pairs_under_cap_still_pairs(spark):
    """Under the cap the same corpus pairs fully (C(5,2) = 10)."""
    from kafka_go_streamer_spark.plans.similarity import lsh_bucket_pairs

    assert lsh_bucket_pairs(_const_embeddings(spark, 5)).count() == 10


def test_embedding_drop_rule_cap_inactive_below_cap(spark, sf_dir, monkeypatch, tmp_path):
    """The rep cap is pure scale protection: wherever every cell fits
    under NEARDUP_MAX_CELL_REPS (true at the test scales), the capped
    drop rule must equal the uncapped one — the cap only prunes
    comparisons that a hot cell would otherwise explode."""
    monkeypatch.setenv("SPARK_GRAFT_IVF_DIR", str(tmp_path / "ivf"))
    from kafka_go_streamer_spark.plans.similarity import embedding_drop_rule

    capped = {
        (r["vec_id"], r["label"])
        for r in embedding_drop_rule(spark, sf_dir).collect()
    }
    uncapped = {
        (r["vec_id"], r["label"])
        for r in embedding_drop_rule(
            spark, sf_dir, max_reps=10**9
        ).collect()
    }
    assert capped == uncapped
    assert capped  # survivors exist
