"""Streaming NEAR-duplicate dedup: MinHash-LSH across micro-batches.

``dropDuplicatesWithinWatermark`` (exact keys) and the foreachBatch
fingerprint anti-join (tests/test_streaming_prep.py) handle EXACT
dedup incrementally; this module extends the same ingest pattern to
near-duplicates: each micro-batch's documents are signed with the
batch MinHash pipeline (operators/dedup.py), band-joined against the
COMMITTED signature store plus the batch itself, and verified with
exact shingle intersection — only survivors (and every doc's
signatures) commit.

Dedup rule (monotone, so streaming == batch regardless of batching):
a document is DROPPED iff it has a verified near-dup neighbor with a
smaller doc_id anywhere in the corpus-so-far — including neighbors
that were themselves dropped. Dropping against dropped docs is the
conservative production choice (a near-dup of spam is spam) and what
makes the rule single-pass: no recursive "is the smaller one kept?"
chain, hence no cross-batch iteration. With arrival ordered by doc_id
the streamed survivor set equals the batch rule "ids that never appear
as the larger side of a verified pair".

Scale shape: the signature STORE is the state — O(corpus) rows of
(id, 4 sigs, shingle set), the same table a batch MinHash dedup
materializes, read back per micro-batch as a band-keyed join (on a
real deployment: a Delta/Iceberg table partitioned by band key so the
per-batch probe prunes to matching buckets; here plain parquet). The
batch side explodes to 4 band rows per doc; candidates are equi-join
hits; only candidates deserialize shingle arrays for the verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_go_streamer_spark.operators.dedup import (
    band_rows,
    cap_bucket,
    with_minhash,
)

#: Minimum exact shingle intersection for a verified near-dup pair —
#: matches ``minhash_lsh_pairs(min_intersection=2)``.
MIN_INTERSECTION = 2


def sign_batch(bdf: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, _shingles, sig0..sigK) for one micro-batch of documents."""
    return with_minhash(bdf.select(F.col(id_col), F.col("text")))


def dropped_in_batch(
    batch_sigs: DataFrame, store_sigs: DataFrame | None, id_col: str = "doc_id"
) -> DataFrame:
    """ids of batch docs with a verified near-dup neighbor of smaller
    id in (committed store ∪ this batch). Returns a 1-column ``id``
    DataFrame.

    The band join produces candidates (via the SAME band construction
    and hot-bucket cap as the batch generator — ``band_rows`` +
    ``cap_bucket`` from operators/dedup.py); exact shingle intersection
    (≥ MIN_INTERSECTION) verifies them. The cap is evaluated over the
    corpus-SO-FAR: a band key whose bucket crosses MAX_BUCKET mid-
    stream stops generating candidates from that point on, while the
    batch twin (which sees final bucket sizes) drops the key entirely —
    so streamed == batch is exact when no bucket crosses the cap
    between a doc's arrival and end-of-stream, and conservative-greedy
    otherwise. That boundary is inherent to any incremental use of a
    frequency cap; production deployments tombstone a key when it
    crosses the cap, which re-aligns future batches."""
    pool = (
        batch_sigs
        if store_sigs is None
        else store_sigs.unionByName(batch_sigs)
    )
    pool_bands = cap_bucket(band_rows(pool, id_col), "band", "key")
    batch_bands = band_rows(batch_sigs, id_col)
    cand = (
        pool_bands.alias("a")
        .join(
            batch_bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh_pool = pool.select(F.col(id_col).alias("id"), "_shingles")
    sh_batch = batch_sigs.select(F.col(id_col).alias("id"), "_shingles")
    verified = (
        cand.join(
            sh_pool.select(
                F.col("id").alias("id_a"), F.col("_shingles").alias("_sa")
            ),
            "id_a",
        )
        .join(
            sh_batch.select(
                F.col("id").alias("id_b"), F.col("_shingles").alias("_sb")
            ),
            "id_b",
        )
        .filter(
            F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
            >= MIN_INTERSECTION
        )
    )
    return verified.select(F.col("id_b").alias("id")).distinct()


def batch_drop_rule(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """The batch twin of the streaming rule: given verified pairs
    (id_a < id_b), survivors are all docs whose id never appears as
    the larger side."""
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return docs.join(dropped, "doc_id", "left_anti")
