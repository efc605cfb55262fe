"""Similarity-search queries over ``embeddings`` — brute-force cosine
top-k baseline, LSH-bucketed candidate generation, and within-cell
near-duplicate pairs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round

from kafka_go_streamer_spark.functions.vectors import cosine, cosine_sql
from kafka_go_streamer_spark.operators.similarity import (
    hyperplanes,
    lsh_signature,
    lsh_signature_sql,
)
from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.sources.tables import load_table

N_PLANES = 8
EMB_DIM = 64
PLANES = hyperplanes(N_PLANES, EMB_DIM)
_SIG_SQL = lsh_signature_sql("embedding", PLANES)


@query(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           round({cosine_sql('e.embedding', 'q.qv')}, 6) AS cos_sim
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> 0
    ORDER BY cos_sim DESC, e.vec_id ASC
    LIMIT 10
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors of vec_id=0.

    Scale: the query vector joins as a broadcast single row; cosine is a
    codegen'd projection over a linear scan; ORDER BY+LIMIT compiles to
    TakeOrderedAndProject (per-partition heap, no global sort)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            stable_round(cosine(F.col("embedding"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@query(
    "sim_lsh_bucket_pairs",
    oracle=f"""
    WITH sigs AS (
      SELECT vec_id, label, embedding, {_SIG_SQL} AS sig FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.sig,
           round({cosine_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
    FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id
    """,
)
def sim_lsh_bucket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN candidate generation via random-hyperplane LSH: 8-bit
    signatures, equi-join on the bucket key, cosine scored only inside
    buckets.

    Scale: all-pairs work is bounded per bucket (expected n/2^H docs per
    bucket); the join is an ordinary shuffle join on a LONG key, so the
    plan survives arbitrarily large corpora — brute force doesn't."""
    emb = load_table(spark, sf_dir, "embeddings")
    sigs = emb.select(
        "vec_id", "label", "embedding", lsh_signature(F.col("embedding"), PLANES).alias("sig")
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.sig")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.sig").alias("sig"),
            stable_round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6).alias(
                "cos_sim"
            ),
        )
    )


@query(
    "sim_neardup_within_label",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
           round({cosine_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {cosine_sql('a.embedding', 'b.embedding')} > 0.30
    """,
)
def sim_neardup_within_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by the label column
    (the IVF-cell pattern: pairwise comparison only within a cell)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a, b = emb.alias("a"), emb.alias("b")
    cos = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos > 0.30)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.label").alias("label"),
            stable_round(cos, 6).alias("cos_sim"),
        )
    )


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    s AS (
      SELECT vec_id, emb,
             list_aggregate(emb, 'min') AS mn,
             list_aggregate(emb, 'max') AS mx
      FROM e
    )
    SELECT vec_id,
           (generate_subscripts(emb, 1) - 1)::INTEGER AS pos,
           CASE WHEN mx > mn
                THEN CAST(floor((unnest(emb) - mn) * 255.0 / (mx - mn) + 0.5)
                          AS INTEGER)
                ELSE 0 END AS q
    FROM s
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector min-max int8 quantization — the storage-scale path
    for embedding corpora (4× smaller than float32, enough resolution
    for ANN candidate generation; full-precision re-rank happens on the
    shortlist only).

    Scale: narrow projection — per-row min/max then one posexplode; no
    shuffle, no UDF. Quantized value uses floor(x + 0.5), not round():
    floor on identical IEEE doubles is bit-stable across engines while
    round() ties are not."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    ).select(
        "vec_id",
        "emb",
        F.array_min("emb").alias("mn"),
        F.array_max("emb").alias("mx"),
    )
    ex = e.select(
        "vec_id", "mn", "mx", F.posexplode("emb").alias("pos", "v")
    )
    return ex.select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        F.when(
            F.col("mx") > F.col("mn"),
            F.floor(
                (F.col("v") - F.col("mn")) * 255.0 / (F.col("mx") - F.col("mn"))
                + 0.5
            ).cast("int"),
        )
        .otherwise(0)
        .alias("q"),
    )


@query(
    "sim_topk_multi_query",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS qv
      FROM embeddings WHERE vec_id % 100 = 0
    ),
    scored AS (
      SELECT q.q_id, e.vec_id, e.label,
             round({cosine_sql('e.embedding', 'q.qv')}, 6) AS cos_sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.q_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC
      ) AS rn
      FROM scored
    )
    SELECT q_id, vec_id, label, cos_sim FROM ranked WHERE rn <= 3
    """,
)
def sim_topk_multi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched brute-force ANN: top-3 cosine neighbors for EVERY query
    vector in a query set (here: vec_id % 100 == 0) in one pass — the
    retrieval-evaluation shape (a benchmark query file scored against
    the whole corpus).

    Scale: the query set broadcasts (k rows), so the corpus is scanned
    ONCE and each partition scores its rows against all k queries
    locally — n·k work with no corpus shuffle; per-query top-3 is a
    window over k partitions of the scored stream. The window ordering
    uses the ROUNDED cosine so cross-engine rank ties are exact."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "label",
            stable_round(cosine(F.col("embedding"), F.col("qv")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id", "label", "cos_sim")
    )
