"""Deduplication queries over ``documents`` — thin registrations over
``operators/dedup.py`` (same module emits both the Spark plan and the
DuckDB oracle SQL)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.functions.text import (
    fingerprint,
    fingerprint_sql,
    words_sql,
)
from kafka_go_streamer_spark.operators.dedup import (
    MAX_BUCKET,
    cap_bucket,
    exact_dedup,
    exact_dedup_sql,
    minhash_lsh_pairs,
    minhash_lsh_pairs_sql,
    shingles_sql,
    simhash64_sql,
    simhash64_table,
    simhash_sql,
    simhash_table,
)
from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.sources.tables import load_table


@query(
    "dedup_exact_hash",
    oracle=f"""
    SELECT {fingerprint_sql('text')} AS fp,
           min(doc_id) AS canonical_id,
           count(*)    AS group_size
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via md5-fingerprint hash-groupBy: one shuffle on the
    32-char fingerprint, map-side combine, scales to any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


@query(
    "dedup_exact_assignment",
    oracle=exact_dedup_sql("documents", "doc_id", "text"),
)
def dedup_exact_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document canonical-id assignment under bag-normalized
    fingerprinting (order-shuffled duplicates collapse too)."""
    return exact_dedup(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "dedup_minhash_lsh",
    oracle=minhash_lsh_pairs_sql("documents", "doc_id", "text", min_intersection=2),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs: MinHash signatures -> LSH band buckets ->
    candidate equi-join -> exact-Jaccard verification. The only pairwise
    work happens inside shared buckets — never across the full corpus."""
    return minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", min_intersection=2
    )


@query(
    "dedup_simhash",
    oracle=f"""
    WITH w0 AS (SELECT doc_id, {words_sql('text')} AS w FROM documents)
    SELECT doc_id, {simhash_sql('w')} AS simhash
    FROM w0
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signature per document: near-identical word sets land on
    near-identical 32-bit signatures; pair generation then buckets on
    signature bands (Hamming-LSH) instead of comparing all pairs."""
    d = load_table(spark, sf_dir, "documents")
    return simhash_table(d, "doc_id", "text")


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    SELECT id_a, id_b, jaccard FROM (
      {minhash_lsh_pairs_sql('documents', 'doc_id', 'text', min_intersection=3)}
    )
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (3-word shingle) Jaccard as the VERIFIER stage over
    MinHash-LSH candidate pairs.

    Round 1 blocked on the low-cardinality ``source`` column, which is
    O(n^2/k) within-block pair generation with small fixed k — quadratic
    at corpus scale. The scale-safe staging (the role this operator was
    always documented to play): LSH band buckets generate candidates
    (bounded per bucket, frequency-capped), exact n-gram Jaccard runs on
    candidates only; pairwise work never touches full blocks."""
    pairs = minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        min_intersection=3,
    )
    return pairs.select("id_a", "id_b", "jaccard")


@query(
    "dedup_winnowing_pairs",
    oracle=f"""
    WITH w0 AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3 THEN
               list_transform(range(1, len(w) - 1),
                              i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
             ELSE []::VARCHAR[] END AS gh
      FROM w0
    ),
    wi AS (
      SELECT doc_id,
             CASE WHEN len(gh) >= 4 THEN
               list_transform(range(1, len(gh) - 2),
                              j -> list_aggregate(gh[j:j+3], 'min'))
             ELSE []::VARCHAR[] END AS wins
      FROM g
    ),
    fp0 AS (SELECT DISTINCT doc_id, unnest(list_distinct(wins)) AS f FROM wi),
    fp AS (
      SELECT doc_id, f FROM (
        SELECT *, count(*) OVER (PARTITION BY f) AS _bucket_n FROM fp0
      ) WHERE _bucket_n <= {MAX_BUCKET}
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
    FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
)
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate candidate pairs by winnowing-fingerprint overlap:
    docs sharing >= 2 winnowing fingerprints (any shared word run of
    >= w+k-1 words guarantees a shared fingerprint, so overlapping
    passages — not just identical documents — surface).

    Scale: fingerprints come from the RELATIONAL winnowing form (each
    k-gram hashed once — the array-expression form is O(words^2) under
    project collapse); fingerprint equality is the blocking key, exactly
    like MinHash bands — the self-join is an equi-join, never all-pairs;
    hot fingerprints (boilerplate) are frequency-capped at MAX_BUCKET
    before the join so no single bucket can go quadratic."""
    from kafka_go_streamer_spark.functions.text import winnow_fingerprint_rows

    d = load_table(spark, sf_dir, "documents")
    fp = cap_bucket(
        winnow_fingerprint_rows(d).withColumnRenamed("fingerprint", "f"),
        "f",
    )
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.f") == F.col("b.f"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


@query(
    "dedup_minhash_lsh_strict",
    oracle=minhash_lsh_pairs_sql(
        "documents", "doc_id", "text", min_intersection=2, band_r=2
    ),
)
def dedup_minhash_lsh_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-threshold MinHash-LSH: bands of r=2 concatenated minhashes
    (b=2, r=2 over the same 4 signatures) — a candidate must agree on
    BOTH hashes of a band, steepening the probability curve
    (1-(1-j^2)^2) so low-similarity pairs never reach the verify
    stage. The production knob for "only near-identical documents"
    dedup; the r=1 sibling (`dedup_minhash_lsh`) is the recall mode.

    Scale shape identical to the r=1 form: band rows are b x docs
    (HALVED vs r=1), the bucket equi-join sees longer keys and
    strictly smaller buckets."""
    return minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        min_intersection=2,
        band_r=2,
    )


@query(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH w0 AS (SELECT doc_id, {words_sql('text')} AS w FROM documents),
    sigs AS (SELECT doc_id, {simhash_sql('w')} AS sh FROM w0),
    bands AS (
      SELECT doc_id, sh, b.band, (sh >> (b.band * 8)) & 255 AS key
      FROM sigs, (SELECT unnest(range(0, 4)) AS band) b
    ),
    capped AS (
      SELECT doc_id, sh, band, key FROM (
        SELECT *, count(*) OVER (PARTITION BY band, key) AS _bucket_n
        FROM bands
      ) WHERE _bucket_n <= 64
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.sh AS sh_a, b.sh AS sh_b
      FROM capped a JOIN capped b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           bit_count(xor(sh_a, sh_b))::INTEGER AS hamming
    FROM cand
    WHERE bit_count(xor(sh_a, sh_b)) <= 6
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate PAIRS via Hamming-LSH banding — the pair
    stage the signature query feeds: the 32-bit signature splits into
    four 8-bit bands; docs agreeing on any band become candidates
    (pigeonhole: any pair within Hamming distance 3 shares a band —
    this threshold of 6 trades a little recall for bounded buckets),
    and the exact Hamming distance (xor + bit_count) verifies
    candidates only. No all-pairs anywhere; hot bands are
    frequency-capped like every other blocking key in the repo.

    Scale shape: one signature pass, 4x explode, equi-join on
    (band, 8-bit key), verify on candidates — identical discipline to
    the MinHash path; bit_count(xor()) is a codegen'd integer op."""
    d = load_table(spark, sf_dir, "documents")
    sigs = simhash_table(d, "doc_id", "text").localCheckpoint(eager=True)
    bands = sigs.select(
        "doc_id",
        F.col("simhash").alias("sh"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * 8)
                        .bitwiseAND(F.lit(255))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sh", "bk.band", "bk.key")
    from kafka_go_streamer_spark.operators.dedup import cap_bucket

    capped = cap_bucket(bands, "band", "key", cap=64)
    a, b = capped.alias("a"), capped.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= 6)
    )


@query(
    "dedup_simhash64_pairs",
    oracle=f"""
    WITH w0 AS (SELECT doc_id, {words_sql('text')} AS w FROM documents),
    sigs AS (SELECT doc_id, {simhash64_sql('w')} AS sh FROM w0),
    bands AS (
      SELECT doc_id, sh, b.band, (sh >> (b.band * 8)) & 255 AS key
      FROM sigs, (SELECT unnest(range(0, 8)) AS band) b
    ),
    capped AS (
      SELECT doc_id, sh, band, key FROM (
        SELECT *, count(*) OVER (PARTITION BY band, key) AS _bucket_n
        FROM bands
      ) WHERE _bucket_n <= 64
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.sh AS sh_a, b.sh AS sh_b
      FROM capped a JOIN capped b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           bit_count(xor(sh_a, sh_b))::INTEGER AS hamming
    FROM cand
    WHERE bit_count(xor(sh_a, sh_b)) <= 7
    """,
)
def dedup_simhash64_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-duplicate pairs — the production-width form
    of ``dedup_simhash_pairs``. 32-bit signatures saturate at corpus
    scale (birthday collisions at ~2^16 docs make every 8-bit band hot,
    and the frequency cap then drops REAL near-dups); 64 bits keep band
    occupancy sparse out to ~2^32 docs. Eight 8-bit bands make the
    banding pigeonhole-COMPLETE for the verify threshold: any pair
    within Hamming distance 7 must agree on at least one band, so the
    candidate stage provably loses nothing the verifier would keep.

    Scale shape identical to the 32-bit path: one signature pass
    (each word md5-hashed once, two independent 32-bit halves), 8x
    band explode, equi-join on (band, 8-bit key), frequency-capped
    buckets, xor+bit_count verification on candidates only. The band
    key is extracted as ``(sh >> 8b) & 255`` — mask-after-shift reads
    identically under Spark's and DuckDB's arithmetic BIGINT shifts,
    including the sign-bit band."""
    d = load_table(spark, sf_dir, "documents")
    sigs = simhash64_table(d, "doc_id", "text").localCheckpoint(eager=True)
    bands = sigs.select(
        "doc_id",
        F.col("simhash64").alias("sh"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash64"), b * 8)
                        .bitwiseAND(F.lit(255))
                        .alias("key"),
                    )
                    for b in range(8)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sh", "bk.band", "bk.key")
    capped = cap_bucket(bands, "band", "key", cap=64)
    a, b = capped.alias("a"), capped.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= 7)
    )


@query(
    "dedup_greedy_drop_rule",
    oracle=f"""
    WITH pairs AS (
      {minhash_lsh_pairs_sql("documents", "doc_id", "text",
                             min_intersection=2)}
    )
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT id_b FROM pairs)
    """,
)
def dedup_greedy_drop_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivors under the monotone near-dup drop rule: a doc drops iff
    it has a verified near-dup neighbor with a smaller id — including
    dropped neighbors (a near-dup of spam is spam). This is the batch
    twin of the STREAMING near-dup dedup (streaming/neardup.py), and
    its monotonicity is what makes the incremental answer equal this
    one at any micro-batching; contrast with
    ``dedup_connected_components`` + ``dedup_cluster_manifest``, which
    keep one doc per transitive CLUSTER instead.

    Scale: candidate pairs come from the frequency-capped MinHash band
    join (never all-pairs); the rule itself is one anti-join of the
    corpus against the distinct larger-side ids."""
    from kafka_go_streamer_spark.streaming.neardup import batch_drop_rule

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", min_intersection=2)
    return batch_drop_rule(docs.select("doc_id"), pairs)


#: Duplicated-span parameters: span length in words (the scaled-down
#: analogue of the "50 consecutive tokens seen elsewhere" rule from
#: Lee et al. 2022, "Deduplicating Training Data Makes Language Models
#: Better") — frozen so the SQL twin reproduces spans exactly.
SPAN_WORDS = 8


@query(
    "dedup_substring_spans",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {words_sql('text')} AS ws FROM documents
    ),
    spans AS (
      SELECT doc_id,
             ('0x' || substr(md5(array_to_string(
               list_slice(ws, i, i + {SPAN_WORDS - 1}), ' ')), 1, 15)
             )::BIGINT AS span_h
      FROM w, unnest(range(1, greatest(len(ws) - {SPAN_WORDS - 1}, 0) + 1))
           AS t(i)
    ),
    stats AS (
      SELECT span_h, count(DISTINCT doc_id) AS n_docs
      FROM spans GROUP BY span_h
    ),
    per_doc AS (
      SELECT s.doc_id,
             count(*) AS n_spans,
             sum(CASE WHEN st.n_docs >= 2 THEN 1 ELSE 0 END) AS n_dup_spans
      FROM spans s JOIN stats st USING (span_h)
      GROUP BY s.doc_id
    )
    SELECT d.doc_id,
           coalesce(p.n_spans, 0)::BIGINT     AS n_spans,
           coalesce(p.n_dup_spans, 0)::BIGINT AS n_dup_spans,
           round(coalesce(p.n_dup_spans, 0) * 1.0
                 / greatest(coalesce(p.n_spans, 0), 1), 4) AS dup_ratio
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-SPAN detection — the substring-level
    dedup signal (suffix-array dedup's distributed approximation): for
    every consecutive SPAN_WORDS-word span, find spans occurring in >= 2
    distinct documents and report each document's duplicated-span count
    and coverage ratio. Catches partial overlap (quoted paragraphs,
    boilerplate headers) that whole-document and bag fingerprints miss.

    Scale shape: spans are built RELATIONALLY — posexplode words once,
    assemble each span with lead() over (doc_id, pos), hash each span
    ONCE — the same O(words) form as winnow_fingerprint_rows (the
    in-row transform spelling re-evaluates the words array per element
    under Catalyst project-collapse: measured ~10x slower at sf0.1).
    Per-span stats are ONE hash aggregate on a 60-bit integer span
    hash (8-byte shuffle keys, not 32-char hex strings) with map-side
    combine; the stats join back is hash-on-hash with 1:1 fan — doc
    pairs are never materialized, so there is no quadratic blow-up no
    matter how hot a span is; the window, the per-doc rollup, and the
    final left join all share the doc_id key.
    """
    from kafka_go_streamer_spark.functions.text import words
    from kafka_go_streamer_spark.operators.iterate import pinned
    from kafka_go_streamer_spark.sources.tables import fan_out

    k = SPAN_WORDS
    d = load_table(spark, sf_dir, "documents")
    # spans via the BOUND-column in-row array form (words bound in its
    # own projection, span hashes built over the bound attribute): each
    # span hashed once, zero pre-aggregation shuffles — replaces the
    # posexplode + lead() window spelling, which paid a doc_id exchange
    # and a WindowExec over the token rows. (The UNBOUND in-row
    # spelling stays the documented ~10x project-collapse trap.)
    # Pinned because stats and the per-doc rollup both consume it.
    w0 = fan_out(d).select("doc_id", words(F.col("text")).alias("_w"))
    n = F.size(F.col("_w"))
    mk = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            " ",
                            *[
                                F.element_at(F.col("_w"), i + j + 1)
                                for j in range(k)
                            ],
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    spans = pinned(
        w0.select("doc_id", F.explode(mk).alias("span_h"))
    )
    stats = spans.groupBy("span_h").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    per_doc = (
        spans.join(stats, "span_h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("n_docs") >= 2).cast("long")).alias("n_dup_spans"),
        )
    )
    return d.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        stable_round(
            F.coalesce("n_dup_spans", F.lit(0))
            / F.greatest(F.coalesce("n_spans", F.lit(0)), F.lit(1)),
            4,
        ).alias("dup_ratio"),
    )


#: Jaccard threshold the pipeline considers a true near-duplicate
#: (the eval measures recall of the banded LSH pipeline against
#: frequency-capped exact ground truth at this threshold).
LSH_EVAL_TAU = 0.5


@query(
    "dedup_lsh_recall_eval",
    oracle=f"""
    WITH w0 AS (SELECT doc_id, {words_sql('text')} AS w FROM documents),
    docs AS (SELECT doc_id, {shingles_sql('w')} AS sh FROM w0),
    ex0 AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    ex AS (
      SELECT doc_id, s FROM (
        SELECT *, count(*) OVER (PARTITION BY s) AS _bucket_n FROM ex0
      ) WHERE _bucket_n <= {MAX_BUCKET}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
    ),
    truth AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN docs da ON c.id_a = da.doc_id
      JOIN docs db ON c.id_b = db.doc_id
      WHERE len(list_filter(da.sh, x -> list_contains(db.sh, x))) * 1.0
            / (len(da.sh) + len(db.sh)
               - len(list_filter(da.sh, x -> list_contains(db.sh, x))))
            >= {LSH_EVAL_TAU}
    ),
    pred AS (
      SELECT id_a, id_b FROM (
        {{pairs_sql}}
      ) WHERE jaccard >= {LSH_EVAL_TAU}
    ),
    hit AS (SELECT * FROM pred INTERSECT SELECT * FROM truth)
    SELECT (SELECT count(*) FROM truth)::BIGINT AS n_truth,
           (SELECT count(*) FROM hit)::BIGINT   AS n_found,
           round((SELECT count(*) FROM hit) * 1.0
                 / greatest((SELECT count(*) FROM truth), 1), 4) AS recall
    """.replace(
        "{pairs_sql}",
        minhash_lsh_pairs_sql(
            "documents", "doc_id", "text", min_intersection=1
        ),
    ),
)
def dedup_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall evaluation for the MinHash-LSH dedup family — the dedup
    analogue of ``ann_recall_multiprobe``: compare the pairs the
    banded LSH pipeline surfaces (and exact-verifies at tau) against
    exact-Jaccard-above-tau ground truth, and report the recall the
    banding trades for its bounded candidate generation.

    Ground truth at scale cannot be all-pairs; it uses the SAME
    bounded shape as production candidate generation — a shingle
    equi-join with the standard MAX_BUCKET frequency cap (a pair
    missing from capped truth would need EVERY shared shingle hotter
    than the cap, which a tau>=0.5 pair — sharing most of both
    documents' shingles — cannot). Exact Jaccard then runs on the
    candidates' FULL shingle sets; recall counts predicted∩truth over
    truth. Two count aggregates + a division finish the job."""
    from kafka_go_streamer_spark.operators.dedup import shingles_of
    from kafka_go_streamer_spark.functions.text import words

    docs = load_table(spark, sf_dir, "documents")
    # bind the words split in its own projection: inlining it into the
    # shingle transform re-splits per element (see shingle_stream_of)
    sh = docs.select("doc_id", words(F.col("text")).alias("_w")).select(
        "doc_id", shingles_of(F.col("_w")).alias("sh")
    )
    ex = cap_bucket(
        sh.select("doc_id", F.explode("sh").alias("s")), "s"
    )
    a, b = ex.alias("a"), ex.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    truth = (
        cand.join(sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sa")), "id_a")
        .join(sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sb")), "id_b")
        .filter(
            inter / (F.size("sa") + F.size("sb") - inter) >= LSH_EVAL_TAU
        )
        .select("id_a", "id_b")
    )
    pred = (
        minhash_lsh_pairs(docs, "doc_id", "text", min_intersection=1)
        .filter(F.col("jaccard") >= LSH_EVAL_TAU)
        .select("id_a", "id_b")
    )
    hit = pred.join(truth, ["id_a", "id_b"])
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    nf = hit.agg(F.count(F.lit(1)).alias("n_found"))
    return (
        nt.crossJoin(F.broadcast(nf))
        .select(
            "n_truth",
            "n_found",
            stable_round(
                F.col("n_found") / F.greatest(F.col("n_truth"), F.lit(1)), 4
            ).alias("recall"),
        )
    )


#: Edit-distance ceiling for the fuzzy name-match pairs.
FUZZY_MAX_DIST = 2


@query(
    "dedup_names_levenshtein",
    oracle=f"""
    WITH names AS (
      SELECT p_name, split_part(p_name, ' ', -1) AS blk,
             count(*) AS n_parts
      FROM part GROUP BY 1, 2
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist,
           a.n_parts AS n_a, b.n_parts AS n_b
    FROM names a JOIN names b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
    """,
)
def dedup_names_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution on part names: pairs of DISTINCT names
    within edit distance 2, blocked by the name's last word, each pair
    carrying how many catalog rows it would merge — the typo/variant
    detection step of master-data matching ('cold rod' vs 'old rod').

    Scale: the pairwise stage runs on the DISTINCT-NAME table (the
    vocabulary, orders of magnitude smaller than the catalog), never
    on rows; the catalog itself is touched only by the one
    count-per-name aggregate. Blocking on the trailing word bounds
    each quadratic bucket to names sharing a head noun — the same
    block-then-verify discipline as every LSH family here, with
    levenshtein as the verifier. At a vocabulary where a block goes
    hot the MAX_BUCKET cap composes in front of the join unchanged."""
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy(
        F.col("p_name"),
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("blk"),
    ).agg(F.count(F.lit(1)).alias("n_parts"))
    a, b = names.alias("a"), names.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(dist <= FUZZY_MAX_DIST)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.alias("dist"),
            F.col("a.n_parts").alias("n_a"),
            F.col("b.n_parts").alias("n_b"),
        )
    )


#: Containment floor for the winnowing containment report.
CONTAIN_MIN = 0.6


@query(
    "dedup_winnow_containment",
    oracle=f"""
    WITH w0 AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3 THEN
               list_transform(range(1, len(w) - 1),
                              i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
             ELSE []::VARCHAR[] END AS gh
      FROM w0
    ),
    wi AS (
      SELECT doc_id,
             CASE WHEN len(gh) >= 4 THEN
               list_transform(range(1, len(gh) - 2),
                              j -> list_aggregate(gh[j:j+3], 'min'))
             ELSE []::VARCHAR[] END AS wins
      FROM g
    ),
    fp0 AS (SELECT DISTINCT doc_id, unnest(list_distinct(wins)) AS f FROM wi),
    fp AS (
      SELECT doc_id, f FROM (
        SELECT *, count(*) OVER (PARTITION BY f) AS _bucket_n FROM fp0
      ) WHERE _bucket_n <= {MAX_BUCKET}
    ),
    cnt AS (SELECT doc_id, count(*)::BIGINT AS nf FROM fp GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS n_shared
      FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*) >= 2
    )
    SELECT p.id_a, p.id_b, p.n_shared,
           ca.nf AS nf_a, cb.nf AS nf_b,
           round(p.n_shared * 1.0 / least(ca.nf, cb.nf), 4) AS containment,
           CASE WHEN ca.nf <= cb.nf THEN p.id_a ELSE p.id_b END
             AS contained_doc
    FROM pairs p
    JOIN cnt ca ON ca.doc_id = p.id_a
    JOIN cnt cb ON cb.doc_id = p.id_b
    WHERE round(p.n_shared * 1.0 / least(ca.nf, cb.nf), 4)
          >= {CONTAIN_MIN}
    """,
)
def dedup_winnow_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup detection — CONTAINMENT, not Jaccard: the
    share of the smaller document's winnowing fingerprints that the
    pair shares. Jaccard misses a short document wholly embedded in a
    long one (the union dilutes it); containment is exactly the MOSS
    measure for that case, and the dedup rule that catches
    quote-amplified or template-wrapped copies.

    Scale: identical blocking to ``dedup_winnowing_pairs`` (capped
    fingerprint equi-join — never all-pairs); the per-doc fingerprint
    counts are a doc-cardinality aggregate joined back onto the pair
    list, and the division/threshold run per candidate pair only.
    Counts are taken AFTER the hot-fingerprint cap so numerator and
    denominator live in the same universe."""
    from kafka_go_streamer_spark.functions.text import winnow_fingerprint_rows
    from kafka_go_streamer_spark.operators.iterate import pinned

    d = load_table(spark, sf_dir, "documents")
    fp = pinned(
        cap_bucket(
            winnow_fingerprint_rows(d).withColumnRenamed("fingerprint", "f"),
            "f",
        )
    )
    cnt = fp.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("nf"))
    a, b = fp.alias("a"), fp.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.f") == F.col("b.f"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    ca = cnt.select(F.col("doc_id").alias("id_a"), F.col("nf").alias("nf_a"))
    cb = cnt.select(F.col("doc_id").alias("id_b"), F.col("nf").alias("nf_b"))
    contain = stable_round(
        F.col("n_shared") * 1.0 / F.least(F.col("nf_a"), F.col("nf_b")), 4
    )
    return (
        pairs.join(ca, "id_a")
        .join(cb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            "nf_a",
            "nf_b",
            contain.alias("containment"),
            F.when(F.col("nf_a") <= F.col("nf_b"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("contained_doc"),
        )
        .filter(F.col("containment") >= CONTAIN_MIN)
    )


#: Incremental-ingest knobs: which tenth of doc ids plays the DELTA
#: batch, and the verified-Jaccard floor for a near-dup verdict.
DELTA_MOD, DELTA_REM = 10, 7
INGEST_NEAR_J = 0.5


def _incremental_ingest_oracle() -> str:
    from kafka_go_streamer_spark.operators.dedup import (
        NUM_HASHES,
        minhash_sig_sql,
    )

    sig_cols = ",\n           ".join(
        f"{minhash_sig_sql('sh', k)} AS sig{k}" for k in range(NUM_HASHES)
    )
    band_union = "\n      UNION ALL\n".join(
        f"      SELECT doc_id AS id, {j} AS band, sig{j} AS key FROM sigs"
        for j in range(NUM_HASHES)
    )
    inter = "len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))"
    return f"""
    WITH w0 AS (
      SELECT doc_id, md5(text) AS fp, {words_sql('text')} AS w,
             (doc_id % {DELTA_MOD} = {DELTA_REM}) AS is_delta
      FROM documents
    ),
    docs AS (
      SELECT doc_id, fp, is_delta, {shingles_sql('w')} AS sh FROM w0
    ),
    sigs AS (
      SELECT doc_id, fp, is_delta, sh,
           {sig_cols}
      FROM docs
    ),
    base_fp AS (
      SELECT fp, min(doc_id)::BIGINT AS exact_match
      FROM sigs WHERE NOT is_delta GROUP BY 1
    ),
    bands0 AS (
{band_union}
    ),
    bands AS (
      SELECT id, band, key FROM (
        SELECT *, count(*) OVER (PARTITION BY band, key) AS _bucket_n
        FROM bands0
      ) WHERE _bucket_n <= {MAX_BUCKET}
    ),
    cand AS (
      SELECT DISTINCT d.id AS delta_id, b.id AS base_id
      FROM bands d JOIN bands b
        ON d.band = b.band AND d.key = b.key
      WHERE d.id % {DELTA_MOD} = {DELTA_REM}
        AND b.id % {DELTA_MOD} <> {DELTA_REM}
    ),
    ver AS (
      SELECT c.delta_id, c.base_id,
             round({inter} * 1.0 /
                   (len(sa.sh) + len(sb.sh) - {inter}), 4) AS j
      FROM cand c
      JOIN sigs sa ON sa.doc_id = c.delta_id
      JOIN sigs sb ON sb.doc_id = c.base_id
      WHERE {inter} >= 2
    ),
    best AS (
      SELECT delta_id, base_id, j FROM (
        SELECT *, row_number() OVER (
          PARTITION BY delta_id ORDER BY j DESC, base_id ASC) AS rk
        FROM ver
      ) WHERE rk = 1
    )
    SELECT s.doc_id,
           CASE WHEN e.exact_match IS NOT NULL THEN 'exact_dup'
                WHEN b.j >= {INGEST_NEAR_J} THEN 'near_dup'
                ELSE 'new' END AS verdict,
           CASE WHEN e.exact_match IS NOT NULL THEN e.exact_match
                WHEN b.j >= {INGEST_NEAR_J} THEN b.base_id
           END AS match_id,
           CASE WHEN e.exact_match IS NULL AND b.j >= {INGEST_NEAR_J}
                THEN b.j END AS jaccard
    FROM sigs s
    LEFT JOIN base_fp e ON e.fp = s.fp
    LEFT JOIN best b ON b.delta_id = s.doc_id
    WHERE s.is_delta
    """


@query("pipeline_incremental_ingest", oracle=_incremental_ingest_oracle())
def pipeline_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL corpus ingestion: classify every document of a delta
    batch (one tenth of doc ids) against the EXISTING corpus —
    'exact_dup' (fingerprint already present, canonical base owner
    attached), 'near_dup' (best verified-Jaccard ≥ 0.5 base neighbor
    via MinHash bands), else 'new'. This is the decision a production
    pipeline makes on every arriving batch; the full-corpus re-dedup
    the other queries model is the bootstrap, this is the steady
    state.

    Scale: per-batch cost scales with the DELTA, not the corpus — the
    base side contributes a fingerprint table (hash equi-join) and a
    capped band table (equi-join on (band, key)), both of which a real
    deployment keeps MATERIALIZED between batches (exactly the role of
    the committed signature store in streaming/neardup.py — this query
    is its batch twin at the verdict level). Candidate verification
    touches band-matched pairs only; hot buckets are capped jointly
    across both sides so no boilerplate key can go quadratic; the
    best-match pick is a window over candidates."""
    from pyspark.sql import Window

    from kafka_go_streamer_spark.operators.dedup import (
        band_rows,
        jaccard,
        with_minhash,
    )
    from kafka_go_streamer_spark.operators.iterate import pinned

    d = load_table(spark, sf_dir, "documents")
    flagged = d.select(
        "doc_id",
        (F.col("doc_id") % DELTA_MOD == DELTA_REM).alias("is_delta"),
        F.md5("text").alias("fp"),
        "text",
    )
    sigs = pinned(with_minhash(flagged))
    base_fp = sigs.filter(~F.col("is_delta")).groupBy("fp").agg(
        F.min("doc_id").cast("long").alias("exact_match")
    )
    bands = cap_bucket(band_rows(sigs, "doc_id"), "band", "key")
    is_delta_id = F.col("id") % DELTA_MOD == DELTA_REM
    db = bands.filter(is_delta_id).select(
        F.col("id").alias("delta_id"), "band", "key"
    )
    bb = bands.filter(~is_delta_id).select(
        F.col("id").alias("base_id"), "band", "key"
    )
    cand = db.join(bb, ["band", "key"]).select("delta_id", "base_id").distinct()
    sh = sigs.select(F.col("doc_id").alias("sid"), "_shingles")
    inter = F.size(
        F.array_intersect(F.col("sa._shingles"), F.col("sb._shingles"))
    )
    ver = (
        cand.join(sh.alias("sa"), F.col("delta_id") == F.col("sa.sid"))
        .join(sh.alias("sb"), F.col("base_id") == F.col("sb.sid"))
        .filter(inter >= 2)
        .select(
            "delta_id",
            "base_id",
            stable_round(
                jaccard(F.col("sa._shingles"), F.col("sb._shingles")), 4
            ).alias("j"),
        )
    )
    w = Window.partitionBy("delta_id").orderBy(
        F.col("j").desc(), F.col("base_id").asc()
    )
    best = (
        ver.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("delta_id", "base_id", "j")
    )
    out = (
        sigs.filter(F.col("is_delta"))
        .select("doc_id", "fp")
        # NOT broadcast: the base fingerprint table is corpus-sized at
        # real scale — this is a keyed equi-join (AQE may still elect
        # to broadcast at toy sizes)
        .join(base_fp, "fp", "left")
        .join(
            best.withColumnRenamed("delta_id", "doc_id"), "doc_id", "left"
        )
    )
    near = F.col("exact_match").isNull() & (F.col("j") >= INGEST_NEAR_J)
    return out.select(
        "doc_id",
        F.when(F.col("exact_match").isNotNull(), "exact_dup")
        .when(near, "near_dup")
        .otherwise("new")
        .alias("verdict"),
        F.when(F.col("exact_match").isNotNull(), F.col("exact_match"))
        .when(near, F.col("base_id"))
        .alias("match_id"),
        F.when(near, F.col("j")).alias("jaccard"),
    )


def _source_dup_rate_oracle() -> str:
    from kafka_go_streamer_spark.plans.registry import ORACLES

    wpairs = ORACLES["dedup_winnowing_pairs"]
    return f"""
    WITH wpairs AS ({wpairs}),
    ends AS (
      SELECT id_a AS doc_id FROM wpairs
      UNION ALL
      SELECT id_b AS doc_id FROM wpairs
    ),
    per_doc AS (
      SELECT doc_id, count(*)::BIGINT AS n_edges FROM ends GROUP BY 1
    ),
    src AS (
      SELECT d.source,
             count(*)::BIGINT AS n_docs,
             sum(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0
                 END)::BIGINT AS n_dup_docs,
             coalesce(sum(p.n_edges), 0)::BIGINT AS n_edge_endpoints
      FROM documents d LEFT JOIN per_doc p USING (doc_id)
      GROUP BY 1
    )
    SELECT source, n_docs, n_dup_docs, n_edge_endpoints,
           round(n_dup_docs * 1.0 / n_docs, 6) AS dup_rate
    FROM src
    """


@query("quality_near_dup_rate_by_source", oracle=_source_dup_rate_oracle)
def quality_near_dup_rate_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-duplication exposure per source: for every crawl source,
    how many of its documents participate in at least one winnowing
    near-dup pair, the total pair endpoints it contributes, and the
    dup RATE — the curator's triage view ("which feed is flooding the
    corpus with boilerplate") that turns the pair list into a
    per-provenance quality score, the first thing checked before
    down-weighting or dropping a source.

    Scale: reuses the registered capped winnowing pairs (never
    all-pairs); endpoints collapse to a per-doc edge count
    (doc-cardinality), which LEFT-joins the documents table on its
    key — one equi-join plus a source-cardinality aggregate. The
    documents side never fans out: a doc in a million pairs costs one
    joined row carrying its count."""
    from kafka_go_streamer_spark.operators.iterate import pinned
    from kafka_go_streamer_spark.plans.registry import QUERIES as _Q

    pairs = pinned(_Q["dedup_winnowing_pairs"](spark, sf_dir))
    ends = pairs.select(F.col("id_a").alias("doc_id")).unionAll(
        pairs.select(F.col("id_b").alias("doc_id"))
    )
    per_doc = ends.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        d.join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("n_edges").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_dup_docs"),
            F.coalesce(F.sum("n_edges"), F.lit(0))
            .cast("long")
            .alias("n_edge_endpoints"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup_docs",
            "n_edge_endpoints",
            stable_round(
                F.col("n_dup_docs") * 1.0 / F.col("n_docs"), 6
            ).alias("dup_rate"),
        )
    )


def _dup_severity_oracle() -> str:
    from kafka_go_streamer_spark.plans.registry import ORACLES

    jac = ORACLES["dedup_ngram_jaccard"]
    return f"""
    WITH pairs AS ({jac})
    SELECT round(floor(jaccard * 10) / 10.0, 1) AS jaccard_bucket,
           count(*)::BIGINT AS n_pairs,
           round(avg(jaccard), 4) AS avg_jaccard
    FROM pairs GROUP BY 1 ORDER BY 1
    """


@query("dedup_severity_histogram", oracle=_dup_severity_oracle)
def dedup_severity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus duplication-severity profile: the verified n-gram-Jaccard
    candidate pairs histogrammed at 0.1 resolution — the one-glance
    answer to "is our duplication problem boilerplate fragments
    (mass at 0.3-0.5) or wholesale copies (mass at 0.9-1.0)?", which
    decides whether the dedup pipeline should drop documents or
    extract spans. Composes the verifier's own output, so the profile
    stays consistent with what the pipeline actually removes.

    Scale: everything above the histogram is the ngram-Jaccard
    subplan's already-audited candidate discipline (banded, capped,
    verify-on-candidates-only); the histogram itself collapses the
    pair list to ≤10 rows in one map-side-combinable pass. Jaccard is
    rounded to 4 upstream, so the floor-bucketing is deterministic on
    both engines."""
    from kafka_go_streamer_spark.plans.registry import QUERIES as _Q

    pairs = _Q["dedup_ngram_jaccard"](spark, sf_dir)
    return (
        pairs.groupBy(
            stable_round(
                F.floor(F.col("jaccard") * 10) / 10.0, 1
            ).alias("jaccard_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            stable_round(F.avg("jaccard"), 4).alias("avg_jaccard"),
        )
        .orderBy("jaccard_bucket")
    )
