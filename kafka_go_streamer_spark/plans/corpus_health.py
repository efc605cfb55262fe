"""Round-11 wave 3: corpus-health diagnostics — dedup threshold
tuning, lexical-richness gates, vocabulary drift, concentration
trends, tail-index estimation, ANN hubness, and spectral
forecastability.

North-star surface beyond the reference router (/root/reference/
main.go): the numbers a data-engineering team reads BEFORE turning the
curation knobs — "which Jaccard threshold should dedup drop at"
(threshold sweep over verified candidate pairs), "is a source full of
OCR garbage or boilerplate" (hapax rate, mean word rank), "did the
vocabulary drift between corpus halves" (IDF stability), "is activity
concentration trending" (weekly Gini), "how heavy is the user-activity
tail really" (Hill index), "will the ANN index suffer hub vectors"
(k-occurrence skew), and "is this series forecastable at all"
(spectral entropy).

Scale discipline: pairwise work only ever on capped LSH candidates;
vocabulary frames after one exploded scan; global rank windows only on
vocabulary-bounded frames; moment/tail statistics from exact integer
sums promoted to double INSIDE the fold on both engines (the r11
Kruskal-Wallis overflow rule); scalar corpus statistics as 1-row
broadcast binds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions import text as X
from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.sources.tables import fan_out, load_table

#: Dedup-drop thresholds swept over the verified candidate pairs.
SWEEP_THRESHOLDS = (0.5, 0.7, 0.8, 0.9)
#: IDF-stability: a word must reach this document frequency in BOTH
#: corpus halves to enter the comparison (rarer words' IDF is noise).
IDF_MIN_DF = 3
#: Hill estimator: tail size = max(HILL_MIN, n_users // HILL_FRAC_DEN).
HILL_MIN = 10
HILL_FRAC_DEN = 10
#: Hubness: sampled query panel (every 10th vector, CAPPED at a fixed
#: panel size so the probe stays O(corpus x panel) — an uncapped
#: percentage panel is O(n^2/mod), super-linear by construction: the
#: r11 scale-up measured x14.5 at x10 data before the cap) and depth.
HUB_MOD = 10
HUB_PANEL = 200
HUB_K = 10


def _threshold_sweep_oracle() -> str:
    from kafka_go_streamer_spark.plans.registry import ORACLES

    pairs = ORACLES["dedup_ngram_jaccard"]
    ts = ", ".join(str(t) for t in SWEEP_THRESHOLDS)
    return f"""
    WITH pairs AS MATERIALIZED ({pairs}),
    th AS (SELECT unnest([{ts}]) AS threshold)
    SELECT th.threshold,
           count(pairs.id_a)::BIGINT AS n_pairs,
           count(DISTINCT pairs.id_b)::BIGINT AS n_docs_dropped
    FROM th LEFT JOIN pairs ON pairs.jaccard >= th.threshold
    GROUP BY 1
    """


@query("dedup_threshold_sweep", oracle=_threshold_sweep_oracle)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup knob-tuning sweep: for each candidate drop threshold, how
    many verified MinHash-LSH pairs exceed it and how many documents a
    keep-lower-id policy would drop (distinct higher ids over
    qualifying pairs) — the curve a curation team reads to pick the
    Jaccard cut before running ``dedup_greedy_drop_rule`` for real.
    Composes the existing verified-candidate frame
    (``dedup_ngram_jaccard``); thresholds compare against the
    6dp-ROUNDED jaccard, so both engines admit identical pairs.

    Scale: the pair frame is the audited LSH-capped candidate set (never
    all pairs); the sweep is a 4-row broadcast against it. The
    drop count is exact under keep-lowest-id because a dropped doc is
    counted once per threshold via DISTINCT."""
    from kafka_go_streamer_spark.operators.iterate import pinned
    from kafka_go_streamer_spark.plans.registry import QUERIES as _Q

    pairs = pinned(_Q["dedup_ngram_jaccard"](spark, sf_dir))
    out = None
    for t in SWEEP_THRESHOLDS:
        hit = pairs.filter(F.col("jaccard") >= t)
        row = hit.agg(
            F.lit(t).alias("threshold"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("id_b").cast("long").alias("n_docs_dropped"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@query(
    "text_hapax_rate",
    oracle=f"""
    WITH w AS (
      SELECT source, unnest({X.words_sql('text')}) AS word
      FROM documents
    ),
    wc AS (
      SELECT source, word, count(*)::BIGINT AS c FROM w GROUP BY 1, 2
    )
    SELECT source,
           count(*)::BIGINT AS vocab_size,
           sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
           sum(c)::BIGINT AS n_tokens,
           round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS hapax_vocab_rate,
           round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0
                 / sum(c), 6) AS hapax_token_rate
    FROM wc GROUP BY 1
    """,
)
def text_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena share per source: the fraction of the source's
    vocabulary (and of its token stream) made of words seen exactly
    once. High hapax-vocab share with LOW hapax-token share is healthy
    Zipfian text; high hapax-TOKEN share flags OCR noise, mojibake, or
    random identifiers — the corpus-level companion to the per-document
    ``text_ttr_lexical_diversity`` and the empirical tail
    ``text_good_turing_coverage`` extrapolates from.

    Scale: one exploded scan to the (source, word) count frame
    (map-side combinable), then a source-sized rollup; no joins."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "source", F.explode(X.words(F.col("text"))).alias("word")
    )
    wc = w.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    hapax = F.when(F.col("c") == 1, 1).otherwise(0)
    return wc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum(hapax).cast("long").alias("n_hapax"),
        F.sum("c").cast("long").alias("n_tokens"),
        stable_round(
            F.sum(hapax) * 1.0 / F.count(F.lit(1)), 6
        ).alias("hapax_vocab_rate"),
        stable_round(F.sum(hapax) * 1.0 / F.sum("c"), 6).alias(
            "hapax_token_rate"
        ),
    )


@query(
    "text_mean_word_rank",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source, unnest({X.words_sql('text')}) AS word
      FROM documents
    ),
    vocab AS (
      SELECT word, count(*)::BIGINT AS c FROM w GROUP BY 1
    ),
    rk AS (
      SELECT word,
             row_number() OVER (ORDER BY c DESC, word ASC) AS rank
      FROM vocab
    ),
    per_doc AS (
      SELECT w.doc_id, w.source, round(avg(rk.rank), 6) AS mean_rank
      FROM w JOIN rk USING (word)
      GROUP BY 1, 2
    )
    SELECT source,
           count(*)::BIGINT AS n_docs,
           round(avg(mean_rank), 6) AS mean_word_rank,
           round(max(mean_rank), 6) AS worst_doc_rank
    FROM per_doc GROUP BY 1
    """,
)
def text_mean_word_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean global frequency rank of each document's word occurrences,
    rolled up per source: junk documents (random strings, foreign
    fragments, OCR residue) live far down the corpus frequency ranking,
    so a source whose mean word rank runs high — or whose worst
    document's rank explodes — needs a quality gate before training.
    The frequency-rank cousin of ``text_unigram_logprob`` (same signal,
    rank-space instead of probability-space, so it needs no smoothing).

    Scale: vocabulary frame from one exploded scan; the global rank
    window runs on that VOCABULARY-BOUNDED frame (the BPE-merge
    argument — corpus growth saturates the vocab, not the window);
    occurrences join the rank by word (equi), then two bounded
    rollups. Ranks are exact integers; only the two means round."""
    d = load_table(spark, sf_dir, "documents")
    from kafka_go_streamer_spark.operators.iterate import pinned
    from kafka_go_streamer_spark.sources.tables import fan_out

    # fan before the explode (the r11 single-task-scan rule; measured
    # x1.16 at sf1 — the residual cost is the vocabulary-rank window,
    # a BOUNDED single-partition frame by design)
    w = fan_out(d.select("doc_id", "source", "text")).select(
        "doc_id", "source", F.explode(X.words(F.col("text"))).alias("word")
    )
    vocab = w.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wr = Window.orderBy(F.col("c").desc(), F.col("word").asc())
    rk = pinned(
        vocab.select("word", F.row_number().over(wr).alias("rank"))
    )
    per_doc = (
        w.join(rk, "word")
        .groupBy("doc_id", "source")
        .agg(stable_round(F.avg("rank"), 6).alias("mean_rank"))
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        stable_round(F.avg("mean_rank"), 6).alias("mean_word_rank"),
        stable_round(F.max("mean_rank"), 6).alias("worst_doc_rank"),
    )


@query(
    "text_idf_stability",
    oracle=f"""
    WITH mx AS (SELECT max(doc_id)::BIGINT AS mx FROM documents),
    halves AS (
      SELECT d.doc_id,
             CASE WHEN d.doc_id <= mx.mx // 2 THEN 1 ELSE 2 END AS half,
             d.text
      FROM documents d CROSS JOIN mx
    ),
    n AS (
      SELECT half, count(*)::BIGINT AS n_docs FROM halves GROUP BY 1
    ),
    df AS (
      SELECT half, word, count(DISTINCT doc_id)::BIGINT AS df
      FROM (
        SELECT half, doc_id, unnest({X.words_sql('text')}) AS word
        FROM halves
      ) GROUP BY 1, 2
    ),
    idf AS (
      SELECT df.half, df.word,
             round(ln(n.n_docs * 1.0 / df.df), 6) AS idf
      FROM df JOIN n USING (half) WHERE df.df >= {IDF_MIN_DF}
    ),
    j AS (
      SELECT a.word, a.idf AS i1, b.idf AS i2
      FROM idf a JOIN idf b
        ON b.word = a.word AND a.half = 1 AND b.half = 2
    ),
    m AS (
      SELECT count(*)::BIGINT AS n,
             sum(i1) AS s1, sum(i2) AS s2,
             sum(i1 * i1) AS s11, sum(i2 * i2) AS s22,
             sum(i1 * i2) AS s12,
             sum(abs(i1 - i2)) AS sad
      FROM j
    )
    SELECT n AS n_common_words,
           round((n * s12 - s1 * s2)
                 / nullif(sqrt((n * s11 - s1 * s1)
                               * (n * s22 - s2 * s2)), 0), 5)
             AS idf_correlation,
           round(sad / n, 6) AS mean_abs_idf_diff
    FROM m
    """,
)
def text_idf_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift between corpus halves: Pearson correlation and
    mean absolute difference of per-word IDF computed independently on
    the first and second half of the corpus (doc-id order = ingestion
    order). Stable IDF means retrieval/tf-idf artifacts built on last
    month's corpus still rank correctly; a correlation drop is the
    re-index trigger. Only words with df >= {IDF_MIN_DF} in BOTH
    halves enter (rare-word IDF is sampling noise).

    Scale: document frequencies from one exploded scan per half
    (map-side combinable distinct-count on the (half, word) key); the
    comparison join is vocab-keyed equi; the correlation folds from
    moment sums over 6dp-rounded IDF values, rounded at 5dp — wider
    than the cross-engine fold drift of a vocabulary-sized sum."""
    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").cast("long").alias("mx"))
    halves = d.crossJoin(F.broadcast(mx)).select(
        "doc_id",
        F.when(F.col("doc_id") <= F.expr("mx div 2"), 1)
        .otherwise(2)
        .alias("half"),
        "text",
    )
    n = halves.groupBy("half").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    words = halves.select(
        "half", "doc_id", F.explode(X.words(F.col("text"))).alias("word")
    )
    df = words.groupBy("half", "word").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    idf = (
        df.filter(F.col("df") >= IDF_MIN_DF)
        .join(F.broadcast(n), "half")
        .select(
            "half",
            "word",
            stable_round(
                F.log(F.col("n_docs") * 1.0 / F.col("df")), 6
            ).alias("idf"),
        )
    )
    a = idf.filter(F.col("half") == 1).select(
        "word", F.col("idf").alias("i1")
    )
    b = idf.filter(F.col("half") == 2).select(
        "word", F.col("idf").alias("i2")
    )
    j = a.join(b, "word")
    m = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("i1").alias("s1"),
        F.sum("i2").alias("s2"),
        F.sum(F.col("i1") * F.col("i1")).alias("s11"),
        F.sum(F.col("i2") * F.col("i2")).alias("s22"),
        F.sum(F.col("i1") * F.col("i2")).alias("s12"),
        F.sum(F.abs(F.col("i1") - F.col("i2"))).alias("sad"),
    )
    return m.select(
        F.col("n").alias("n_common_words"),
        stable_round(
            (F.col("n") * F.col("s12") - F.col("s1") * F.col("s2"))
            / F.nullif(
                F.sqrt(
                    (F.col("n") * F.col("s11") - F.col("s1") * F.col("s1"))
                    * (F.col("n") * F.col("s22") - F.col("s2") * F.col("s2"))
                ),
                F.lit(0.0),
            ),
            5,
        ).alias("idf_correlation"),
        stable_round(F.col("sad") / F.col("n"), 6).alias(
            "mean_abs_idf_diff"
        ),
    )


@query(
    "events_weekly_gini_trend",
    oracle="""
    WITH act AS (
      SELECT floor(epoch(ts) / 604800)::BIGINT AS week,
             user_id, count(*)::BIGINT AS x
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT week, x,
             row_number() OVER (PARTITION BY week
                                ORDER BY x, user_id) AS i
      FROM act
    )
    SELECT week,
           count(*)::BIGINT AS n_users,
           sum(x)::BIGINT AS n_events,
           round(2.0 * sum(i * 1.0 * x) / (count(*) * sum(x))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM r GROUP BY 1
    """,
)
def events_weekly_gini_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly Gini of per-user activity: the concentration trend —
    ``stats_gini_concentration`` gives the static number; this series
    is what an ops team alarms on ("activity is centralizing onto few
    accounts week over week": bot farms, hot tenants, or a dying
    long-tail). Composes with ``events_heavy_hitter_drift`` (who the
    concentration moved to) and ``events_lorenz_deciles`` (the full
    curve for one period).

    Scale: the fact collapses to the (week, user) count frame; the
    rank window partitions BY WEEK (parallel, each partition one
    week's users), and the same-keyed rollup reuses that partitioning.
    Ties are order-ambiguous but Gini is tie-invariant (constant x
    within a tied block); Σ(i·x) promotes to double inside the fold on
    both engines — at 10^9 weekly users the integer product stack
    would cross int64."""
    ev = load_table(spark, sf_dir, "events")
    act = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 604800)
        .cast("long")
        .alias("week"),
        "user_id",
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    w = Window.partitionBy("week").orderBy("x", "user_id")
    r = act.select(
        "week", "x", F.row_number().over(w).alias("i")
    )
    n = F.count(F.lit(1))
    return r.groupBy("week").agg(
        n.cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("n_events"),
        stable_round(
            2.0 * F.sum(F.col("i") * 1.0 * F.col("x")) / (n * F.sum("x"))
            - (n + 1.0) / n,
            6,
        ).alias("gini"),
    )


@query(
    "events_activity_tail_hill",
    oracle=f"""
    WITH act AS (
      SELECT user_id, count(*)::BIGINT AS x
      FROM events GROUP BY 1
    ),
    r AS (
      SELECT x, row_number() OVER (ORDER BY x DESC, user_id ASC) AS i,
             count(*) OVER ()::BIGINT AS n
      FROM act
    ),
    m AS (
      SELECT greatest({HILL_MIN},
                      (max(n) // {HILL_FRAC_DEN})::BIGINT) AS m,
             max(n) AS n
      FROM r
    ),
    xm AS (
      SELECT r.x AS x_m, m.m, m.n
      FROM r JOIN m ON r.i = least(m.m, m.n)
    )
    SELECT xm.n AS n_users, least(xm.m, xm.n) AS m_tail,
           round((least(xm.m, xm.n) - 1)
                 / nullif(sum(ln(r.x * 1.0 / xm.x_m)), 0), 6)
             AS hill_alpha
    FROM r CROSS JOIN xm
    WHERE r.i < least(xm.m, xm.n)
    GROUP BY 1, 2
    """,
)
def events_activity_tail_hill(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hill estimator of the user-activity tail index: over the top
    m = max({HILL_MIN}, n/{HILL_FRAC_DEN}) most active users,
    alpha = (m-1) / Σ ln(x_i / x_m) — the standard answer to "how
    heavy is the power-law tail really" (alpha < 2: skew so extreme
    that hot-key salting and per-user quotas are mandatory; the
    quantitative backing for ``join_salted_skew``'s design and the
    per-user frequency caps in the dedup family). Complements
    ``text_zipf_fit`` (the word-frequency cousin) and
    ``events_lorenz_deciles`` (the distributional view).

    Scale: activity collapses to the bounded user frame; the global
    order statistics run on that frame (users-bounded, the same
    argument as every panel rank here), the m-th order statistic rides
    as a 1-row cross join, and the log-ratio sum is one aggregate over
    m-1 rows. Ratios of exact integer counts feed ln identically on
    both engines; Σ=0 (an all-tied tail) reports NULL on both."""
    ev = load_table(spark, sf_dir, "events")
    from kafka_go_streamer_spark.operators.iterate import pinned

    act = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    wr = Window.orderBy(F.col("x").desc(), F.col("user_id").asc())
    wn = Window.partitionBy()
    r = pinned(
        act.select(
            "x",
            F.row_number().over(wr).alias("i"),
            F.count(F.lit(1)).over(wn).cast("long").alias("n"),
        )
    )
    m = r.agg(
        F.greatest(
            F.lit(HILL_MIN),
            (F.max("n") / HILL_FRAC_DEN).cast("long"),
        ).alias("m"),
        F.max("n").alias("n_all"),
    )
    xm = (
        r.select("x", "i").crossJoin(F.broadcast(m))
        .filter(F.col("i") == F.least(F.col("m"), F.col("n_all")))
        .select(
            F.col("x").alias("x_m"),
            F.least(F.col("m"), F.col("n_all")).alias("m_tail"),
            F.col("n_all").alias("n_users"),
        )
    )
    return (
        r.select("x", "i")
        .crossJoin(F.broadcast(xm))
        .filter(F.col("i") < F.col("m_tail"))
        .groupBy("n_users", "m_tail")
        .agg(
            stable_round(
                (F.col("m_tail") - 1)
                / F.nullif(
                    F.sum(F.log(F.col("x") * 1.0 / F.col("x_m"))),
                    F.lit(0.0),
                ),
                6,
            ).alias("hill_alpha")
        )
    )


@query(
    "embedding_hubness_koccurrence",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    q AS (
      SELECT vec_id AS qid, emb AS qv FROM e
      WHERE vec_id % {HUB_MOD} = 0
        AND vec_id < {HUB_MOD} * {HUB_PANEL}
    ),
    topk AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, e.vec_id,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY round(list_dot_product(e.emb, q.qv)
                                / (sqrt(list_dot_product(e.emb, e.emb))
                                   * sqrt(list_dot_product(q.qv, q.qv))), 6)
                          DESC, e.vec_id ASC
               ) AS rk
        FROM e CROSS JOIN q WHERE e.vec_id <> q.qid
      ) WHERE rk <= {HUB_K}
    ),
    occ AS (
      SELECT e.vec_id,
             coalesce(t.c, 0)::BIGINT AS k_occ
      FROM e LEFT JOIN (
        SELECT vec_id, count(*)::BIGINT AS c FROM topk GROUP BY 1
      ) t USING (vec_id)
    ),
    m AS (
      SELECT count(*)::BIGINT AS n,
             sum(k_occ * 1.0) AS s1,
             sum(k_occ * 1.0 * k_occ) AS s2,
             sum(k_occ * 1.0 * k_occ * k_occ) AS s3,
             max(k_occ)::BIGINT AS mx,
             sum(CASE WHEN k_occ >= 2 * {HUB_K} THEN 1 ELSE 0 END)::BIGINT
               AS n_hubs
      FROM occ
    )
    SELECT (SELECT count(*) FROM q)::BIGINT AS n_queries,
           n AS n_vectors, mx AS max_k_occurrence, n_hubs,
           round(((s3 / n) - 3 * (s1 / n) * (s2 / n)
                  + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / nullif(pow((s2 / n) - (s1 / n) * (s1 / n), 1.5), 0),
                 5) AS k_occurrence_skew
    FROM m
    """,
)
def embedding_hubness_koccurrence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ANN hubness diagnostic: k-occurrence — how many sampled queries
    list each vector in their cosine top-{HUB_K} — and its population
    skewness. High positive skew means HUB vectors (a handful of
    points appear in everyone's neighbor list), the known failure mode
    of high-dimensional retrieval: recall evaluations look fine while
    results collapse onto hubs. n_hubs counts vectors appearing at
    >= 2k lists. The go/no-go number before shipping the
    ``ann_ivf_*`` index at a new dimensionality; composes with
    ``embedding_isotropy_score`` (hubness tracks anisotropy).

    Scale: the sampled panel (every {HUB_MOD}th vector, capped at
    {HUB_PANEL} queries — a FIXED panel keeps the probe O(corpus x
    panel); the uncapped percentage panel was measured SUPER-linear,
    x14.5 at x10 data, and killed) is the
    retrieval family's audited geometry — corpus scanned once against
    a broadcast panel, rank windows per query, k-row lists; the
    k-occurrence frame is corpus-sized with tiny integer counts, and
    skewness folds from raw moments promoted to double inside the sum
    on both engines (exact up to 2^53 — counts are <= panel size).
    Rounded at 5dp (skew divides near-cancelling moment sums, so give
    the fold an extra decade of slack)."""
    from kafka_go_streamer_spark.functions.vectors import cosine
    from kafka_go_streamer_spark.operators.iterate import pinned

    from kafka_go_streamer_spark.sources.tables import fan_out

    e0 = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    # fan the corpus before the panel cross join: the cosine fold is
    # per-dimension CPU over every (vector, query) pair and the test
    # parquet scans in one task (the r11 gram-explode lesson)
    e = fan_out(e0)
    q = pinned(
        e0.filter(
            (F.col("vec_id") % HUB_MOD == 0)
            & (F.col("vec_id") < HUB_MOD * HUB_PANEL)
        ).select(F.col("vec_id").alias("qid"), F.col("emb").alias("qv"))
    )
    wr = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    topk = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            stable_round(cosine(F.col("emb"), F.col("qv")), 6).alias(
                "score"
            ),
        )
        .select("qid", "vec_id", F.row_number().over(wr).alias("rk"))
        .filter(F.col("rk") <= HUB_K)
    )
    occ = (
        e.select("vec_id")
        .join(
            topk.groupBy("vec_id").agg(
                F.count(F.lit(1)).cast("long").alias("c")
            ),
            "vec_id",
            "left",
        )
        .select(
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("k_occ")
        )
    )
    nq = q.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    m = occ.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("k_occ") * 1.0).alias("s1"),
        F.sum(F.col("k_occ") * 1.0 * F.col("k_occ")).alias("s2"),
        F.sum(
            F.col("k_occ") * 1.0 * F.col("k_occ") * F.col("k_occ")
        ).alias("s3"),
        F.max("k_occ").cast("long").alias("mx"),
        F.sum(
            F.when(F.col("k_occ") >= 2 * HUB_K, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_hubs"),
    )
    mean = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mean * mean
    m3 = (
        F.col("s3") / F.col("n")
        - 3 * mean * (F.col("s2") / F.col("n"))
        + 2 * mean * mean * mean
    )
    return m.crossJoin(F.broadcast(nq)).select(
        "n_queries",
        F.col("n").alias("n_vectors"),
        F.col("mx").alias("max_k_occurrence"),
        "n_hubs",
        stable_round(
            m3 / F.nullif(F.pow(m2, F.lit(1.5)), F.lit(0.0)), 5
        ).alias("k_occurrence_skew"),
    )


def _spectral_entropy_oracle() -> str:
    from kafka_go_streamer_spark.plans.registry import ORACLES

    power = ORACLES["ts_periodogram_power"]
    return f"""
    WITH p AS MATERIALIZED ({power}),
    tot AS (
      SELECT event_type, sum(power) AS z, count(*)::BIGINT AS k
      FROM p GROUP BY 1
    ),
    sh AS (
      SELECT p.event_type, tot.k,
             round(p.power / nullif(tot.z, 0), 6) AS q
      FROM p JOIN tot USING (event_type)
    )
    SELECT event_type, k AS n_periods,
           round(sum(CASE WHEN q > 0 THEN -q * ln(q) ELSE 0.0 END)
                 / ln(k * 1.0), 6) AS spectral_entropy
    FROM sh GROUP BY 1, 2
    """


@query("ts_spectral_entropy", oracle=_spectral_entropy_oracle)
def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized spectral entropy over the candidate-period
    periodogram: H = -Σ q ln q / ln(k) with q the per-period power
    share — the forecastability score (0 = all power in one period,
    a clean seasonal signal worth a seasonal model; 1 = flat spectrum,
    ``ts_forecast_seasonal_naive`` will not beat a random walk).
    Composes ``ts_periodogram_power``'s audited projection: the power
    values enter ALREADY 4dp-rounded, so both engines normalize and
    fold identical doubles (ln guarded q > 0 on both).

    Scale: everything after the embedded periodogram (calendar-sized
    hourly rollup x 3 periods) is arithmetic on a k-per-type frame."""
    from kafka_go_streamer_spark.operators.iterate import pinned
    from kafka_go_streamer_spark.plans.registry import QUERIES as _Q

    p = pinned(_Q["ts_periodogram_power"](spark, sf_dir))
    tot = p.groupBy("event_type").agg(
        F.sum("power").alias("z"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    sh = p.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "k",
        stable_round(
            F.col("power") / F.nullif(F.col("z"), F.lit(0.0)), 6
        ).alias("q"),
    )
    return sh.groupBy("event_type", F.col("k").alias("n_periods")).agg(
        stable_round(
            F.sum(
                F.when(
                    F.col("q") > 0, -F.col("q") * F.log(F.col("q"))
                ).otherwise(0.0)
            )
            / F.log(F.col("n_periods") * 1.0),
            6,
        ).alias("spectral_entropy")
    )


# --------------------------------------------------------------- wave 5

#: Null-like placeholder tokens (lower-cased match over the word array).
NULL_LIKE = ("null", "none", "nan", "n/a", "undefined", "missing", "na")
#: Heaps-law fit runs over the same ingestion buckets as novelty decay.
HEAPS_BUCKETS = 20


@query(
    "text_heaps_law_fit",
    oracle=f"""
    WITH mx AS (SELECT max(doc_id)::BIGINT AS mx FROM documents),
    w AS (
      SELECT (d.doc_id * {HEAPS_BUCKETS}) // (mx.mx + 1) AS bucket,
             unnest({X.words_sql('d.text')}) AS word
      FROM documents d CROSS JOIN mx
    ),
    tok AS (
      SELECT bucket, count(*)::BIGINT AS n_tok FROM w GROUP BY 1
    ),
    nv AS (
      SELECT bucket, count(*)::BIGINT AS n_new
      FROM (SELECT word, min(bucket) AS bucket FROM w GROUP BY 1)
      GROUP BY 1
    ),
    cum AS (
      SELECT t.bucket,
             round(ln(sum(t.n_tok) OVER (ORDER BY t.bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) * 1.0), 6) AS x,
             round(ln(sum(coalesce(nv.n_new, 0)) OVER (ORDER BY t.bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) * 1.0), 6) AS y
      FROM tok t LEFT JOIN nv USING (bucket)
    ),
    m AS (
      SELECT count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM cum
    )
    SELECT n AS n_buckets,
           round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), 6)
             AS heaps_beta,
           round(exp((sy - (n * sxy - sx * sy)
                           / nullif(n * sxx - sx * sx, 0) * sx) / n), 4)
             AS heaps_k,
           round(pow(n * sxy - sx * sy, 2)
                 / nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0),
                 6) AS r_squared
    FROM m
    """,
)
def text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V(n) = K·n^beta of vocabulary growth over the
    {HEAPS_BUCKETS} ingestion buckets: log-log OLS of cumulative
    distinct words against cumulative tokens. beta ~ 0.5 is healthy
    natural text; beta near 1 means the vocabulary never saturates
    (identifiers/noise — tokenizer trouble ahead), beta near 0 means
    the crawl is recycling itself. The parametric summary of what
    ``text_ngram_novelty_decay`` shows point-by-point, and the
    vocabulary-side companion of ``text_zipf_fit`` (the two exponents
    are theoretically linked).

    Scale: one exploded scan; first-seen is a min-aggregate per word;
    the regression runs on a {HEAPS_BUCKETS}-row frame with
    6dp-rounded log inputs, so both engines fold identical doubles."""
    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").cast("long").alias("mx"))
    w = d.crossJoin(F.broadcast(mx)).select(
        F.expr(f"(doc_id * {HEAPS_BUCKETS}) div (mx + 1)").alias(
            "bucket"
        ),
        F.explode(X.words(F.col("text"))).alias("word"),
    )
    tok = w.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok")
    )
    nv = (
        w.groupBy("word")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    )
    wcum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        tok.join(nv, "bucket", "left")
        .select(
            "bucket",
            stable_round(
                F.log(F.sum("n_tok").over(wcum) * 1.0), 6
            ).alias("x"),
            stable_round(
                F.log(
                    F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(wcum)
                    * 1.0
                ),
                6,
            ).alias("y"),
        )
    )
    m = cum.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"),
        F.lit(0.0),
    )
    return m.select(
        F.col("n").alias("n_buckets"),
        stable_round(slope, 6).alias("heaps_beta"),
        stable_round(
            F.exp((F.col("sy") - slope * F.col("sx")) / F.col("n")), 4
        ).alias("heaps_k"),
        stable_round(
            F.pow(
                F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"),
                F.lit(2.0),
            )
            / F.nullif(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")),
                F.lit(0.0),
            ),
            6,
        ).alias("r_squared"),
    )


@query(
    "text_simpson_diversity",
    oracle=f"""
    WITH wc AS (
      SELECT source, word, count(*)::BIGINT AS c
      FROM (
        SELECT source, unnest({X.words_sql('text')}) AS word
        FROM documents
      ) GROUP BY 1, 2
    )
    SELECT source,
           sum(c)::BIGINT AS n_tokens,
           count(*)::BIGINT AS vocab_size,
           round(sum(c * 1.0 * c) / (sum(c) * 1.0 * sum(c)), 6) AS hhi,
           round(sum(c) * 1.0 * sum(c) / sum(c * 1.0 * c), 4)
             AS effective_vocab
    FROM wc GROUP BY 1
    """,
)
def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson/Herfindahl concentration of the word distribution per
    source: HHI = Σ p_w² (the probability two random tokens coincide)
    and its reciprocal, the EFFECTIVE vocabulary — "this source
    behaves like one with N equally-likely words". The concentration
    end of the diversity spectrum whose richness end is
    ``text_hapax_rate`` and whose information-theoretic middle is
    ``text_char_entropy``; boilerplate-heavy or templated sources show
    tiny effective vocabularies long before eyeballing catches it.

    Scale: one exploded scan to the (source, word) count frame, one
    source-sized rollup. HHI folds from exact integer sums with the
    double promotion INSIDE the products (Σc² at web scale crosses
    int64 — the r11 overflow rule)."""
    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select(
            "source", F.explode(X.words(F.col("text"))).alias("word")
        )
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return wc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        stable_round(
            F.sum(F.col("c") * 1.0 * F.col("c"))
            / (F.sum("c") * 1.0 * F.sum("c")),
            6,
        ).alias("hhi"),
        stable_round(
            F.sum("c") * 1.0 * F.sum("c")
            / F.sum(F.col("c") * 1.0 * F.col("c")),
            4,
        ).alias("effective_vocab"),
    )


@query(
    "quality_null_like_tokens",
    oracle=f"""
    WITH per AS (
      SELECT source,
             {X.word_count_sql('text')} AS n_words,
             len(list_filter({X.words_sql('text')},
                 w -> list_contains([{", ".join(f"'{w}'" for w in NULL_LIKE)}], w)))
               AS hits
      FROM documents
    )
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(n_words)::BIGINT AS n_words,
           sum(hits)::BIGINT AS n_null_like,
           round(sum(hits) * 1.0 / nullif(sum(n_words), 0), 6)
             AS null_token_rate,
           sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END)::BIGINT
             AS n_docs_affected,
           round(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS doc_rate
    FROM per GROUP BY 1
    """,
)
def quality_null_like_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Placeholder-leak gate: how much of each source is literally the
    words {NULL_LIKE} — the signature of broken ETL upstream (a NULL
    column stringified into the text, a failed scrape saving error
    pages). Token rate prices the contamination; doc rate sizes the
    blast radius. The data-engineering sibling of
    ``quality_encoding_check`` (mojibake) and ``text_pii_redact``
    (sensitive strings) — all three are one-scan lexical tripwires a
    pipeline runs on every ingest batch.

    Scale: one narrow scan, two in-row counts over the already-split
    word array, one source-sized rollup; zero joins."""
    d = load_table(spark, sf_dir, "documents")
    ws = X.words(F.col("text"))
    per = d.select(
        "source",
        F.size(ws).alias("n_words"),
        F.size(
            F.filter(ws, lambda w: w.isin(*NULL_LIKE))
        ).alias("hits"),
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("hits").cast("long").alias("n_null_like"),
        stable_round(
            F.sum("hits") * 1.0 / F.nullif(F.sum("n_words"), F.lit(0)),
            6,
        ).alias("null_token_rate"),
        F.sum(F.when(F.col("hits") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_docs_affected"),
        stable_round(
            F.sum(F.when(F.col("hits") > 0, 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("doc_rate"),
    )


@query(
    "events_cumulative_reach",
    oracle="""
    WITH days AS (
      SELECT DISTINCT floor(epoch(ts) / 86400)::BIGINT AS day
      FROM events
    ),
    fd AS (
      SELECT user_id, min(floor(epoch(ts) / 86400)::BIGINT) AS day
      FROM events GROUP BY 1
    ),
    nu AS (
      SELECT day, count(*)::BIGINT AS n_new FROM fd GROUP BY 1
    ),
    tot AS (SELECT count(*)::BIGINT AS n_total FROM fd)
    SELECT d.day,
           coalesce(nu.n_new, 0)::BIGINT AS n_new_users,
           sum(coalesce(nu.n_new, 0)) OVER (ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)::BIGINT AS cum_users,
           round(sum(coalesce(nu.n_new, 0)) OVER (ORDER BY d.day
                 ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) * 1.0 / tot.n_total, 6) AS reach_rate
    FROM days d LEFT JOIN nu USING (day) CROSS JOIN tot
    """,
)
def events_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative audience reach curve: per day, how many users were
    seen for the FIRST time and what fraction of the eventual audience
    has been reached — the saturation curve growth teams read next to
    the flow view (``events_user_lifecycle_states``) and that crawl
    scheduling reads as "are we still discovering new entities". A
    flattening reach curve with steady volume means pure repetition.

    Scale: first-touch is a min-aggregate per user (no window over the
    fact); the cumulative pass runs on the DAY grid (calendar-sized);
    the audience total rides as a 1-row cross join."""
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / 86400).cast("long")
    days = ev.select(day.alias("day")).distinct()
    fd = ev.groupBy("user_id").agg(F.min(day).alias("day"))
    nu = fd.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    tot = fd.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    wcum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    nn = F.coalesce(F.col("n_new"), F.lit(0))
    return (
        days.join(nu, "day", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "day",
            nn.cast("long").alias("n_new_users"),
            F.sum(nn).over(wcum).cast("long").alias("cum_users"),
            stable_round(
                F.sum(nn).over(wcum) * 1.0 / F.col("n_total"), 6
            ).alias("reach_rate"),
        )
    )


@query(
    "events_transition_lift",
    oracle="""
    WITH seq AS (
      SELECT event_type AS a,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS b
      FROM events
    ),
    big AS (
      SELECT a, b, count(*)::BIGINT AS n_ab
      FROM seq WHERE b IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT sum(n_ab)::BIGINT AS n FROM big),
    ma AS (SELECT a, sum(n_ab)::BIGINT AS n_a FROM big GROUP BY 1),
    mb AS (SELECT b, sum(n_ab)::BIGINT AS n_b FROM big GROUP BY 1)
    SELECT big.a AS from_type, big.b AS to_type, big.n_ab AS n,
           round(big.n_ab * 1.0 * tot.n / (ma.n_a * 1.0 * mb.n_b), 6)
             AS lift,
           round(ln(big.n_ab * 1.0 * tot.n / (ma.n_a * 1.0 * mb.n_b)), 6)
             AS log_lift
    FROM big JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot
    """,
)
def events_transition_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Independence lift of behavioral transitions: for each (from, to)
    event-type bigram, P(a→b) / (P(a·)·P(·b)) — how much more (or
    less) often the pair occurs than independent marginals predict.
    ``events_transition_matrix`` reports the conditional probability
    (dominated by the marginals); lift isolates genuine SEQUENTIAL
    affinity — the event-stream analogue of ``text_pmi_cooccurrence``,
    and the statistic that actually finds error→retry and
    signup→purchase chains.

    Scale: one lag window partitioned by user for the bigrams, then
    everything on the k×k type-pair frame with marginals joined by
    type key and the grand total as a 1-row cross join. Integer
    products promote to double inside the ratio (the overflow rule);
    lift > 0 always (n_ab >= 1), so ln is safe."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).filter(F.col("b").isNotNull())
    big = seq.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n_ab")
    )
    from kafka_go_streamer_spark.operators.iterate import pinned

    big = pinned(big)
    tot = big.agg(F.sum("n_ab").cast("long").alias("n"))
    ma = big.groupBy("a").agg(F.sum("n_ab").cast("long").alias("n_a"))
    mb = big.groupBy("b").agg(F.sum("n_ab").cast("long").alias("n_b"))
    lift = (
        F.col("n_ab")
        * 1.0
        * F.col("n")
        / (F.col("n_a") * 1.0 * F.col("n_b"))
    )
    return (
        big.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("a").alias("from_type"),
            F.col("b").alias("to_type"),
            F.col("n_ab").alias("n"),
            stable_round(lift, 6).alias("lift"),
            stable_round(F.log(lift), 6).alias("log_lift"),
        )
    )
