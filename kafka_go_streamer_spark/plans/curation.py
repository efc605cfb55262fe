"""Round-11 curation wave: domain-mixture reweighting, tokenizer-cost
accounting, n-gram-level eval contamination, token-budget planning,
corpus novelty decay, dedup token retention, embedding-domain
discrepancy, and mixture-drift monitoring.

Like every query module here, this is north-star surface the reference
(a 655-line content-based Kafka router, /root/reference/main.go) never
had — the operators that decide WHAT a pretraining run feeds on:
"which domains should be up/down-weighted given a loss signal"
(DoReMi-style mirror-descent reweight), "how expensive is each
language for my tokenizer" (fertility / bytes-per-token), "did a
benchmark leak into the training split at the n-gram level" (13-gram
overlap — the industry-standard contamination check, extending
``text_decontaminate`` beyond exact/near-dup), "how many epochs of
each source does a token budget force" (budget/epoch planner), "is
the corpus running out of new n-grams" (novelty decay), "how many
tokens does exact dedup actually delete per source" (retention), "how
far apart do label cohorts sit in embedding space" (linear MMD), and
"how far is the realized mixture from its temperature target"
(mixture KL).

Scale discipline (unchanged from the other modules): facts collapse to
source/lang/label/bucket-sized frames before any quadratic or
all-pairs step; n-gram joins are equi-joins on hashed grams with the
benchmark side broadcastable; scalar corpus statistics ride as 1-row
broadcast cross-joins inside the plan (never ``.collect()``); shared
doubles are rounded before cross-engine folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions import text as X
from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.sources.tables import load_table

# ----------------------------------------------------- mixture planning

#: DoReMi mirror-descent step size (one exponentiated-gradient step
#: from the uniform prior; the published recipe re-estimates the loss
#: between steps with a retrained proxy model, so a fixed loss signal
#: admits exactly one honest step).
DOREMI_ETA = 2.0
#: Temperature for token-share targets (0 < tau < 1 flattens toward
#: uniform — the multilingual-sampling convention).
MIX_TAU = 0.5
#: KL-monitor temperature (matches ``sample_temperature_mixture``'s
#: published default rather than the planner's).
KL_TAU = 0.7
#: Fraction of the corpus token count a hypothetical training budget
#: covers, and the repetition cap (epochs) curation tolerates.
BUDGET_FRAC = 0.5
MAX_EPOCHS = 4.0

#: Contamination n-gram order (13-gram word overlap is the standard
#: eval-decontamination check) and the benchmark-panel modulus.
CONTAM_N = 13
BENCH_MOD = 97
#: Novelty-decay n-gram order and bucket count.
NOVELTY_N = 8
NOVELTY_BUCKETS = 20


def _loss_proxy_sql() -> str:
    """Per-doc loss proxy: ln(1 + chars-per-token) — a deterministic
    stand-in for per-domain LM loss (verbose, low-entropy domains
    tokenize long and score high). Strictly positive, so ln is safe."""
    return (
        "ln(1.0 + n_chars * 1.0 / "
        f"greatest({X.token_count_sql('text')}, 1))"
    )


def _loss_proxy(d: DataFrame) -> DataFrame:
    return d.select(
        "source",
        F.log(
            1.0
            + F.col("n_chars")
            * 1.0
            / F.greatest(X.token_count(F.col("text")), F.lit(1))
        ).alias("l"),
    )


@query(
    "sample_doremi_reweight",
    oracle=f"""
    WITH l AS (
      SELECT source, {_loss_proxy_sql()} AS l FROM documents
    ),
    per AS (
      SELECT source, count(*)::BIGINT AS n_docs,
             round(avg(l), 6) AS loss_proxy
      FROM l GROUP BY 1
    ),
    ref AS (SELECT round(avg(l), 6) AS ref_loss FROM l),
    ex AS (
      SELECT source, n_docs, loss_proxy,
             round(greatest(loss_proxy - ref.ref_loss, 0.0), 6)
               AS excess_loss
      FROM per CROSS JOIN ref
    ),
    w AS (
      SELECT *, exp({DOREMI_ETA} * excess_loss) AS w_raw FROM ex
    )
    SELECT source, n_docs, loss_proxy, excess_loss,
           round(w_raw / sum(w_raw) OVER (), 6) AS weight
    FROM w
    """,
)
def sample_doremi_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting (VERDICT r10 task 5a): one
    exponentiated-gradient step on the domain simplex from a uniform
    prior — w_s ∝ exp(eta * excess_loss_s), where excess loss is the
    domain's loss proxy above the corpus reference, floored at zero
    (domains easier than the reference keep the uniform weight; hard
    domains are up-weighted, the DoReMi Group-DRO direction). Composes
    with ``sample_effective_sample_size`` (are the solved weights
    degenerate?) and ``sample_temperature_mixture`` (the non-adaptive
    alternative).

    Scale: the loss proxy is a narrow per-row expression folded into
    ONE map-side-combinable aggregate over the fact; everything after
    runs on the n_sources-row frame (the corpus reference rides as a
    1-row cross join; the softmax normalizer is a window over ~20
    rows). Excess is computed from 6dp-ROUNDED loss values on both
    engines, so exp sees identical doubles and the final 6dp round
    absorbs libm last-ulp drift."""
    d = load_table(spark, sf_dir, "documents")
    lp = _loss_proxy(d)
    per = lp.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        stable_round(F.avg("l"), 6).alias("loss_proxy"),
    )
    ref = lp.agg(stable_round(F.avg("l"), 6).alias("ref_loss"))
    ex = per.crossJoin(F.broadcast(ref)).select(
        "source",
        "n_docs",
        "loss_proxy",
        stable_round(
            F.greatest(F.col("loss_proxy") - F.col("ref_loss"), F.lit(0.0)),
            6,
        ).alias("excess_loss"),
    )
    w = ex.withColumn("w_raw", F.exp(DOREMI_ETA * F.col("excess_loss")))
    from pyspark.sql import Window

    return w.select(
        "source",
        "n_docs",
        "loss_proxy",
        "excess_loss",
        stable_round(
            F.col("w_raw")
            / F.sum("w_raw").over(
                Window.partitionBy()
            ),
            6,
        ).alias("weight"),
    )


@query(
    "text_tokenizer_fertility",
    oracle=f"""
    SELECT lang,
           count(*)::BIGINT AS n_docs,
           sum(octet_length(encode(text)))::BIGINT AS n_bytes,
           sum({X.word_count_sql('text')})::BIGINT AS n_words,
           sum({X.token_count_sql('text')})::BIGINT AS n_tokens,
           round(sum({X.token_count_sql('text')}) * 1.0
                 / nullif(sum({X.word_count_sql('text')}), 0), 6)
             AS fertility,
           round(sum(octet_length(encode(text))) * 1.0
                 / nullif(sum({X.token_count_sql('text')}), 0), 6)
             AS bytes_per_token
    FROM documents
    GROUP BY 1
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility / bytes-per-token per language (VERDICT r10
    task 5b): tokens-per-word and bytes-per-token under the repo's
    BPE-ish tokenization — the cost model behind multilingual sampling
    (a language whose fertility is 2x pays 2x the context budget per
    word, so token-budget mixtures must correct for it; composes with
    ``text_bpe_pair_merges``, which builds the merge table this
    approximates, and ``sample_token_budget_epochs``).

    Scale: one narrow scan, three codegen'd per-row counts folded into
    a lang-sized hash aggregate (map-side combinable); ratios on exact
    BIGINT sums — the only doubles are the two final divisions."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.octet_length(F.col("text"))).cast("long").alias("n_bytes"),
        F.sum(X.word_count(F.col("text"))).cast("long").alias("n_words"),
        F.sum(X.token_count(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return per.select(
        "lang",
        "n_docs",
        "n_bytes",
        "n_words",
        "n_tokens",
        stable_round(
            F.col("n_tokens") * 1.0 / F.nullif(F.col("n_words"), F.lit(0)),
            6,
        ).alias("fertility"),
        stable_round(
            F.col("n_bytes") * 1.0 / F.nullif(F.col("n_tokens"), F.lit(0)),
            6,
        ).alias("bytes_per_token"),
    )


def _grams_sql(n: int) -> str:
    """DuckDB word n-grams of the repo's whitespace tokenization,
    hashed to md5 strings."""
    return f"""
      SELECT doc_id,
             md5(array_to_string(list_slice(ws, t.i, t.i + {n - 1}), ' '))
               AS gram
      FROM (
        SELECT doc_id,
               {X.words_sql('text')} AS ws
        FROM documents
      ), unnest(range(1, len(ws) - {n - 2})) AS t(i)
    """


def _grams(d: DataFrame, n: int) -> DataFrame:
    """Spark twin of :func:`_grams_sql`: explode hashed word n-grams.
    The sequence is guarded (< n words -> empty array) because Spark's
    ``sequence(1, stop)`` turns DESCENDING when stop < 1 instead of
    returning empty like DuckDB's ``range``."""
    ws = X.words(F.col("text"))
    grams = F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(ws, i, n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.select("doc_id", F.explode(grams).alias("gram"))


@query(
    "text_contamination_ngrams",
    oracle=f"""
    WITH grams AS ({_grams_sql(CONTAM_N)}),
    bench AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % {BENCH_MOD} = 0
    ),
    train AS (
      SELECT DISTINCT doc_id, gram FROM grams
      WHERE doc_id % {BENCH_MOD} <> 0
    ),
    hits AS (
      SELECT t.doc_id, count(*)::BIGINT AS shared
      FROM train t JOIN bench b USING (gram)
      GROUP BY 1
    )
    SELECT d.source,
           count(*)::BIGINT AS n_train_docs,
           sum(CASE WHEN h.shared IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_contaminated,
           round(sum(CASE WHEN h.shared IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS contamination_rate,
           coalesce(sum(h.shared), 0)::BIGINT AS n_shared_grams
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % {BENCH_MOD} <> 0
    GROUP BY 1
    """,
)
def text_contamination_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination at the {CONTAM_N}-gram level (VERDICT r10
    task 5c): every training document sharing at least one word
    {CONTAM_N}-gram with the held-out benchmark panel (every
    {BENCH_MOD}-th document — the fixture's stand-in for an eval
    suite) is flagged, reported as a per-source contamination rate plus
    the shared-gram volume. This is the industry-standard
    decontamination check (13-gram overlap), extending
    ``text_decontaminate``'s exact/near-dup gate to sub-document
    leakage a paraphrased or excerpted benchmark item still trips.

    Scale: grams are hashed in-row (one explode per side), the
    benchmark side collapses to a DISTINCT gram set that is ~1/{BENCH_MOD}
    of the corpus and broadcastable at any realistic benchmark size,
    and the probe is an equi-join on the 32-hex gram key followed by a
    source-sized rollup — no pairwise document comparison anywhere."""
    d = load_table(spark, sf_dir, "documents")
    grams = _grams(d, CONTAM_N)
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench = grams.filter(is_bench).select("gram").distinct()
    train = grams.filter(~is_bench).distinct()
    hits = (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    tdocs = d.filter(~is_bench).select("doc_id", "source")
    return (
        tdocs.join(hits, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train_docs"),
            F.sum(
                F.when(F.col("shared").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_contaminated"),
            stable_round(
                F.sum(
                    F.when(F.col("shared").isNotNull(), 1).otherwise(0)
                )
                * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("contamination_rate"),
            F.coalesce(F.sum("shared"), F.lit(0))
            .cast("long")
            .alias("n_shared_grams"),
        )
    )


@query(
    "sample_token_budget_epochs",
    oracle=f"""
    WITH per AS (
      SELECT source,
             sum({X.token_count_sql('text')})::BIGINT AS tokens
      FROM documents GROUP BY 1
    ),
    tot AS (
      SELECT sum(tokens)::BIGINT AS all_tokens,
             sum(sqrt(tokens)) AS z
      FROM per
    ),
    sh AS (
      SELECT p.source, p.tokens,
             round(sqrt(p.tokens) / t.z, 6) AS target_share,
             round({BUDGET_FRAC} * t.all_tokens * (sqrt(p.tokens) / t.z)
                   / p.tokens, 6) AS epochs_needed
      FROM per p CROSS JOIN tot t
    )
    SELECT source, tokens, target_share, epochs_needed,
           round(least(epochs_needed, {MAX_EPOCHS}), 6) AS capped_epochs,
           (CASE WHEN epochs_needed > 1.0 THEN 1 ELSE 0 END)::INTEGER
             AS upsampled
    FROM sh
    """,
)
def sample_token_budget_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget epoch planner: given a training budget of
    {BUDGET_FRAC:.0%} of the corpus token count and temperature-{MIX_TAU}
    target shares (sqrt-of-tokens — the multilingual-sampling
    flattening), how many EPOCHS of each source does the plan demand?
    Sources whose target share exceeds their natural share need > 1
    epoch (repetition — flagged, and capped at {MAX_EPOCHS} per the
    data-constrained-scaling convention that repetition beyond ~4
    epochs stops helping). The quantitative follow-up to
    ``sample_temperature_mixture``: not just the weights, but whether
    the corpus can PAY them.

    Scale: one map-side-combinable token-count aggregate to a
    source-sized frame; the corpus totals ride as a 1-row cross join.
    sqrt (not pow) on exact BIGINT token counts keeps both libms on
    the same well-tested path; shares and epochs are rounded at 6dp
    before the cap comparison so both engines admit identical rows."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.sum(X.token_count(F.col("text"))).cast("long").alias("tokens")
    )
    tot = per.agg(
        F.sum("tokens").cast("long").alias("all_tokens"),
        F.sum(F.sqrt(F.col("tokens"))).alias("z"),
    )
    sh = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        stable_round(F.sqrt(F.col("tokens")) / F.col("z"), 6).alias(
            "target_share"
        ),
        stable_round(
            BUDGET_FRAC
            * F.col("all_tokens")
            * (F.sqrt(F.col("tokens")) / F.col("z"))
            / F.col("tokens"),
            6,
        ).alias("epochs_needed"),
    )
    return sh.select(
        "source",
        "tokens",
        "target_share",
        "epochs_needed",
        stable_round(
            F.least(F.col("epochs_needed"), F.lit(MAX_EPOCHS)), 6
        ).alias("capped_epochs"),
        F.when(F.col("epochs_needed") > 1.0, 1)
        .otherwise(0)
        .cast("int")
        .alias("upsampled"),
    )


@query(
    "text_ngram_novelty_decay",
    oracle=f"""
    WITH grams AS ({_grams_sql(NOVELTY_N)}),
    mx AS (SELECT max(doc_id)::BIGINT AS mx FROM documents),
    gb AS (
      SELECT DISTINCT g.gram,
             (g.doc_id * {NOVELTY_BUCKETS}) // (mx.mx + 1) AS bucket
      FROM grams g CROSS JOIN mx
    ),
    first_seen AS (
      SELECT gram, min(bucket) AS first_bucket FROM gb GROUP BY 1
    ),
    seen AS (
      SELECT bucket, count(*)::BIGINT AS n_grams_seen
      FROM gb GROUP BY 1
    ),
    fresh AS (
      SELECT first_bucket AS bucket, count(*)::BIGINT AS n_new_grams
      FROM first_seen GROUP BY 1
    )
    SELECT s.bucket::BIGINT AS bucket, s.n_grams_seen,
           coalesce(f.n_new_grams, 0)::BIGINT AS n_new_grams,
           round(coalesce(f.n_new_grams, 0) * 1.0 / s.n_grams_seen, 6)
             AS novelty_rate
    FROM seen s LEFT JOIN fresh f USING (bucket)
    """,
)
def text_ngram_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty decay: split the corpus into {NOVELTY_BUCKETS}
    equal doc-id buckets (ingestion order) and report, per bucket, how
    many distinct word {NOVELTY_N}-grams appear and what fraction of
    them were never seen in an earlier bucket. A healthy growing
    corpus holds novelty high; a saturating or self-duplicating crawl
    shows the rate collapsing — the curve dedup and crawl scheduling
    teams watch. Composes with ``text_distinct_n`` (in-document
    diversity) and the dedup family (cross-document duplication).

    Scale: one gram explode, then all work on the DISTINCT
    (gram, bucket) frame; first-seen is a min-aggregate per gram (no
    window over the fact), and the output is {NOVELTY_BUCKETS} rows.
    Bucketing is exact BIGINT arithmetic — (doc_id * B) // (max+1) —
    so engines cannot disagree at bucket boundaries."""
    d = load_table(spark, sf_dir, "documents")
    grams = _grams(d, NOVELTY_N)
    mx = d.agg(F.max("doc_id").cast("long").alias("mx"))
    gb = (
        grams.crossJoin(F.broadcast(mx))
        .select(
            "gram",
            F.expr(
                f"(doc_id * {NOVELTY_BUCKETS}) div (mx + 1)"
            ).alias("bucket"),
        )
        .distinct()
    )
    first_seen = gb.groupBy("gram").agg(F.min("bucket").alias("first_bucket"))
    seen = gb.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams_seen")
    )
    fresh = first_seen.groupBy(
        F.col("first_bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_new_grams"))
    return (
        seen.join(fresh, "bucket", "left")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_grams_seen",
            F.coalesce(F.col("n_new_grams"), F.lit(0))
            .cast("long")
            .alias("n_new_grams"),
            stable_round(
                F.coalesce(F.col("n_new_grams"), F.lit(0))
                * 1.0
                / F.col("n_grams_seen"),
                6,
            ).alias("novelty_rate"),
        )
    )


@query(
    "dedup_token_retention",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, source,
             {X.token_count_sql('text')} AS toks,
             md5(text) AS fp
      FROM documents
    ),
    keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp)
    SELECT f.source,
           count(*)::BIGINT AS docs_total,
           sum(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS docs_kept,
           sum(f.toks)::BIGINT AS tokens_total,
           sum(CASE WHEN k.doc_id IS NOT NULL THEN f.toks
                    ELSE 0 END)::BIGINT AS tokens_kept,
           round(sum(CASE WHEN k.doc_id IS NOT NULL THEN f.toks
                          ELSE 0 END) * 1.0
                 / nullif(sum(f.toks), 0), 6) AS token_retention
    FROM fp f LEFT JOIN keep k USING (doc_id)
    GROUP BY 1
    """,
)
def dedup_token_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting for exact dedup: keep-first (min doc_id) per
    exact text fingerprint, then report per source how many DOCUMENTS
    and how many TOKENS survive — the number that matters for budget
    planning, since duplicate-heavy sources lose tokens, not just rows
    (``dedup_exact_hash`` counts groups; this prices them; feeds
    ``sample_token_budget_epochs``).

    Scale: fingerprint + token count in one narrow scan; the keeper
    set is a min-aggregate on the fingerprint key; the survivorship
    join is an equi-join on doc_id (no text moves twice); rollup is
    source-sized."""
    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        "source",
        X.token_count(F.col("text")).alias("toks"),
        F.md5(F.col("text")).alias("fp"),
    )
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id", F.lit(1).alias("_keep")
    )
    kept = F.col("_keep").isNotNull()
    return (
        fp.join(keep, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs_total"),
            F.sum(F.when(kept, 1).otherwise(0))
            .cast("long")
            .alias("docs_kept"),
            F.sum("toks").cast("long").alias("tokens_total"),
            F.sum(F.when(kept, F.col("toks")).otherwise(0))
            .cast("long")
            .alias("tokens_kept"),
            stable_round(
                F.sum(F.when(kept, F.col("toks")).otherwise(0))
                * 1.0
                / F.nullif(F.sum("toks"), F.lit(0)),
                6,
            ).alias("token_retention"),
        )
    )


@query(
    "embedding_label_mmd",
    oracle="""
    WITH ex AS (
      SELECT label, t.i AS dim, embedding[t.i]::DOUBLE AS val
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    mu AS (
      SELECT label, dim, round(avg(val), 6) AS m
      FROM ex GROUP BY 1, 2
    )
    SELECT a.label::INTEGER AS label_a, b.label::INTEGER AS label_b,
           round(sum((a.m - b.m) * (a.m - b.m)), 6) AS mmd_sq
    FROM mu a JOIN mu b ON a.dim = b.dim AND a.label < b.label
    GROUP BY 1, 2
    """,
)
def embedding_label_mmd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-kernel MMD^2 between every pair of label cohorts in
    embedding space: ||mu_a - mu_b||^2 of the cohort mean vectors —
    the O(n) member of the MMD family (no pairwise kernel matrix),
    and the standard first answer to "are these two domains/cohorts
    distributionally different in representation space". Complements
    ``embedding_centroid_drift`` (one cohort over time) with the full
    pairwise cohort map, and ``embedding_knn_label_purity`` (local
    structure) with a global separation number.

    Scale: the fact collapses to a k x d frame (labels x dims) in one
    map-side-combinable aggregate; the pairwise stage is a self-join
    of that tiny frame on the dim key (k^2 x d rows — hundreds of
    thousands even at k=100, d=1024, nowhere near the fact size).
    Means are rounded at 6dp before differencing so both engines
    square identical doubles."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("dim0", "val")
    ).select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.col("val").cast("double").alias("val"),
    )
    mu = ex.groupBy("label", "dim").agg(
        stable_round(F.avg("val"), 6).alias("m")
    )
    a = mu.select(
        F.col("label").alias("label_a"),
        "dim",
        F.col("m").alias("ma"),
    )
    b = mu.select(
        F.col("label").alias("label_b"),
        "dim",
        F.col("m").alias("mb"),
    )
    return (
        a.join(b, "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy(
            F.col("label_a").cast("int").alias("label_a"),
            F.col("label_b").cast("int").alias("label_b"),
        )
        .agg(
            stable_round(
                F.sum(
                    (F.col("ma") - F.col("mb"))
                    * (F.col("ma") - F.col("mb"))
                ),
                6,
            ).alias("mmd_sq")
        )
    )


@query(
    "sample_mixture_kl_to_target",
    oracle=f"""
    WITH per AS (
      SELECT source,
             sum({X.token_count_sql('text')})::BIGINT AS tokens
      FROM documents GROUP BY 1
    ),
    tot AS (
      SELECT sum(tokens)::BIGINT AS all_tokens,
             sum(pow(tokens, {KL_TAU})) AS z
      FROM per
    ),
    pq AS (
      SELECT p.source,
             round(p.tokens * 1.0 / t.all_tokens, 6) AS p,
             round(pow(p.tokens, {KL_TAU}) / t.z, 6) AS q
      FROM per p CROSS JOIN tot t
    )
    SELECT count(*)::BIGINT AS n_sources,
           round(sum(CASE WHEN p > 0 AND q > 0
                          THEN p * ln(p / q) ELSE 0.0 END), 6)
             AS kl_nats,
           round(exp(-sum(CASE WHEN p > 0 THEN p * ln(p)
                               ELSE 0.0 END)), 6) AS realized_perplexity
    FROM pq
    """,
)
def sample_mixture_kl_to_target(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mixture-drift monitor: KL(realized || target) between the
    corpus's realized token mixture over sources and its
    temperature-{KL_TAU} target (the ``sample_temperature_mixture``
    policy), plus the realized mixture's perplexity (effective number
    of sources). The one-number answer to "did ingest drift away from
    the sampling policy" — alarm on kl_nats, read the per-source
    detail from the planner queries.

    Scale: token counts collapse to the source frame in one aggregate;
    p and q are rounded at 6dp before the log-ratio (both engines fold
    identical doubles, ln guarded > 0 on both per the repo's rounding
    convention); output is a single row."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.sum(X.token_count(F.col("text"))).cast("long").alias("tokens")
    )
    tot = per.agg(
        F.sum("tokens").cast("long").alias("all_tokens"),
        F.sum(F.pow(F.col("tokens"), F.lit(KL_TAU))).alias("z"),
    )
    pq = per.crossJoin(F.broadcast(tot)).select(
        stable_round(
            F.col("tokens") * 1.0 / F.col("all_tokens"), 6
        ).alias("p"),
        stable_round(
            F.pow(F.col("tokens"), F.lit(KL_TAU)) / F.col("z"), 6
        ).alias("q"),
    )
    return pq.agg(
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        stable_round(
            F.sum(
                F.when(
                    (F.col("p") > 0) & (F.col("q") > 0),
                    F.col("p") * F.log(F.col("p") / F.col("q")),
                ).otherwise(0.0)
            ),
            6,
        ).alias("kl_nats"),
        stable_round(
            F.exp(
                -F.sum(
                    F.when(
                        F.col("p") > 0, F.col("p") * F.log(F.col("p"))
                    ).otherwise(0.0)
                )
            ),
            6,
        ).alias("realized_perplexity"),
    )
