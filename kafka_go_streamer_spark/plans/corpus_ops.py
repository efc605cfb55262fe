"""Round-12 wave 2: corpus-operations audits — the gate funnel, the
prefix-duplication screen, and the router rule-overlap matrix.

* ``pipeline_gate_funnel`` — per-stage survivor accounting for the
  EXACT gate chain ``pipeline_training_prep`` runs (length → alpha →
  language → exact dedup). The pipeline query emits survivors; this
  emits the funnel REPORT an operator reads to see where the corpus
  dies — all five stages from ONE conditional aggregate over one scan.

* ``text_doc_prefix_dup`` — crawl-snapshot overlap screen: documents
  sharing an identical first-{PREFIX_CHARS}-chars prefix. Full-text
  exact dedup misses truncation/continuation variants that prefix
  identity catches; flagging is one md5 per doc + one hash aggregate.

* ``route_rule_coverage_overlap`` — pairwise overlap of the document
  router's split patterns (the same compiled ``DOCS_SPLITER`` the
  production router uses): how many messages match BOTH split i and
  split j. ``route_masking_analysis`` shows what first-match-wins
  COSTS each split; this shows the ambiguity STRUCTURE that causes it
  — the two tables an operator reads together before reordering
  topic.yaml (reference main.go:595-597 gives no way to see either).

Scale discipline: every query here is one narrow corpus scan folded
into a single aggregate row (conditional sums / count-distincts),
unstacked in-plan to its few output rows — zero joins on the fact,
zero Python, zero second scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions import text as X
from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.sources.tables import load_table

#: Prefix length (chars) for the snapshot-overlap screen.
PREFIX_CHARS = 64

#: The funnel's gate chain — MUST stay in lockstep with
#: ``prep_survivors`` (plans/text.py): same thresholds, same order.
FUNNEL_STAGES = ("raw", "len_ge_20w", "alpha_gt_0.6", "lang_en", "exact_dedup")


def _gate_funnel_sql() -> str:
    return f"""
    WITH scored AS (
      SELECT doc_id,
             {X.word_count_sql('text')} AS n_words,
             {X.alpha_ratio_sql('text')} AS alpha_ratio,
             {X.lang_id_sql('text')} AS pred_lang,
             {X.bag_fingerprint_sql('text')} AS bag_fp
      FROM documents
    ),
    agg AS (
      SELECT count(*)::BIGINT AS c0,
             sum(CASE WHEN n_words >= 20 THEN 1 ELSE 0 END)::BIGINT AS c1,
             sum(CASE WHEN n_words >= 20 AND alpha_ratio > 0.6
                      THEN 1 ELSE 0 END)::BIGINT AS c2,
             sum(CASE WHEN n_words >= 20 AND alpha_ratio > 0.6
                       AND pred_lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS c3,
             count(DISTINCT CASE WHEN n_words >= 20 AND alpha_ratio > 0.6
                                  AND pred_lang = 'en'
                                 THEN bag_fp END)::BIGINT AS c4
      FROM scored
    )
    SELECT 0 AS stage, '{FUNNEL_STAGES[0]}' AS gate, c0 AS survivors,
           0::BIGINT AS dropped_here FROM agg
    UNION ALL SELECT 1, '{FUNNEL_STAGES[1]}', c1, (c0 - c1)::BIGINT FROM agg
    UNION ALL SELECT 2, '{FUNNEL_STAGES[2]}', c2, (c1 - c2)::BIGINT FROM agg
    UNION ALL SELECT 3, '{FUNNEL_STAGES[3]}', c3, (c2 - c3)::BIGINT FROM agg
    UNION ALL SELECT 4, '{FUNNEL_STAGES[4]}', c4, (c3 - c4)::BIGINT FROM agg
    """


@query("pipeline_gate_funnel", oracle=_gate_funnel_sql)
def pipeline_gate_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-by-gate survivor funnel of the training-prep pipeline:
    raw → word-count floor → alphabetic-ratio floor → language gate →
    exact dedup, each stage CUMULATIVE (the same thresholds, order,
    and fingerprint ``prep_survivors`` applies), with per-stage drop
    attribution. ``pipeline_training_prep`` ships the survivors; this
    is the report that says WHY the other 40% died — the first chart
    on any curation dashboard.

    Scale: all five counters fold in ONE scan — four conditional sums
    plus one conditional count-distinct on the fingerprint — then
    unstack to 5 rows from the single aggregate row; no rescans, no
    joins, no window (stage 4 counts distinct fingerprints instead of
    materializing the keep-first winner set, which is the same number
    by construction)."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        X.word_count(F.col("text")).alias("n_words"),
        X.alpha_ratio(F.col("text")).alias("alpha_ratio"),
        X.lang_id(F.col("text")).alias("pred_lang"),
        X.bag_fingerprint(F.col("text")).alias("bag_fp"),
    )
    g1 = F.col("n_words") >= 20
    g2 = g1 & (F.col("alpha_ratio") > 0.6)
    g3 = g2 & (F.col("pred_lang") == "en")
    agg = scored.agg(
        F.count(F.lit(1)).cast("long").alias("c0"),
        F.sum(F.when(g1, 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(g2, 1).otherwise(0)).cast("long").alias("c2"),
        F.sum(F.when(g3, 1).otherwise(0)).cast("long").alias("c3"),
        F.countDistinct(F.when(g3, F.col("bag_fp")))
        .cast("long")
        .alias("c4"),
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage"),
                F.lit(FUNNEL_STAGES[i]).alias("gate"),
                F.col(f"c{i}").alias("survivors"),
                (
                    (F.col(f"c{i - 1}") - F.col(f"c{i}"))
                    if i
                    else F.lit(0).cast("long")
                ).alias("dropped_here"),
            )
            for i in range(5)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select(
        F.col("r.stage").cast("int").alias("stage"),
        F.col("r.gate").alias("gate"),
        F.col("r.survivors").cast("long").alias("survivors"),
        F.col("r.dropped_here").cast("long").alias("dropped_here"),
    )


@query(
    "text_doc_prefix_dup",
    oracle=f"""
    WITH pref AS (
      SELECT doc_id, source,
             md5(substr(text, 1, {PREFIX_CHARS})) AS pfx
      FROM documents
    ),
    grp AS (
      SELECT pfx, count(*)::BIGINT AS n FROM pref GROUP BY 1
    ),
    j AS (
      SELECT p.source, g.n FROM pref p JOIN grp g USING (pfx)
    )
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::BIGINT
             AS docs_in_dup_groups,
           round(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS prefix_dup_rate
    FROM j GROUP BY 1
    """,
)
def text_doc_prefix_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-overlap screen: per source, documents whose first
    {PREFIX_CHARS} characters collide with another document's. Crawl
    re-snapshots and truncation variants share prefixes while failing
    full-text exact dedup — a high prefix-dup rate with a low exact-dup
    rate is the classic "same page, different cutoff" signature that
    says run span-level dedup (``dedup_substring_spans``) on that feed.

    Scale: one md5 per document (narrow), one hash aggregate on the
    prefix key, and a group-size join back on the SAME key (shuffle
    partitioning reused); md5 keys spread uniformly so no skew
    defense is needed."""
    d = load_table(spark, sf_dir, "documents")
    pref = d.select(
        "source",
        F.md5(F.substring("text", 1, PREFIX_CHARS)).alias("pfx"),
    )
    grp = pref.groupBy("pfx").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    j = pref.join(grp, "pfx")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
        .cast("long")
        .alias("docs_in_dup_groups"),
        stable_round(
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("prefix_dup_rate"),
    )


def _rule_overlap_sql() -> str:
    """Pairwise match-overlap counters over the documents router
    program, single-pass (the ``_masking_oracle`` discipline)."""
    from kafka_go_streamer_spark.plans.routing_queries import DOCS_SPLITER

    splits = DOCS_SPLITER.resolved_splits()
    conds = []
    for rs in splits:
        pat = rs.pattern.replace("'", "''")
        if rs.use_regex:
            conds.append(f"regexp_matches(text, '{pat}')")
        else:
            conds.append(f"position('{pat}' in text) > 0")
    sums = [
        f"sum(CASE WHEN {c} THEN 1 ELSE 0 END)::BIGINT AS m{i}"
        for i, c in enumerate(conds)
    ]
    rows = []
    for i in range(len(conds)):
        for jj in range(i + 1, len(conds)):
            sums.append(
                f"sum(CASE WHEN ({conds[i]}) AND ({conds[jj]})"
                f" THEN 1 ELSE 0 END)::BIGINT AS b{i}_{jj}"
            )
            pi = splits[i].pattern.replace("'", "''")
            pj = splits[jj].pattern.replace("'", "''")
            rows.append(
                f"SELECT {i + 1} AS idx_a, {jj + 1} AS idx_b,"
                f" '{pi}' AS pattern_a, '{pj}' AS pattern_b,"
                f" m{i} AS n_match_a, m{jj} AS n_match_b,"
                f" b{i}_{jj} AS n_both,"
                f" round(b{i}_{jj} * 1.0"
                f" / nullif(m{i} + m{jj} - b{i}_{jj}, 0), 6)"
                f" AS overlap_jaccard FROM m"
            )
    return (
        "WITH m AS (SELECT "
        + ", ".join(sums)
        + " FROM documents) "
        + " UNION ALL ".join(rows)
    )


@query("route_rule_coverage_overlap", oracle=_rule_overlap_sql)
def route_rule_coverage_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise pattern-overlap matrix of the documents router: for
    every split pair (i, j), how many messages match BOTH extractors,
    with the match-set Jaccard. ``route_masking_analysis`` quantifies
    what first-match-wins costs each split; this shows WHERE that cost
    comes from — the specific pattern pairs competing for the same
    traffic (overlap ≈ 0 pairs can be reordered freely; high-overlap
    pairs are where reordering topic.yaml changes routing). Built from
    the SAME compiled Spliter as the production router.

    Scale: all k + k(k-1)/2 counters fold in ONE narrow scan (a single
    aggregate row), then unstack to the pair rows from that 1-row
    frame — no rescans, no joins."""
    from kafka_go_streamer_spark.plans.routing_queries import DOCS_SPLITER

    splits = DOCS_SPLITER.resolved_splits()
    conds = []
    for rs in splits:
        if rs.use_regex:
            conds.append(F.col("text").rlike(rs.pattern))
        else:
            conds.append(F.col("text").contains(rs.pattern))
    d = load_table(spark, sf_dir, "documents")
    aggs = [
        F.sum(F.when(c, 1).otherwise(0)).cast("long").alias(f"m{i}")
        for i, c in enumerate(conds)
    ]
    pair_idx = []
    for i in range(len(conds)):
        for jj in range(i + 1, len(conds)):
            aggs.append(
                F.sum(F.when(conds[i] & conds[jj], 1).otherwise(0))
                .cast("long")
                .alias(f"b{i}_{jj}")
            )
            pair_idx.append((i, jj))
    m = d.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("idx_a"),
                F.lit(jj + 1).alias("idx_b"),
                F.lit(splits[i].pattern).alias("pattern_a"),
                F.lit(splits[jj].pattern).alias("pattern_b"),
                F.col(f"m{i}").alias("n_match_a"),
                F.col(f"m{jj}").alias("n_match_b"),
                F.col(f"b{i}_{jj}").alias("n_both"),
            )
            for i, jj in pair_idx
        ]
    )
    return m.select(F.explode(rows).alias("r")).select(
        F.col("r.idx_a").cast("int").alias("idx_a"),
        F.col("r.idx_b").cast("int").alias("idx_b"),
        "r.pattern_a",
        "r.pattern_b",
        F.col("r.n_match_a").cast("long").alias("n_match_a"),
        F.col("r.n_match_b").cast("long").alias("n_match_b"),
        F.col("r.n_both").cast("long").alias("n_both"),
        stable_round(
            F.col("r.n_both")
            * 1.0
            / F.nullif(
                F.col("r.n_match_a")
                + F.col("r.n_match_b")
                - F.col("r.n_both"),
                F.lit(0),
            ),
            6,
        ).alias("overlap_jaccard"),
    )
