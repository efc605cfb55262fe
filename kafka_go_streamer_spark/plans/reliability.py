"""Round-13 wave 2: reliability & sizing audits — the
measured-vs-analytic tables and capacity worksheets an operator reads
before trusting a sketch geometry, a privacy release, a gate cascade,
a routing config, or a consumer fleet size.

* ``route_unmatched_by_source`` — dead-letter triage for the
  reference's core operator: per document source, how much traffic
  lands in the unmatched topic or is dropped (matched-but-no-writer,
  reference main.go:409-417 vs main.go:460-463). The first table an
  operator opens when the dead-letter topic starts filling: WHICH
  feed changed shape.

* ``quality_gate_ablation`` — leave-one-out attribution for the
  training-prep gate cascade (word-count / alpha-ratio / language /
  exact-dup — the same thresholds ``prep_survivors`` ships): per
  gate, total failures and UNIQUE failures (docs no other gate would
  catch). ``pipeline_gate_funnel`` shows the cumulative waterfall,
  which hides redundancy; this is the table that says which gate
  could be dropped for free.

* ``privacy_l_diversity`` — l-diversity companion to
  ``privacy_k_anonymity``: under the (lang, length-bin)
  quasi-identifier, how many equivalence classes expose fewer than
  l distinct values of the sensitive attribute (source) — k-anonymity
  bounds re-identification, l-diversity bounds attribute disclosure.

* ``sketch_bloom_fpr_curve`` — Bloom sizing curve: measured
  false-positive rate vs the analytic (1-(1-1/m)^{kn})^k at three
  filter widths, same allowlist and hash family as
  ``sketch_bloom_filter_probe``. The table that picks m for a runtime
  join filter instead of folklore.

* ``sketch_cms_error_profile`` — Count-Min width curve: estimate
  error on the true heavy hitters at three widths (d=4 rows, the
  ``sketch_countmin_heavy_users`` hash family), against the eN/w
  envelope. CMS only ever overcounts; this measures by how much, per
  width, on real traffic.

* ``events_capacity_backlog_plan`` — consumer-fleet sizing: replay
  the hourly arrival series against a capacity grid (80/100/150% of
  mean rate) through the Lindley backlog recurrence
  b_t = max(0, b_{t-1} + a_t - c) — peak backlog, congested hours,
  delay mass, end-of-horizon drain. The reference sizes its consumer
  by hand (one goroutine per spliter, main.go); this is the
  measurement that justifies a parallelism choice.

* ``text_tail_index_hill`` — Hill tail-index of the word-frequency
  distribution from the top-K order statistics: the
  heavier-or-lighter-than-Zipf verdict that complements
  ``text_zipf_slope``'s OLS fit (the OLS reads the whole top-1000
  curve; Hill reads the extreme tail where tokenizer decisions
  actually bite).

Scale discipline: every measured-vs-analytic table probes a BOUNDED
frame (bloom bit-sets ≤ m rows, CMS counter frames ≤ d x w rows, the
heavy-hitter panel is a TakeOrdered top-20, the Hill frame a
TakeOrdered top-(K+1)); the backlog recurrence runs its windows on
the hour spine (≤ horizon rows, generated — zero-traffic hours drain
capacity too), partitioned by capacity factor; ablation's only
window is partitioned by the duplicate fingerprint. No global sorts,
no cartesians (grid fans are Generates or broadcast binds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions import text as X
from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.plans.text import (
    PREP_LANG,
    PREP_MIN_ALPHA,
    PREP_MIN_WORDS,
)
from kafka_go_streamer_spark.routing import route, routing_case_sql
from kafka_go_streamer_spark.sources.tables import load_table

#: Bloom width grid (bits) for the sizing curve; BLOOM_K and the
#: allowlist predicate come from plans/sketches.py so the curve and
#: the single-config probe can never use different hash families.
BLOOM_M_GRID = (512, 2048, 8192)

#: Count-Min width grid (columns per row, d = CMS_D rows).
CMS_W_GRID = (256, 1024, 4096)
#: Heavy-hitter panel size for the CMS error probe.
CMS_TOP_N = 20

#: Capacity grid for the backlog plan, in percent of the mean hourly
#: arrival rate (integer percents keep the capacity arithmetic exact
#: across engines).
CAP_FACTORS_PCT = (80, 100, 150)

#: Hill estimator order-statistic count (uses the top K+1 counts).
#: Sized to the synthetic fixtures' small generator vocabulary (~31
#: types at sf0.001/sf0.01); production corpora raise this with the
#: same TakeOrdered plan shape.
HILL_K = 20

#: l-diversity thresholds (distinct sensitive values per QI class).
L_DIV_GRID = (2, 3, 5)


# ------------------------------------------------- route_unmatched_by_source
def _route_by_source_sql() -> str:
    from kafka_go_streamer_spark.plans.routing_queries import DOCS_SPLITER

    case = routing_case_sql(DOCS_SPLITER, "text")
    return f"""
    WITH routed AS (
      SELECT source, coalesce({case}, '__dropped__') AS topic
      FROM documents
    )
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN topic = 'docs-unmatched' THEN 1 ELSE 0 END)::BIGINT
             AS n_unmatched,
           sum(CASE WHEN topic = '__dropped__' THEN 1 ELSE 0 END)::BIGINT
             AS n_dropped,
           round(sum(CASE WHEN topic = 'docs-unmatched' THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS unmatched_share
    FROM routed GROUP BY source
    """


@query("route_unmatched_by_source", oracle=_route_by_source_sql)
def route_unmatched_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dead-letter triage by feed: the docs routing program
    (DOCS_SPLITER — the same object every other routing query derives
    from) applied with the document ``source`` carried through, per
    source reporting unmatched and dropped counts and the unmatched
    share. In the reference, unmatched volume is only visible as an
    aggregate counter on the dead-letter topic; carrying provenance
    through the router is what turns "the dead-letter is filling" into
    "feed X changed its log format" (main.go:460-463 is the unmatched
    arm; main.go:409-417 the matched-but-no-writer drop).

    Scale: the router stays a narrow case-when projection (zero
    shuffles); the only exchange is the final source-cardinality
    aggregate."""
    from kafka_go_streamer_spark.plans.routing_queries import DOCS_SPLITER

    d = load_table(spark, sf_dir, "documents")
    msgs = d.select("source", F.col("text").alias("value"))
    routed = route(msgs, DOCS_SPLITER).select(
        "source",
        F.coalesce(F.col("topic"), F.lit("__dropped__")).alias("topic"),
    )
    return routed.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("topic") == "docs-unmatched", 1).otherwise(0))
        .cast("long")
        .alias("n_unmatched"),
        F.sum(F.when(F.col("topic") == "__dropped__", 1).otherwise(0))
        .cast("long")
        .alias("n_dropped"),
        stable_round(
            F.sum(F.when(F.col("topic") == "docs-unmatched", 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("unmatched_share"),
    )


# ----------------------------------------------------- quality_gate_ablation
def _gate_ablation_sql() -> str:
    return f"""
    WITH scored AS (
      SELECT doc_id,
             {X.word_count_sql('text')} AS n_words,
             {X.alpha_ratio_sql('text')} AS alpha_ratio,
             {X.lang_id_sql('text')} AS pred_lang,
             {X.bag_fingerprint_sql('text')} AS bag_fp
      FROM documents
    ),
    flagged AS (
      SELECT CASE WHEN n_words < {PREP_MIN_WORDS}
                  THEN 1 ELSE 0 END AS f_words,
             CASE WHEN alpha_ratio <= {PREP_MIN_ALPHA}
                  THEN 1 ELSE 0 END AS f_alpha,
             CASE WHEN pred_lang <> '{PREP_LANG}'
                  THEN 1 ELSE 0 END AS f_lang,
             CASE WHEN rn > 1 THEN 1 ELSE 0 END AS f_dup
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY bag_fp ORDER BY doc_id
        ) AS rn FROM scored
      )
    ),
    agg AS (
      SELECT count(*) AS n,
        sum(f_words) AS fw,
        sum(CASE WHEN f_words = 1 AND f_alpha + f_lang + f_dup = 0
                 THEN 1 ELSE 0 END) AS uw,
        sum(f_alpha) AS fa,
        sum(CASE WHEN f_alpha = 1 AND f_words + f_lang + f_dup = 0
                 THEN 1 ELSE 0 END) AS ua,
        sum(f_lang) AS fl,
        sum(CASE WHEN f_lang = 1 AND f_words + f_alpha + f_dup = 0
                 THEN 1 ELSE 0 END) AS ul,
        sum(f_dup) AS fd,
        sum(CASE WHEN f_dup = 1 AND f_words + f_alpha + f_lang = 0
                 THEN 1 ELSE 0 END) AS ud
      FROM flagged
    )
    SELECT 'words' AS gate, fw::BIGINT AS n_fail,
           uw::BIGINT AS n_fail_unique,
           round(fw * 1.0 / n, 6) AS fail_share,
           round(uw * 1.0 / n, 6) AS unique_share FROM agg
    UNION ALL SELECT 'alpha', fa::BIGINT, ua::BIGINT,
           round(fa * 1.0 / n, 6), round(ua * 1.0 / n, 6) FROM agg
    UNION ALL SELECT 'lang', fl::BIGINT, ul::BIGINT,
           round(fl * 1.0 / n, 6), round(ul * 1.0 / n, 6) FROM agg
    UNION ALL SELECT 'dup', fd::BIGINT, ud::BIGINT,
           round(fd * 1.0 / n, 6), round(ud * 1.0 / n, 6) FROM agg
    """


@query("quality_gate_ablation", oracle=_gate_ablation_sql)
def quality_gate_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out gate attribution for the training-prep cascade:
    per gate (word-count floor, alpha-ratio floor, English language,
    exact-duplicate — the SAME thresholds ``prep_survivors`` ships),
    how many documents fail it at all and how many fail ONLY it (no
    other gate would catch them). A gate with large n_fail but
    near-zero n_fail_unique is redundant — it can be dropped from the
    cascade for free; unique_share ranks the gates by irreplaceable
    contribution. ``pipeline_gate_funnel``'s cumulative waterfall
    cannot distinguish the two (an early gate absorbs all shared
    failures). The dup flag is corpus-level (bag-fingerprint
    duplicate, doc_id-min canonical), independent of the other gates'
    outcomes — the ablation semantics, documented here.

    Scale: scoring is one narrow projection; the only window is
    partitioned by the duplicate fingerprint (bounded by duplicate
    group size); the 16 counters collapse in ONE aggregate row fanned
    to 4 output rows — the corpus is scanned once."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        X.word_count(F.col("text")).alias("n_words"),
        X.alpha_ratio(F.col("text")).alias("alpha_ratio"),
        X.lang_id(F.col("text")).alias("pred_lang"),
        X.bag_fingerprint(F.col("text")).alias("bag_fp"),
    )
    rn = F.row_number().over(
        Window.partitionBy("bag_fp").orderBy(F.col("doc_id").asc())
    )
    flagged = scored.withColumn("rn", rn).select(
        F.when(F.col("n_words") < PREP_MIN_WORDS, 1)
        .otherwise(0)
        .alias("f_words"),
        F.when(F.col("alpha_ratio") <= PREP_MIN_ALPHA, 1)
        .otherwise(0)
        .alias("f_alpha"),
        F.when(F.col("pred_lang") != PREP_LANG, 1)
        .otherwise(0)
        .alias("f_lang"),
        F.when(F.col("rn") > 1, 1).otherwise(0).alias("f_dup"),
    )
    others = {
        "f_words": ("f_alpha", "f_lang", "f_dup"),
        "f_alpha": ("f_words", "f_lang", "f_dup"),
        "f_lang": ("f_words", "f_alpha", "f_dup"),
        "f_dup": ("f_words", "f_alpha", "f_lang"),
    }
    aggs = [F.count(F.lit(1)).alias("n")]
    for flag, rest in others.items():
        aggs.append(F.sum(flag).alias(f"t_{flag}"))
        only = (F.col(flag) == 1) & (
            sum(F.col(o) for o in rest) == F.lit(0)
        )
        aggs.append(
            F.sum(F.when(only, 1).otherwise(0)).alias(f"u_{flag}")
        )
    one = flagged.agg(*aggs)
    names = {
        "f_words": "words",
        "f_alpha": "alpha",
        "f_lang": "lang",
        "f_dup": "dup",
    }
    fan = one.select(
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(label).alias("gate"),
                        F.col(f"t_{flag}").alias("t"),
                        F.col(f"u_{flag}").alias("u"),
                    )
                    for flag, label in names.items()
                ]
            )
        ).alias("g"),
    )
    return fan.select(
        F.col("g.gate").alias("gate"),
        F.col("g.t").cast("long").alias("n_fail"),
        F.col("g.u").cast("long").alias("n_fail_unique"),
        stable_round(F.col("g.t") * 1.0 / F.col("n"), 6).alias("fail_share"),
        stable_round(F.col("g.u") * 1.0 / F.col("n"), 6).alias(
            "unique_share"
        ),
    )


# ------------------------------------------------------- privacy_l_diversity
def _l_diversity_sql() -> str:
    from kafka_go_streamer_spark.plans.audit_ops import QI_LEN_BIN

    vals = ", ".join(f"({v})" for v in L_DIV_GRID)
    return f"""
    WITH classes AS (
      SELECT lang, n_chars // {QI_LEN_BIN} AS len_bin,
             count(DISTINCT source) AS l, count(*) AS n
      FROM documents GROUP BY 1, 2
    ),
    grid AS (SELECT l_min FROM (VALUES {vals}) t(l_min))
    SELECT l_min,
           sum(CASE WHEN l < l_min THEN 1 ELSE 0 END)::BIGINT
             AS n_classes_below,
           sum(CASE WHEN l < l_min THEN n ELSE 0 END)::BIGINT
             AS n_docs_below,
           round(sum(CASE WHEN l < l_min THEN n ELSE 0 END) * 1.0
                 / sum(n), 6) AS doc_share
    FROM classes CROSS JOIN grid
    GROUP BY l_min
    """


@query("privacy_l_diversity", oracle=_l_diversity_sql)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity screen under the (lang, length-bin)
    quasi-identifier with ``source`` as the sensitive attribute: per
    threshold l ∈ L_DIV_GRID, the equivalence classes exposing fewer
    than l distinct sources and the documents inside them.
    ``privacy_k_anonymity`` bounds WHO a row could be; this bounds
    WHAT a re-identified class reveals — a class can be k-anonymous
    and still leak its attribute when every member shares one source
    (the homogeneity attack l-diversity exists to catch).

    Scale: the corpus collapses to its QI classes in one aggregate
    (count-distinct on the bounded source domain); the l-grid fans
    the CLASS frame only."""
    from kafka_go_streamer_spark.plans.audit_ops import QI_LEN_BIN

    d = load_table(spark, sf_dir, "documents")
    classes = d.groupBy(
        "lang", F.expr(f"n_chars div {QI_LEN_BIN}").alias("len_bin")
    ).agg(
        F.countDistinct("source").alias("l"),
        F.count(F.lit(1)).alias("n"),
    )
    fan = classes.withColumn(
        "l_min", F.explode(F.array(*[F.lit(v) for v in L_DIV_GRID]))
    )
    below = F.col("l") < F.col("l_min")
    return fan.groupBy("l_min").agg(
        F.sum(F.when(below, 1).otherwise(0))
        .cast("long")
        .alias("n_classes_below"),
        F.sum(F.when(below, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_docs_below"),
        stable_round(
            F.sum(F.when(below, F.col("n")).otherwise(0))
            * 1.0
            / F.sum("n"),
            6,
        ).alias("doc_share"),
    )


# ---------------------------------------------------- sketch_bloom_fpr_curve
def _bloom_fpr_sql() -> str:
    from kafka_go_streamer_spark.plans.sketches import (
        BLOOM_ACCTBAL,
        BLOOM_K,
    )

    mvals = ", ".join(f"({m})" for m in BLOOM_M_GRID)
    kvals = ", ".join(f"({k})" for k in range(BLOOM_K))
    pos = (
        "(('0x' || substr(md5(c_custkey::VARCHAR), 8 * k + 1, 8))::BIGINT"
        " % m)"
    )
    return f"""
    WITH members AS (
      SELECT c_custkey FROM customer WHERE c_acctbal > {BLOOM_ACCTBAL}
    ),
    grid AS (SELECT m FROM (VALUES {mvals}) t(m)),
    ks AS (SELECT k FROM (VALUES {kvals}) t(k)),
    bits AS (
      SELECT DISTINCT m, {pos} AS pos
      FROM members, grid, ks
    ),
    nb AS (SELECT m, count(*) AS bits_set FROM bits GROUP BY m),
    nm AS (SELECT count(*) AS n_members FROM members),
    probes AS (
      SELECT c.c_custkey, (c.c_acctbal > {BLOOM_ACCTBAL}) AS is_member,
             m, k, {pos} AS pos
      FROM customer c, grid, ks
    ),
    hits AS (
      SELECT p.m, p.c_custkey, p.is_member,
             sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS nhit
      FROM probes p LEFT JOIN bits b ON p.m = b.m AND p.pos = b.pos
      GROUP BY 1, 2, 3
    ),
    agg AS (
      SELECT m,
             sum(CASE WHEN NOT is_member THEN 1 ELSE 0 END) AS n_nonmembers,
             sum(CASE WHEN nhit = {BLOOM_K} AND NOT is_member
                      THEN 1 ELSE 0 END) AS n_fp
      FROM hits GROUP BY m
    )
    SELECT a.m::INTEGER AS m_bits,
           nm.n_members::BIGINT AS n_members,
           nb.bits_set::BIGINT AS bits_set,
           round(nb.bits_set * 1.0 / a.m, 6) AS fill_ratio,
           n_fp::BIGINT AS n_false_pos,
           CASE WHEN n_nonmembers > 0
                THEN round(n_fp * 1.0 / n_nonmembers, 6)
           END AS fpr_measured,
           round(pow(1.0 - pow(1.0 - 1.0 / a.m,
                               {BLOOM_K}.0 * nm.n_members),
                     {BLOOM_K}), 6) AS fpr_analytic,
           CASE WHEN n_nonmembers > 0
                THEN round(n_fp * 1.0 / n_nonmembers
                     - pow(1.0 - pow(1.0 - 1.0 / a.m,
                                     {BLOOM_K}.0 * nm.n_members),
                           {BLOOM_K}), 6)
           END AS gap
    FROM agg a JOIN nb ON nb.m = a.m CROSS JOIN nm
    """


@query("sketch_bloom_fpr_curve", oracle=_bloom_fpr_sql)
def sketch_bloom_fpr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter sizing curve: for each width m in BLOOM_M_GRID
    (k and the allowlist shared with ``sketch_bloom_filter_probe``),
    the filter's fill ratio, the MEASURED false-positive rate over all
    non-member probes, and the analytic (1-(1-1/m)^{kn})^k — the
    evidence that the md5-slice hash family actually delivers the
    textbook rate, and the curve that picks m for a runtime join
    filter (too small: the 512-bit row shows the saturation cliff;
    too big: the 8192-bit row prices wasted broadcast bytes).

    Scale: per width the bit set is ≤ m DISTINCT rows (broadcast to
    the probe side); the probe scan fans a constant m-grid x k and
    collapses per (m, key) — one scan of the probe table, no
    shuffle of it beyond the per-key hit count."""
    from kafka_go_streamer_spark.plans.sketches import (
        BLOOM_ACCTBAL,
        BLOOM_K,
    )

    cust = load_table(spark, sf_dir, "customer")
    key = F.col("c_custkey").cast("string")

    def pos(k_col):
        return (
            F.conv(
                F.expr(
                    "substring(md5(cast(c_custkey as string)), "
                    "8 * k + 1, 8)"
                ),
                16,
                10,
            ).cast("long")
            % F.col("m")
        )

    m_fan = F.explode(F.array(*[F.lit(m) for m in BLOOM_M_GRID])).alias("m")
    k_fan = F.explode(F.array(*[F.lit(k) for k in range(BLOOM_K)])).alias(
        "k"
    )
    members = cust.filter(F.col("c_acctbal") > BLOOM_ACCTBAL).select(
        "c_custkey"
    )
    bits = (
        members.select("c_custkey", m_fan)
        .select("c_custkey", "m", k_fan)
        .select("m", pos(None).alias("pos"))
        .distinct()
    )
    nb = bits.groupBy("m").agg(F.count(F.lit(1)).alias("bits_set"))
    nm = members.agg(F.count(F.lit(1)).alias("n_members"))
    probes = (
        cust.select(
            "c_custkey",
            (F.col("c_acctbal") > BLOOM_ACCTBAL).alias("is_member"),
        )
        .select("c_custkey", "is_member", m_fan)
        .select("c_custkey", "is_member", "m", k_fan)
        .select("c_custkey", "is_member", "m", pos(None).alias("pos"))
    )
    hits = (
        probes.join(
            F.broadcast(bits.withColumn("hit", F.lit(1))), ["m", "pos"], "left"
        )
        .groupBy("m", "c_custkey", "is_member")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("nhit"))
    )
    agg = hits.groupBy("m").agg(
        F.sum(F.when(~F.col("is_member"), 1).otherwise(0)).alias(
            "n_nonmembers"
        ),
        F.sum(
            F.when(
                (F.col("nhit") == BLOOM_K) & (~F.col("is_member")), 1
            ).otherwise(0)
        ).alias("n_fp"),
    )
    joined = (
        agg.join(F.broadcast(nb), "m")
        .crossJoin(F.broadcast(nm))
    )
    analytic = F.pow(
        F.lit(1.0)
        - F.pow(
            F.lit(1.0) - F.lit(1.0) / F.col("m"),
            F.lit(float(BLOOM_K)) * F.col("n_members"),
        ),
        F.lit(BLOOM_K),
    )
    return joined.select(
        F.col("m").cast("int").alias("m_bits"),
        F.col("n_members").cast("long").alias("n_members"),
        F.col("bits_set").cast("long").alias("bits_set"),
        stable_round(F.col("bits_set") * 1.0 / F.col("m"), 6).alias(
            "fill_ratio"
        ),
        F.col("n_fp").cast("long").alias("n_false_pos"),
        # n_nonmembers == 0 (every key above the allowlist cut at some
        # SF/fixture): NULL on both engines instead of Spark-NULL vs
        # DuckDB division error (ADVICE r13)
        F.when(
            F.col("n_nonmembers") > 0,
            stable_round(F.col("n_fp") * 1.0 / F.col("n_nonmembers"), 6),
        ).alias("fpr_measured"),
        stable_round(analytic, 6).alias("fpr_analytic"),
        F.when(
            F.col("n_nonmembers") > 0,
            stable_round(
                F.col("n_fp") * 1.0 / F.col("n_nonmembers") - analytic, 6
            ),
        ).alias("gap"),
    )


# --------------------------------------------------- sketch_cms_error_profile
def _cms_error_sql() -> str:
    from kafka_go_streamer_spark.plans.sketches import CMS_D

    wvals = ", ".join(f"({w})" for w in CMS_W_GRID)
    dvals = ", ".join(f"({d})" for d in range(CMS_D))
    bucket = (
        "(('0x' || substr(md5(user_id::VARCHAR), 8 * d + 1, 8))::BIGINT"
        " % w)"
    )
    return f"""
    WITH grid AS (SELECT w FROM (VALUES {wvals}) t(w)),
    ds AS (SELECT d FROM (VALUES {dvals}) t(d)),
    cells AS (
      SELECT w, d, {bucket} AS col, count(*) AS cnt
      FROM events, grid, ds
      GROUP BY 1, 2, 3
    ),
    truth AS (
      SELECT user_id, count(*) AS true_count FROM events GROUP BY 1
    ),
    top AS (
      SELECT user_id, true_count FROM truth
      ORDER BY true_count DESC, user_id ASC LIMIT {CMS_TOP_N}
    ),
    probes AS (
      SELECT t.user_id, t.true_count, w, d, {bucket} AS col
      FROM top t, grid, ds
    ),
    est AS (
      SELECT p.w, p.user_id, p.true_count, min(c.cnt) AS est
      FROM probes p
      JOIN cells c ON p.w = c.w AND p.d = c.d AND p.col = c.col
      GROUP BY 1, 2, 3
    ),
    tot AS (SELECT count(*) AS n_events FROM events)
    SELECT w::INTEGER AS cms_width,
           count(*)::BIGINT AS n_probes,
           sum(CASE WHEN est = true_count THEN 1 ELSE 0 END)::BIGINT
             AS n_exact,
           round(avg((est - true_count) * 1.0 / true_count), 6)
             AS mean_rel_overcount,
           round(max((est - true_count) * 1.0 / true_count), 6)
             AS max_rel_overcount,
           round(2.718281828459045 * (SELECT n_events FROM tot) * 1.0
                 / w, 2) AS bound_e_n_over_w
    FROM est GROUP BY w
    """


@query("sketch_cms_error_profile", oracle=_cms_error_sql)
def sketch_cms_error_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Count-Min width curve: for each width w in CMS_W_GRID (d =
    CMS_D rows, the ``sketch_countmin_heavy_users`` md5-slice hash
    family), the estimate error on the TRUE top-{CMS_TOP_N} heavy
    users — exact-hit count, mean and max relative overcount — beside
    the classic eN/w error envelope. CMS never undercounts; this
    measures the overcount a width actually buys on real traffic,
    which is the number that picks w for a heavy-hitter dashboard
    (the 256-column row shows collision inflation; 4096 buys near-
    exactness at 16x the counters).

    Scale: counter frames are ≤ d x w rows per width (bounded,
    broadcastable); the probe panel is a TakeOrdered top-N; the
    events fact is scanned once with a constant w x d fan into
    map-side-combined counts — no shuffle of the fact beyond those
    bounded aggregates."""
    from kafka_go_streamer_spark.operators.iterate import pinned
    from kafka_go_streamer_spark.plans.sketches import CMS_D

    e = load_table(spark, sf_dir, "events")
    w_fan = F.explode(F.array(*[F.lit(w) for w in CMS_W_GRID])).alias("w")
    d_fan = F.explode(F.array(*[F.lit(d) for d in range(CMS_D)])).alias("d")
    bucket = (
        F.conv(
            F.expr("substring(md5(cast(user_id as string)), 8 * d + 1, 8)"),
            16,
            10,
        ).cast("long")
        % F.col("w")
    )
    # counters from the PER-USER count frame, not the raw fact: the
    # bucket depends only on (user_id, d), so hashing per (event, w, d)
    # did |w_grid| x d times the md5 work on events instead of d times
    # on distinct users; per-bucket counts are identical (sum of the
    # users' counts that land there)
    truth = pinned(
        e.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    )
    cells = (
        truth.select("user_id", "true_count", w_fan)
        .select("user_id", "true_count", "w", d_fan)
        .select("w", "d", bucket.alias("col"), "true_count")
        .groupBy("w", "d", "col")
        .agg(F.sum("true_count").alias("cnt"))
    )
    top = truth.orderBy(
        F.col("true_count").desc(), F.col("user_id").asc()
    ).limit(CMS_TOP_N)
    probes = (
        top.select("user_id", "true_count", w_fan)
        .select("user_id", "true_count", "w", d_fan)
        .select("user_id", "true_count", "w", "d", bucket.alias("col"))
    )
    est = (
        probes.join(F.broadcast(cells), ["w", "d", "col"])
        .groupBy("w", "user_id", "true_count")
        .agg(F.min("cnt").alias("est"))
    )
    tot = e.agg(F.count(F.lit(1)).alias("n_events"))
    rel = (F.col("est") - F.col("true_count")) * 1.0 / F.col("true_count")
    return (
        est.groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_probes"),
            F.sum(
                F.when(F.col("est") == F.col("true_count"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_exact"),
            stable_round(F.avg(rel), 6).alias("mean_rel_overcount"),
            stable_round(F.max(rel), 6).alias("max_rel_overcount"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("w").cast("int").alias("cms_width"),
            "n_probes",
            "n_exact",
            "mean_rel_overcount",
            "max_rel_overcount",
            stable_round(
                F.lit(2.718281828459045) * F.col("n_events") / F.col("w"),
                2,
            ).alias("bound_e_n_over_w"),
        )
    )


# ----------------------------------------------- events_capacity_backlog_plan
def _backlog_sql() -> str:
    fvals = ", ".join(f"({f})" for f in CAP_FACTORS_PCT)
    return f"""
    WITH hrs AS (
      SELECT epoch_us(ts) // 3600000000 AS h FROM events
    ),
    bounds AS (
      SELECT min(h) AS h0, max(h) AS h1, count(*) AS total FROM hrs
    ),
    counts AS (SELECT h, count(*) AS a FROM hrs GROUP BY h),
    spine AS (
      SELECT unnest(range(h0, h1 + 1)) AS h,
             h1 - h0 + 1 AS nh, total
      FROM bounds
    ),
    caps AS (SELECT f FROM (VALUES {fvals}) t(f)),
    grid AS (
      SELECT s.h, coalesce(c.a, 0) AS a, f,
             (s.total * f + 100 * s.nh - 1) // (100 * s.nh) AS cap
      FROM spine s LEFT JOIN counts c USING (h) CROSS JOIN caps
    ),
    c1 AS (
      SELECT f, cap, h, a,
             sum(a - cap) OVER (PARTITION BY f ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS st
      FROM grid
    ),
    c2 AS (
      SELECT *, least(min(st) OVER (PARTITION BY f ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS mt
      FROM c1
    ),
    b AS (SELECT f, cap, h, st - mt AS backlog FROM c2)
    SELECT f::INTEGER AS cap_factor_pct,
           max(cap)::BIGINT AS hourly_capacity,
           max(backlog)::BIGINT AS peak_backlog,
           sum(CASE WHEN backlog > 0 THEN 1 ELSE 0 END)::BIGINT
             AS hours_congested,
           round(sum(CASE WHEN backlog > 0 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS congested_share,
           sum(backlog)::BIGINT AS backlog_row_hours,
           max_by(backlog, h)::BIGINT AS end_backlog
    FROM b GROUP BY f
    """


@query("events_capacity_backlog_plan", oracle=_backlog_sql)
def events_capacity_backlog_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Consumer-fleet sizing worksheet: the hourly arrival series
    replayed through the Lindley backlog recurrence
    b_t = max(0, b_{t-1} + a_t - c) at three capacities (80/100/150%
    of the mean rate, integer-exact): peak backlog, congested hours,
    total delay mass (row-hours), and the end-of-horizon backlog that
    says whether the fleet ever drains. The closed form used here —
    b_t = S_t - min(0, min_{i<=t} S_i) with S the running sum of
    (a - c) — turns the recurrence into two prefix scans. The
    reference fixes one goroutine per spliter and a 10 s flush
    (main.go:439) and hopes; this is the table that sizes parallelism
    against measured arrivals before the backlog teaches it the hard
    way.

    Scale: the fact collapses to per-hour counts in one aggregate;
    the spine (every hour in the horizon, zero-traffic hours
    included — they drain capacity) is GENERATED, ≤ horizon length;
    all windows run on the spine frame partitioned by capacity
    factor. The fact is never sorted or windowed."""
    e = load_table(spark, sf_dir, "events")
    hrs = e.select(F.expr("unix_micros(ts) div 3600000000").alias("h"))
    bounds = hrs.agg(
        F.min("h").alias("h0"),
        F.max("h").alias("h1"),
        F.count(F.lit(1)).alias("total"),
    )
    counts = hrs.groupBy("h").agg(F.count(F.lit(1)).alias("a"))
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1")).alias("h"),
        (F.col("h1") - F.col("h0") + 1).alias("nh"),
        "total",
    )
    grid = (
        spine.join(counts, "h", "left")
        .select(
            "h",
            F.coalesce(F.col("a"), F.lit(0)).alias("a"),
            F.explode(
                F.array(*[F.lit(f) for f in CAP_FACTORS_PCT])
            ).alias("f"),
            "nh",
            "total",
        )
        .withColumn(
            "cap",
            F.expr("(total * f + 100 * nh - 1) div (100 * nh)"),
        )
    )
    w = (
        Window.partitionBy("f")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c1 = grid.withColumn("st", F.sum(F.col("a") - F.col("cap")).over(w))
    c2 = c1.withColumn("mt", F.least(F.min("st").over(w), F.lit(0)))
    b = c2.select(
        "f", "cap", "h", (F.col("st") - F.col("mt")).alias("backlog")
    )
    return b.groupBy("f").agg(
        F.max("cap").cast("long").alias("hourly_capacity"),
        F.max("backlog").cast("long").alias("peak_backlog"),
        F.sum(F.when(F.col("backlog") > 0, 1).otherwise(0))
        .cast("long")
        .alias("hours_congested"),
        stable_round(
            F.sum(F.when(F.col("backlog") > 0, 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("congested_share"),
        F.sum("backlog").cast("long").alias("backlog_row_hours"),
        F.max_by("backlog", "h").cast("long").alias("end_backlog"),
    ).select(
        F.col("f").cast("int").alias("cap_factor_pct"),
        "hourly_capacity",
        "peak_backlog",
        "hours_congested",
        "congested_share",
        "backlog_row_hours",
        "end_backlog",
    )


# ------------------------------------------------------- text_tail_index_hill
def _hill_sql() -> str:
    return f"""
    WITH freq AS (
      SELECT count(*) AS c
      FROM (SELECT unnest({X.words_sql('text')}) AS word FROM documents)
      GROUP BY word
    ),
    top AS (
      SELECT c, row_number() OVER (ORDER BY c DESC) AS r
      FROM (SELECT c FROM freq ORDER BY c DESC LIMIT {HILL_K + 1})
    ),
    cut AS (SELECT c AS xk1 FROM top WHERE r = {HILL_K + 1}),
    s AS (
      SELECT sum(ln(t.c * 1.0 / cut.xk1)) AS logsum
      FROM top t CROSS JOIN cut
      WHERE t.r <= {HILL_K}
    )
    SELECT {HILL_K}::INTEGER AS k,
           (SELECT xk1 FROM cut)::BIGINT AS tail_cut_count,
           round(CASE WHEN logsum > 0 THEN {HILL_K} * 1.0 / logsum
                      ELSE NULL END, 6) AS alpha_hill,
           round(-logsum / {HILL_K}, 6) AS implied_zipf_slope
    FROM s
    """


@query("text_tail_index_hill", oracle=_hill_sql)
def text_tail_index_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index of the word-frequency distribution from the top
    HILL_K order statistics: alpha = k / Σ ln(x_i / x_{k+1}) over the
    k most frequent words. The extreme-tail companion to
    ``text_zipf_slope``: the OLS slope averages the whole top-1000
    curve, while Hill reads only the head where a Pareto tail either
    holds (alpha ≈ 1/|zipf slope|) or breaks — template floods
    inflate the very top and show up here first.
    ``implied_zipf_slope`` (= -1/alpha) is directly comparable to the
    OLS slope's scale.

    Scale: the vocabulary frame collapses from one exploded scan; the
    order statistics come from ``orderBy().limit(K+1)`` —
    TakeOrderedAndProject, distributed heaps, never a global rank of
    the vocabulary (the r13 zipf discipline); everything after is a
    (K+1)-row frame."""
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(X.words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = (
        freq.select("c")
        .orderBy(F.col("c").desc())
        .limit(HILL_K + 1)
        .select(
            "c",
            F.row_number()
            .over(Window.orderBy(F.col("c").desc()))
            .alias("r"),
        )
    )
    cut = top.filter(F.col("r") == HILL_K + 1).select(
        F.col("c").alias("xk1")
    )
    s = (
        top.filter(F.col("r") <= HILL_K)
        .crossJoin(F.broadcast(cut))
        .agg(
            F.sum(F.log(F.col("c") * 1.0 / F.col("xk1"))).alias("logsum")
        )
    )
    return s.crossJoin(F.broadcast(cut)).select(
        F.lit(HILL_K).cast("int").alias("k"),
        F.col("xk1").cast("long").alias("tail_cut_count"),
        stable_round(
            F.when(
                F.col("logsum") > 0, F.lit(HILL_K) * 1.0 / F.col("logsum")
            ),
            6,
        ).alias("alpha_hill"),
        stable_round(-F.col("logsum") / HILL_K, 6).alias(
            "implied_zipf_slope"
        ),
    )
