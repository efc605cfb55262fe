"""Extended analytics surface: as-of join, range-band join, time-
hierarchy rollup, histogram, deterministic sampling, embedding
centroids, and dedup connected components.

These close out the operator families a training-data pipeline needs
beyond the core relational set; each docstring states the plan property
that matters at 100 TB. The reference engine (p53/kafka-go-streamer)
has none of these — its only operators are the routing set surveyed in
SURVEY.md §2.1 (main.go:348-651); this module is north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.operators.asof import asof_join
from kafka_go_streamer_spark.operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
    minhash_lsh_pairs_sql,
)
from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.sources.tables import load_table


@query(
    "join_asof_last_purchase",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, max(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT e.user_id, e.ts, e.event_id, e.event_type,
           round(p.purchase_value, 2) AS purchase_value_asof,
           p.ts AS matched_time
    FROM events e ASOF LEFT JOIN p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def join_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: annotate every event with the user's most recent
    purchase at-or-before the event time (DuckDB twin: native ASOF
    JOIN). Right side is pre-deduplicated to one row per (user, ts) so
    tie-breaking is deterministic on both engines.

    Scale: implemented as union + carry-forward window (operators/
    asof.py) — one shuffle on the key, no per-group pandas merge, no
    pairwise work; survives keys whose history doesn't fit one task."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.select("user_id", "ts", "event_id", "event_type")
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join(left, right, on="ts", by="user_id")
    return out.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        stable_round(F.col("purchase_value_asof"), 2).alias(
            "purchase_value_asof"
        ),
        "matched_time",
    )


#: As-of staleness bound for `join_asof_tolerance` (1 hour): a match
#: older than this is treated as no match — pd.merge_asof(tolerance=)
#: / kdb `wj` semantics.
ASOF_TOLERANCE_S = 3600


@query(
    "join_asof_tolerance",
    oracle=f"""
    WITH p AS (
      SELECT user_id, ts, max(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT e.user_id, e.ts, e.event_id,
           CASE WHEN p.ts IS NOT NULL
                 AND date_diff('second', p.ts, e.ts) <= {ASOF_TOLERANCE_S}
                THEN round(p.purchase_value, 2) END AS purchase_value_asof,
           CASE WHEN p.ts IS NOT NULL
                 AND date_diff('second', p.ts, e.ts) <= {ASOF_TOLERANCE_S}
                THEN p.ts END AS matched_time
    FROM events e ASOF LEFT JOIN p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance: an event's most recent
    purchase counts only if it happened within the last hour —
    ``pd.merge_asof(tolerance=...)`` / kdb window-join semantics, the
    form feature pipelines actually use ("value of X as of T, but not
    staler than d"). On the sf0.01 fixtures the bound bites hard
    (9,451 of 10,000 events have SOME prior purchase; 2,114 within
    the hour), so the tolerance path is genuinely exercised, not
    vacuously true.

    Scale: identical plan to ``join_asof_last_purchase`` — the
    tolerance is a post-window projection over the carried match
    struct (operators/asof.py), zero extra shuffles. Both engines
    compare whole-second differences of the same matched row."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.select("user_id", "ts", "event_id")
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join(
        left, right, on="ts", by="user_id",
        tolerance_seconds=ASOF_TOLERANCE_S,
    )
    return out.select(
        "user_id",
        "ts",
        "event_id",
        stable_round(F.col("purchase_value_asof"), 2).alias(
            "purchase_value_asof"
        ),
        "matched_time",
    )


#: (band_name, lo, hi) — deliberately non-uniform widths so the band
#: lookup is a genuine range join, not a computable bin.
QUANTITY_BANDS = [("low", 1.0, 10.0), ("mid", 10.0, 25.0), ("high", 25.0, 51.0)]


@query(
    "join_range_quantity_bands",
    oracle=f"""
    SELECT b.band_name, count(*) AS n,
           round(sum(l.l_extendedprice), 2) AS revenue
    FROM lineitem l
    JOIN (VALUES {", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in QUANTITY_BANDS)})
         b(band_name, lo, hi)
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.band_name
    """,
)
def join_range_quantity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: classify each lineitem into a non-uniform quantity
    band via interval containment, then aggregate revenue per band.

    Scale: the band table is broadcast, so the range predicate runs as
    a broadcast nested-loop over a HANDFUL of intervals — a narrow
    O(rows x bands) pass with zero shuffle of the fact table. (For
    uniform bands you'd compute the bin arithmetically; the general
    interval case is this pattern, with interval-binning to convert to
    an equi-join when the band list itself grows large.)"""
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        QUANTITY_BANDS, "band_name string, lo double, hi double"
    )
    return (
        li.join(
            F.broadcast(bands),
            (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi),
        )
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            stable_round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


@query(
    "agg_time_rollup_hierarchy",
    oracle="""
    SELECT year(ts)::INTEGER AS y, month(ts)::INTEGER AS m,
           day(ts)::INTEGER AS d,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events
    GROUP BY ROLLUP(y, m, d)
    """,
)
def agg_time_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-hierarchy rollup: one pass produces the
    day, month, year, and grand-total aggregates of the event stream
    (the continuous-aggregate cascade of a time-series store).

    Scale: ROLLUP computes all grains in a single shuffle with
    map-side partial aggregation — versus N separate groupBys reading
    the fact table N times."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
            "value",
        )
        .rollup("y", "m", "d")
        .agg(
            F.count(F.lit(1)).alias("n"),
            stable_round(F.sum("value"), 2).alias("total"),
        )
    )


HIST_BUCKET_WIDTH = 5000
HIST_MAX_BIN = 19


@query(
    "agg_histogram_prices",
    oracle=f"""
    SELECT least(floor(l_extendedprice / {HIST_BUCKET_WIDTH}),
                 {HIST_MAX_BIN})::INTEGER AS bin,
           count(*) AS n,
           round(min(l_extendedprice), 2) AS lo,
           round(max(l_extendedprice), 2) AS hi
    FROM lineitem
    GROUP BY 1
    """,
)
def agg_histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of extended price with a clamped overflow
    bin — the distribution-profiling primitive for data quality checks.

    Scale: bin id is computed arithmetically (no range join, no sort);
    one shuffle on ~20 bins with map-side combine, so cost is a single
    narrow scan regardless of corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    bin_col = F.least(
        F.floor(F.col("l_extendedprice") / HIST_BUCKET_WIDTH),
        F.lit(HIST_MAX_BIN),
    ).cast("int")
    return (
        li.groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            stable_round(F.min("l_extendedprice"), 2).alias("lo"),
            stable_round(F.max("l_extendedprice"), 2).alias("hi"),
        )
    )


@query(
    "sample_stratified_hash",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE substr(md5(o_orderkey::VARCHAR), 1, 1) IN ('0', '1')
    GROUP BY o_orderpriority
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/8 sample by key-hash prefix, summarized per
    stratum. Unlike TABLESAMPLE / rand(), the hash predicate is (a)
    reproducible across engines and runs, and (b) a pure row-local
    filter — it pushes into the scan, needs no state, and the same
    predicate selects the same sample on any cluster size, which is
    what makes hash sampling the standard for corpus-scale eval
    splits."""
    o = load_table(spark, sf_dir, "orders")
    sampled = o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin(
            "0", "1"
        )
    )
    return sampled.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        stable_round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "embedding_label_centroids",
    oracle="""
    SELECT label, pos, round(avg(v::DOUBLE), 6) AS centroid
    FROM (
      SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) - 1 AS pos
      FROM embeddings
    )
    GROUP BY label, pos
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column, element-wise — the
    building block for k-means-style IVF training and cluster-based
    corpus curation.

    Scale: posexplode fans rows x dims, then ONE hash aggregate on
    (label, pos) with map-side partial avg — no collect of vectors to
    the driver, no per-group pandas; dims are bounded (64) so the
    fan-out factor is a constant."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    )
    return exploded.groupBy("label", "pos").agg(
        stable_round(F.avg(F.col("v").cast("double")), 6).alias("centroid")
    )


@query(
    "dedup_connected_components",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      {minhash_lsh_pairs_sql("documents", "doc_id", "text", min_intersection=2)}
    ),
    e(a, b) AS (
      SELECT id_a, id_b FROM pairs UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.b, reach.r FROM e JOIN reach ON e.a = reach.id
    ),
    comp AS (SELECT id AS doc_id, min(r) AS component_id FROM reach GROUP BY id)
    SELECT doc_id, component_id,
           count(*) OVER (PARTITION BY component_id) AS component_size
    FROM comp
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate GROUPS from near-duplicate PAIRS: MinHash-LSH
    candidate pairs become graph edges; iterative min-label propagation
    (operators/dedup.py:connected_components) assigns every document
    the minimum doc-id of its connected component, plus the component
    size — the "keep one per cluster" step of corpus dedup.

    Oracle: DuckDB recursive CTE computing min over the transitive
    closure — same fixpoint, different engine mechanism."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", min_intersection=2)
    comp = connected_components(
        docs.select(F.col("doc_id").alias("id")),
        pairs.select("id_a", "id_b"),
    )
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("component_id"),
        F.count(F.lit(1))
        .over(Window.partitionBy("comp"))
        .alias("component_size"),
    )


@query(
    "dedup_cluster_manifest",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      {minhash_lsh_pairs_sql("documents", "doc_id", "text", min_intersection=2)}
    ),
    e(a, b) AS (
      SELECT id_a, id_b FROM pairs UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.b, reach.r FROM e JOIN reach ON e.a = reach.id
    ),
    comp AS (SELECT id AS doc_id, min(r) AS component_id FROM reach GROUP BY id)
    SELECT c.component_id AS canonical_doc,
           count(*)::BIGINT AS n_members,
           (count(*) - 1)::BIGINT AS n_dropped,
           sum(CASE WHEN d.doc_id <> c.component_id
                    THEN length(d.text) ELSE 0 END)::BIGINT AS bytes_dropped
    FROM comp c JOIN documents d USING (doc_id)
    GROUP BY c.component_id
    HAVING count(*) > 1
    """,
)
def dedup_cluster_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup MANIFEST a training pipeline materializes next to its
    kept corpus: one row per near-duplicate CLUSTER (size > 1) with the
    canonical (minimum-id) document, member count, and the byte volume
    the dedup pass removes — the artifact that answers "what did dedup
    cost us" at corpus scale, composed end-to-end from MinHash-LSH
    candidate pairs -> graph-contraction components -> accounting join.

    Scale shape: the components come from the contraction loop
    (operators/dedup.py — O(candidate pairs) per round, not corpus);
    the accounting is ONE equi-join of the assignment against the
    corpus and one map-side-combined aggregate on the component id.
    Singleton clusters (the overwhelming majority of a real corpus)
    are filtered by the HAVING before any of them shuffle twice."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", min_intersection=2)
    comp = connected_components(
        docs.select(F.col("doc_id").alias("id")),
        pairs.select("id_a", "id_b"),
    )
    member = comp.select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component_id")
    ).join(docs.select("doc_id", F.length("text").alias("_len")), "doc_id")
    return (
        member.groupBy(F.col("component_id").alias("canonical_doc"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            (F.count(F.lit(1)) - 1).alias("n_dropped"),
            F.sum(
                F.when(
                    F.col("doc_id") != F.col("component_id"), F.col("_len")
                ).otherwise(0)
            ).alias("bytes_dropped"),
        )
        .filter(F.col("n_members") > 1)
    )


@query(
    "agg_unpivot_metrics",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority,
             count(*)::DOUBLE AS n_orders,
             round(avg(o_totalprice), 2) AS avg_price,
             round(max(o_totalprice), 2) AS max_price
      FROM orders GROUP BY 1
    )
    SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM m
    UNION ALL
    SELECT o_orderpriority, 'avg_price', avg_price FROM m
    UNION ALL
    SELECT o_orderpriority, 'max_price', max_price FROM m
    """,
)
def agg_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): a wide per-priority metrics row folds into long
    (priority, metric, value) rows — the inverse of
    ``agg_conditional_pivot`` and the standard shape for feeding
    metric stores and plotting layers.

    Scale: the unpivot is a zero-shuffle in-row Expand (each input row
    emits one row per metric inside the same stage) on top of an
    already-tiny aggregate; the oracle's UNION ALL re-reads the CTE
    because DuckDB has no Expand, but Spark's plan scans the aggregate
    once."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        stable_round(F.avg("o_totalprice"), 2).alias("avg_price"),
        stable_round(F.max("o_totalprice"), 2).alias("max_price"),
    )
    return m.unpivot(
        ids=["o_orderpriority"],
        values=["n_orders", "avg_price", "max_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    ),
    flags AS (
      SELECT user_id,
             (t_view IS NOT NULL)::INTEGER AS s1,
             (t_view IS NOT NULL AND t_click > t_view)::INTEGER AS s2,
             (t_view IS NOT NULL AND t_click > t_view
              AND t_purchase > t_click)::INTEGER AS s3
      FROM firsts
    )
    SELECT 'view' AS stage, sum(s1)::BIGINT AS n_users FROM flags
    UNION ALL
    SELECT 'view>click', sum(s2)::BIGINT FROM flags
    UNION ALL
    SELECT 'view>click>purchase', sum(s3)::BIGINT FROM flags
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion: users whose FIRST view precedes their
    first click precedes their first purchase — the product-analytics
    staple, computed as conditional min-aggregates rather than the
    3-way self-join of the naive formulation.

    Scale: ONE shuffle on user_id produces the per-user stage
    timestamps (conditional mins combine map-side); the stage counts
    are a scalar aggregate over users, and the 3-row output comes from
    an in-row Expand — the event table is scanned once, joined never.
    NULL ordered-comparison semantics (a missing stage never counts as
    reached) are identical in both engines."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_purchase"),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_view"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    flags = firsts.select(
        s1.cast("int").alias("s1"),
        s2.cast("int").alias("s2"),
        s3.cast("int").alias("s3"),
    )
    agg = flags.agg(
        F.sum("s1").alias("view"),
        F.sum("s2").alias("c2"),
        F.sum("s3").alias("c3"),
    )
    return agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("view").alias("stage"),
                    F.col("view").alias("n_users"),
                ),
                F.struct(
                    F.lit("view>click").alias("stage"),
                    F.col("c2").alias("n_users"),
                ),
                F.struct(
                    F.lit("view>click>purchase").alias("stage"),
                    F.col("c3").alias("n_users"),
                ),
            )
        ).alias("s")
    ).select("s.stage", "s.n_users")


@query(
    "events_retention_weekly",
    oracle="""
    WITH cohorts AS (
      SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events
    )
    SELECT c.cohort_week,
           (datediff('day', c.cohort_week, a.active_week) / 7)::INTEGER
             AS week_offset,
           count(DISTINCT a.user_id) AS n_active
    FROM cohorts c JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
)
def events_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first event, counted as active in each later week — the retention
    triangle behind every growth dashboard.

    Scale: two aggregates over the same user-partitioned shuffle
    (cohort = min week, activity = distinct weeks; AQE reuses the
    exchange), then a user-keyed join of two user-cardinality frames —
    the raw event table never joins anything. Week arithmetic is
    date_trunc + day-diff/7, exact integer math in both engines
    (Monday-start weeks in Spark and DuckDB alike)."""
    ev = load_table(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        cohorts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.to_date("active_week"), F.to_date("cohort_week")
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "profile_table_stats",
    oracle="""
    WITH src AS (
      SELECT l_quantity, l_extendedprice, l_discount, l_returnflag
      FROM lineitem
    )
    SELECT 'l_quantity' AS col_name,
           count(*) - count(l_quantity) AS n_nulls,
           count(DISTINCT l_quantity) AS n_distinct,
           printf('%.2f', round(min(l_quantity), 2)) AS min_val,
           printf('%.2f', round(max(l_quantity), 2)) AS max_val
    FROM src
    UNION ALL
    SELECT 'l_extendedprice', count(*) - count(l_extendedprice),
           count(DISTINCT l_extendedprice),
           printf('%.2f', round(min(l_extendedprice), 2)),
           printf('%.2f', round(max(l_extendedprice), 2))
    FROM src
    UNION ALL
    SELECT 'l_discount', count(*) - count(l_discount),
           count(DISTINCT l_discount),
           printf('%.2f', round(min(l_discount), 2)),
           printf('%.2f', round(max(l_discount), 2))
    FROM src
    UNION ALL
    SELECT 'l_returnflag', count(*) - count(l_returnflag),
           count(DISTINCT l_returnflag),
           min(l_returnflag), max(l_returnflag)
    FROM src
    """,
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling — null count, exact distinct count, min/max per
    column — the data-quality sweep every ingest pipeline runs before
    anything downstream trusts a new drop of data.

    Scale: ALL columns profile in ONE scan — a single aggregate row
    computes every column's counts/extrema simultaneously (count and
    count-distinct are map-side partial), and the per-column output
    rows come from an in-row Expand of that single row, not one scan
    per column (the naive UNION ALL the oracle spells out literally).
    Numeric extrema are rounded-and-stringified identically in both
    engines so one schema fits heterogeneous column types."""
    li = load_table(spark, sf_dir, "lineitem")

    def num_stats(c: str):
        return [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}_nulls"),
            F.countDistinct(c).alias(f"{c}_distinct"),
            # explicit %.2f on BOTH engines: a bare cast-to-string uses
            # each engine's own double formatter (Java Double.toString
            # vs DuckDB), which diverge on scientific-notation
            # magnitudes and trailing-zero conventions; printf of the
            # identical rounded double is byte-stable
            F.format_string("%.2f", stable_round(F.min(c), 2)).alias(f"{c}_min"),
            F.format_string("%.2f", stable_round(F.max(c), 2)).alias(f"{c}_max"),
        ]

    agg = li.agg(
        *num_stats("l_quantity"),
        *num_stats("l_extendedprice"),
        *num_stats("l_discount"),
        (F.count(F.lit(1)) - F.count("l_returnflag")).alias("rf_nulls"),
        F.countDistinct("l_returnflag").alias("rf_distinct"),
        F.min("l_returnflag").alias("rf_min"),
        F.max("l_returnflag").alias("rf_max"),
    )

    def entry(name: str, pfx: str):
        return F.struct(
            F.lit(name).alias("col_name"),
            F.col(f"{pfx}_nulls").alias("n_nulls"),
            F.col(f"{pfx}_distinct").alias("n_distinct"),
            F.col(f"{pfx}_min").alias("min_val"),
            F.col(f"{pfx}_max").alias("max_val"),
        )

    return agg.select(
        F.explode(
            F.array(
                entry("l_quantity", "l_quantity"),
                entry("l_extendedprice", "l_extendedprice"),
                entry("l_discount", "l_discount"),
                entry("l_returnflag", "rf"),
            )
        ).alias("s")
    ).select("s.col_name", "s.n_nulls", "s.n_distinct", "s.min_val", "s.max_val")


@query(
    "window_gap_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    grp AS (
      SELECT user_id, d,
             CAST(d - INTERVAL (row_number() OVER (
               PARTITION BY user_id ORDER BY d)) DAY AS DATE) AS anchor
      FROM days
    )
    SELECT user_id,
           CAST(min(d) AS TIMESTAMP) AS streak_start,
           CAST(max(d) AS TIMESTAMP) AS streak_end,
           count(*) AS streak_days
    FROM grp GROUP BY user_id, anchor
    HAVING count(*) >= 3
    """,
)
def window_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's runs of CONSECUTIVE active days
    (streaks of ≥3 days) — the classic idiom where date minus dense
    rank is constant within an island. Distinct from session windows:
    islands are calendar-consecutive, not gap-threshold-based.

    Scale: one distinct on (user, day) — activity-cardinality, not
    event-cardinality — then a single window shuffle on user_id and a
    same-keyed aggregate (no re-exchange: the groupBy key prefix
    matches the window partitioning). The day arithmetic is exact
    integer date math in both engines."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    return (
        grp.groupBy("user_id", "anchor")
        .agg(
            # TIMESTAMP (not DATE) on both sides: Spark dates arrive in
            # pandas as datetime.date objects while DuckDB DATEs arrive
            # as datetime64 — same values, different dtype class, which
            # the type-strict harness (and a dtype-sensitive hash)
            # would flag. Midnight timestamps are identical in both.
            F.min("d").cast("timestamp").alias("streak_start"),
            F.max("d").cast("timestamp").alias("streak_end"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .filter(F.col("streak_days") >= 3)
        .drop("anchor")
    )


@query(
    "agg_mode_per_group",
    oracle="""
    WITH counts AS (
      SELECT c_mktsegment, n.n_name, count(*) AS n
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    )
    SELECT c_mktsegment,
           arg_max(n_name, lpad(n::VARCHAR, 10, '0') || n_name)
             AS top_nation,
           max(n) AS n_customers
    FROM counts GROUP BY 1
    """,
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode: the most common customer nation within each
    market segment via max_by/arg_max — the two-level aggregate that
    replaces the window-rank idiom when only the top value is needed.

    Scale: two map-side-combinable aggregates, no window, no sort; the
    second aggregate's input is (segments × nations) — dimension-
    cardinality. The tie-break key is one sortable string
    (zero-padded count ++ name, ties toward the larger name) because
    both engines compare it byte-identically — DuckDB's arg_max does
    not accept composite keys."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    counts = (
        c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_mktsegment", "n_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tie_key = F.concat(
        F.lpad(F.col("n").cast("string"), 10, "0"), F.col("n_name")
    )
    return counts.groupBy("c_mktsegment").agg(
        F.max_by("n_name", tie_key).alias("top_nation"),
        F.max("n").alias("n_customers"),
    )


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           count(*) AS n,
           round(count(*) * 1.0 / sum(count(*)) OVER (
             PARTITION BY event_type), 4) AS p
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: for each (from, to)
    event-type pair, the count and conditional probability of the next
    event — the Markov-chain view of user behavior that feeds
    session-abandonment and next-action models.

    Scale: ONE window shuffle on user_id builds the lead() pairs (tie
    broken by event_id so both engines sequence identically), then a
    5×5-cardinality aggregate; the row-normalizing window runs on that
    tiny matrix, not on events. No self-join of events to its
    successor — the lead() form is the shuffle-minimal way to bigram a
    log."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wn = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        stable_round(F.col("n") * 1.0 / F.sum("n").over(wn), 4).alias("p"),
    )


@query(
    "merge_upsert_user_state",
    oracle="""
    WITH cut AS (
      SELECT max(ts) - INTERVAL 2 DAY AS c FROM events
    ),
    merged AS (
      SELECT e.user_id,
             arg_max(e.event_type, e.ts) AS last_event_type,
             arg_max(e.value, e.ts)      AS last_value,
             max(e.ts)                                  AS last_ts,
             bool_or(e.ts <  (SELECT c FROM cut))       AS has_base,
             bool_or(e.ts >= (SELECT c FROM cut))       AS has_change
      FROM events e
      GROUP BY e.user_id
    )
    SELECT user_id, last_ts, last_event_type,
           round(last_value, 4) AS last_value,
           CASE WHEN has_change AND has_base THEN 'update'
                WHEN has_change THEN 'insert'
                ELSE 'carry' END AS op
    FROM merged
    """,
)
def merge_upsert_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE / upsert (SCD type 1) as a SINGLE aggregation: maintain a
    latest-state-per-key table from an event changelog, labeling every
    key with the merge action a MERGE INTO would have taken against the
    state as of a cutoff (here max(ts) - 2 days, derived in-plan so the
    query is fixture-independent): 'update' (state existed, newer
    change arrived), 'insert' (first events are post-cutoff), 'carry'
    (no change since cutoff).

    Scale: the naive form is base-vs-changes with a window over each
    plus a full-outer join — THREE shuffles on user_id. This plan folds
    all of it into ONE groupBy(user_id): max_by(x, ts) picks the
    terminal state — deterministic because (user_id, ts) is unique at
    microsecond precision in this changelog (the natural property of a
    per-key event log; a real pipeline appends a log sequence number to
    the ordering key) — while two bool_or's recover which side(s) of
    the cutoff contributed — the same physical cost as any keyed
    aggregate, with map-side partial aggregation. The cutoff scalar
    broadcasts (one tiny agg), never re-scanning events."""
    ev = load_table(spark, sf_dir, "events")
    cut = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 2 DAYS")).alias("c")
    )
    merged = (
        ev.join(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.max_by("event_type", F.col("ts")).alias("last_event_type"),
            F.max_by("value", F.col("ts")).alias("last_value"),
            F.max("ts").alias("last_ts"),
            F.max((F.col("ts") < F.col("c")).cast("boolean")).alias("has_base"),
            F.max((F.col("ts") >= F.col("c")).cast("boolean")).alias(
                "has_change"
            ),
        )
    )
    return merged.select(
        "user_id",
        "last_ts",
        "last_event_type",
        stable_round(F.col("last_value"), 4).alias("last_value"),
        F.when(F.col("has_change") & F.col("has_base"), "update")
        .when(F.col("has_change"), "insert")
        .otherwise("carry")
        .alias("op"),
    )


@query(
    "merge_scd2_history",
    oracle="""
    SELECT user_id,
           event_type AS state,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL)
             AS is_current,
           round(value, 4) AS value
    FROM events
    WHERE user_id % 10 = 0
    """,
)
def merge_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 history from an event
    changelog: every state change becomes a validity interval
    [valid_from, valid_to), the open-ended row flagged ``is_current``
    — the full-history complement of the SCD-1 terminal-state merge
    (``merge_upsert_user_state``). Restricted to every 10th user so
    the driver compare stays bounded; the shape is key-agnostic.

    Scale: ONE window shuffle on user_id (lead over ts) builds every
    interval — no self-join of the changelog against itself, which is
    the naive interval construction and quadratic per hot key. The
    filter prunes at the scan. Determinism: (user_id, ts) unique at
    microsecond precision (same documented precondition as the SCD-1
    twin)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 10 == 0
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        stable_round(F.col("value"), 4).alias("value"),
    )


#: Session gap: a pause longer than this starts a new session.
SESSION_GAP_MIN = 30


@query(
    "events_sessionize_ids",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts)
                      > {SESSION_GAP_MIN * 60}
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, ts,
           sum(is_start) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING
           )::BIGINT AS session_seq
    FROM flagged
    """,
)
def events_sessionize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EVENT sessionization: assign every event its user-local
    session sequence number, where a gap over SESSION_GAP_MIN minutes
    starts a new session (lag-flag + running sum — the standard
    sessionize idiom). Complements ``window_session_per_user``, which
    AGGREGATES per session window; this emits the row-level session
    key that downstream joins/funnels group on.

    Scale: both windows share ONE hash partitioning on user_id (one
    shuffle); per-user ordering is a within-partition sort, never
    global. Gap comparison uses whole-second differences, identical in
    both engines for the fixtures' non-negative epochs."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap_s = F.col("ts").cast("long") - prev.cast("long")
    is_start = F.when(
        prev.isNull() | (gap_s > SESSION_GAP_MIN * 60), 1
    ).otherwise(0)
    return ev.select("user_id", "event_id", "ts", is_start.alias("_s")).select(
        "user_id",
        "event_id",
        "ts",
        F.sum("_s")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_seq"),
    )


@query(
    "quality_expectations_check",
    oracle="""
    SELECT 'events.user_id_not_null' AS expectation,
           count(*) AS n_checked,
           sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_violations
    FROM events
    UNION ALL
    SELECT 'events.value_non_negative', count(*),
           sum(CASE WHEN value < 0 THEN 1 ELSE 0 END)::BIGINT
    FROM events
    UNION ALL
    SELECT 'orders.custkey_references_customer', count(*),
           sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem.orderkey_references_orders', count(*),
           sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem.quantity_in_1_50', count(*),
           sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)::BIGINT
    FROM lineitem
    UNION ALL
    SELECT 'documents.n_chars_matches_text', count(*),
           sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)::BIGINT
    FROM documents
    """,
)
def quality_expectations_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate: one row per expectation with
    checked/violation counts — null checks, range checks, referential
    integrity (FK orphans), and a derived-column consistency check,
    the contract a pipeline asserts before promoting a batch.

    Scale: every non-relational expectation is a conditional aggregate
    fused into ONE scan of its table (no filter-then-count double
    scan); the two referential checks are left joins against
    dimension-sized build sides (customer/orders broadcast at their
    respective fact joins), counting NULL probes — the orphan count —
    without materializing orphan rows. Output is expectation-
    cardinality, so the gate's cost is the scans, full stop."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")

    def check(df, name, bad):
        return df.agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(F.when(bad, 1).otherwise(0)).alias("n_violations"),
        ).select(
            F.lit(name).alias("expectation"), "n_checked", "n_violations"
        )

    fk_orders = check(
        orders.join(
            F.broadcast(cust.select("c_custkey")),
            orders["o_custkey"] == cust["c_custkey"],
            "left",
        ),
        "orders.custkey_references_customer",
        F.col("c_custkey").isNull(),
    )
    fk_lineitem = check(
        li.join(
            orders.select("o_orderkey"),
            li["l_orderkey"] == orders["o_orderkey"],
            "left",
        ),
        "lineitem.orderkey_references_orders",
        F.col("o_orderkey").isNull(),
    )
    parts = [
        check(ev, "events.user_id_not_null", F.col("user_id").isNull()),
        check(ev, "events.value_non_negative", F.col("value") < 0),
        fk_orders,
        fk_lineitem,
        check(
            li,
            "lineitem.quantity_in_1_50",
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
        ),
        check(
            docs,
            "documents.n_chars_matches_text",
            F.col("n_chars") != F.length("text"),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "events_cohort_ltv",
    oracle="""
    WITH cohorts AS (
      SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    weekly AS (
      SELECT user_id, date_trunc('week', ts) AS rev_week,
             sum(value) AS rev
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ),
    joined AS (
      SELECT c.cohort_week,
             (datediff('day', c.cohort_week, w.rev_week) / 7)::INTEGER
               AS week_offset,
             w.rev
      FROM cohorts c JOIN weekly w USING (user_id)
    ),
    sized AS (
      SELECT cohort_week, count(*) AS cohort_size FROM cohorts GROUP BY 1
    )
    SELECT j.cohort_week, j.week_offset,
           round(sum(j.rev), 2) AS revenue,
           round(sum(sum(j.rev)) OVER (
             PARTITION BY j.cohort_week ORDER BY j.week_offset
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS cum_revenue,
           round(sum(sum(j.rev)) OVER (
             PARTITION BY j.cohort_week ORDER BY j.week_offset
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / any_value(s.cohort_size), 4) AS cum_ltv_per_user
    FROM joined j JOIN sized s USING (cohort_week)
    GROUP BY j.cohort_week, j.week_offset
    """,
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: per signup-week cohort and week
    offset, the period revenue, the cumulative revenue, and cumulative
    LTV per cohort member — the retention triangle's revenue twin
    (events_retention_weekly counts heads; this sums wallets).

    Scale: same shape as retention — two aggregates over the SAME
    user-partitioned shuffle (cohort = min week, weekly revenue per
    user), a user-keyed join of user-cardinality frames, then the
    cumulative window runs on the (cohort, offset)-cardinality matrix,
    never on events. Cohort sizes join broadcast (week-cardinality
    rows)."""
    ev = load_table(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    weekly = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("week", F.col("ts")).alias("rev_week"))
        .agg(F.sum("value").alias("rev"))
    )
    joined = cohorts.join(weekly, "user_id").select(
        "cohort_week",
        (
            F.datediff(F.to_date("rev_week"), F.to_date("cohort_week")) / 7
        )
        .cast("int")
        .alias("week_offset"),
        "rev",
    )
    sized = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    per_cell = joined.groupBy("cohort_week", "week_offset").agg(
        F.sum("rev").alias("revenue")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per_cell.join(F.broadcast(sized), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            stable_round(F.col("revenue"), 2).alias("revenue"),
            stable_round(F.sum("revenue").over(w), 2).alias("cum_revenue"),
            stable_round(
                F.sum("revenue").over(w) / F.col("cohort_size"), 4
            ).alias("cum_ltv_per_user"),
        )
    )


@query(
    "join_pit_scd2_state",
    oracle="""
    WITH dim AS (
      SELECT user_id, event_type AS state, value, ts AS valid_from,
             coalesce(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id),
                      TIMESTAMP '9999-12-31 00:00:00') AS valid_to
      FROM events WHERE event_type IN ('signup', 'error')
    )
    SELECT p.event_id, p.user_id, p.ts,
           d.state AS state_at_purchase,
           round(d.value, 4) AS state_value
    FROM events p
    JOIN dim d ON p.user_id = d.user_id
              AND p.ts >= d.valid_from AND p.ts < d.valid_to
    WHERE p.event_type = 'purchase'
    """,
)
def join_pit_scd2_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME feature join: enrich every purchase with the
    user's state row valid AT the purchase timestamp, probing an SCD-2
    interval dimension (here: the signup/error changelog turned into
    [valid_from, valid_to) intervals, the ``merge_scd2_history``
    shape). This is the feature-store PIT join that prevents label
    leakage — the fact must never see a dimension row from its future.
    The as-of joins express the same semantics by re-sorting the fact;
    this form is what you run when the SCD-2 dimension is ALREADY
    materialized: an equi-join on the entity key with the interval
    containment as a residual filter.

    Scale: the join key is user_id — a hash equi-join whose residual
    interval predicate evaluates per matched pair, and pairs per user
    are bounded by that user's state-change count (small by
    construction in any changelog); nothing quadratic, no global
    range join. Half-open intervals + (ts, event_id) lead ordering
    make the interval set deterministic and non-overlapping, so each
    purchase matches AT MOST one state row in both engines."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = ev.filter(F.col("event_type").isin("signup", "error")).select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("state_at_purchase"),
        F.col("value").alias("v"),
        F.col("ts").alias("valid_from"),
        F.coalesce(
            F.lead("ts").over(w), F.lit("9999-12-31 00:00:00").cast("timestamp")
        ).alias("valid_to"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return (
        p.join(
            dim,
            (F.col("user_id") == F.col("d_user"))
            & (F.col("ts") >= F.col("valid_from"))
            & (F.col("ts") < F.col("valid_to")),
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            "state_at_purchase",
            stable_round(F.col("v"), 4).alias("state_value"),
        )
    )


@query(
    "events_pattern_funnel_strict",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS t0,
             lead(event_type, 1) OVER w AS t1,
             lead(event_type, 2) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    hits AS (
      SELECT user_id,
             CASE WHEN t0 = 'view' AND t1 = 'click' AND t2 = 'purchase'
                  THEN 1 ELSE 0 END AS hit
      FROM seq
    )
    SELECT sum(user_hits)::BIGINT AS n_occurrences,
           sum(CASE WHEN user_hits > 0 THEN 1 ELSE 0 END)::BIGINT
             AS n_users_matched,
           count(*)::BIGINT AS n_users
    FROM (SELECT user_id, sum(hit) AS user_hits FROM hits GROUP BY 1)
    """,
)
def events_pattern_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICT-contiguity pattern matching (the MATCH_RECOGNIZE /
    CEP shape): count occurrences of the exact consecutive sequence
    view→click→purchase inside each user's event stream — no
    intervening events allowed, unlike ``events_funnel_conversion``
    whose stages may be arbitrarily far apart. Reported as total
    occurrences, users matched, and total users.

    Scale: ONE window shuffle on user_id (two lead() columns over the
    same ordering — one sort, both offsets share the frame), then a
    user-cardinality aggregate and a scalar rollup. The naive CEP
    formulation is a 3-way self-join of the log on adjacency; the
    lead() form touches each event once. Ordering ties broken by
    event_id so both engines see identical sequences."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("t0"),
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    )
    hits = seq.select(
        "user_id",
        F.when(
            (F.col("t0") == "view")
            & (F.col("t1") == "click")
            & (F.col("t2") == "purchase"),
            1,
        )
        .otherwise(0)
        .alias("hit"),
    )
    per_user = hits.groupBy("user_id").agg(F.sum("hit").alias("user_hits"))
    return per_user.agg(
        F.sum("user_hits").cast("long").alias("n_occurrences"),
        F.sum(F.when(F.col("user_hits") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_users_matched"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )


@query(
    "events_rfm_segments",
    oracle="""
    WITH horizon AS (SELECT max(ts) AS h FROM events),
    rfm AS (
      SELECT e.user_id,
             date_diff('second', max(e.ts), max(hz.h)) AS recency_s,
             count(*)::BIGINT AS frequency,
             sum(e.value) AS monetary
      FROM events e CROSS JOIN horizon hz
      WHERE e.event_type = 'purchase'
      GROUP BY 1
    ),
    tiled AS (
      SELECT user_id,
             ntile(5) OVER (ORDER BY recency_s ASC, user_id) AS r_tile,
             ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f_tile,
             ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m_tile,
             monetary
      FROM rfm
    )
    SELECT r_tile, f_tile, m_tile,
           count(*)::BIGINT AS n_users,
           round(sum(monetary), 2) AS segment_revenue
    FROM tiled GROUP BY 1, 2, 3
    """,
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per purchasing user, recency (seconds before
    the corpus horizon), frequency, and monetary value, each cut into
    quintiles (1 = best), then rolled up to segment populations and
    revenue — the classic customer-value grid, and the same
    quantile-bucketing shape a curriculum builder uses to phase
    training data by difficulty score.

    Scale: one user-keyed aggregate collapses the corpus to
    USER-cardinality rows; the three ntile windows run over that
    collapsed frame (global orderings over users, the standard RFM
    cost — at larger-than-memory user counts the production swap is
    approx-quantile cuts, which the curriculum twin
    ``sample_curriculum_phases_quantile`` already demonstrates);
    the final aggregate is ≤125 segment rows. Every ntile ordering is
    made TOTAL with a user_id tie-break, so both engines assign
    identical buckets at quantile boundaries."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    from kafka_go_streamer_spark.operators.iterate import pinned

    # the 1-row horizon is pinned so the RFM pass doesn't re-derive
    # the events scan through lineage (pass 1 = horizon, pass 2 = RFM)
    horizon = pinned(ev.agg(F.max("ts").alias("h")))
    rfm = (
        ev.crossJoin(F.broadcast(horizon))
        .groupBy("user_id")
        .agg(
            (
                F.unix_timestamp(F.max("h")) - F.unix_timestamp(F.max("ts"))
            ).alias("recency_s"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum("value").alias("monetary"),
        )
    )
    tiled = rfm.select(
        "user_id",
        F.ntile(5)
        .over(Window.orderBy(F.col("recency_s").asc(), F.col("user_id")))
        .alias("r_tile"),
        F.ntile(5)
        .over(Window.orderBy(F.col("frequency").desc(), F.col("user_id")))
        .alias("f_tile"),
        F.ntile(5)
        .over(Window.orderBy(F.col("monetary").desc(), F.col("user_id")))
        .alias("m_tile"),
        "monetary",
    )
    return tiled.groupBy("r_tile", "f_tile", "m_tile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        stable_round(F.sum("monetary"), 2).alias("segment_revenue"),
    )


#: Total sample budget for the Neyman-allocation query.
NEYMAN_TOTAL = 1000


@query(
    "sample_neyman_allocation",
    oracle=f"""
    WITH st AS (
      SELECT o_orderpriority AS stratum,
             count(*)::BIGINT AS n_pop,
             sum(o_totalprice) AS s,
             sum(o_totalprice * o_totalprice) AS q
      FROM orders GROUP BY 1
    ),
    sd AS (
      SELECT stratum, n_pop,
             sqrt((q - s * s / n_pop) / (n_pop - 1)) AS sd
      FROM st
    ),
    alloc AS (
      SELECT stratum, n_pop, sd,
             floor({NEYMAN_TOTAL} * (n_pop * sd)
                   / (SELECT sum(n_pop * sd) FROM sd) + 0.5)::BIGINT
               AS alloc_n
      FROM sd
    ),
    ranked AS (
      SELECT o.o_orderpriority AS stratum, o.o_totalprice,
             row_number() OVER (
               PARTITION BY o.o_orderpriority
               ORDER BY md5(o.o_orderkey::VARCHAR), o.o_orderkey
             ) AS rk
      FROM orders o
    )
    SELECT a.stratum, a.n_pop,
           round(a.sd, 4) AS sd,
           a.alloc_n,
           count(r.o_totalprice)::BIGINT AS n_selected,
           round(avg(r.o_totalprice), 4) AS sample_mean
    FROM alloc a
    JOIN ranked r ON r.stratum = a.stratum AND r.rk <= a.alloc_n
    GROUP BY a.stratum, a.n_pop, a.sd, a.alloc_n
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMAL (Neyman) stratified sampling: a fixed total budget is
    allocated across strata proportionally to N_h·σ_h — high-variance
    strata get more rows than proportional allocation would give,
    minimizing the variance of the stratified mean estimator. The
    allocation, the deterministic hash-ranked selection, and the
    per-stratum sample means are all reported (the upgrade over the
    proportional `sample_stratified_hash`).

    Scale: pass 1 is a stratum-cardinality sum/sumsq aggregate whose
    tiny allocation frame broadcasts; selection is ONE window shuffle
    on the stratum (hash-rank row_number bounded by the broadcast
    allocation) — reproducible on any cluster size because rank order
    is a pure function of the key."""
    o = load_table(spark, sf_dir, "orders")
    st = o.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pop"),
        F.sum("o_totalprice").alias("s"),
        F.sum(F.col("o_totalprice") * F.col("o_totalprice")).alias("q"),
    )
    sd = st.select(
        "stratum",
        "n_pop",
        F.sqrt(
            (F.col("q") - F.col("s") * F.col("s") / F.col("n_pop"))
            / (F.col("n_pop") - 1)
        ).alias("sd"),
    )
    tot = sd.agg(F.sum(F.col("n_pop") * F.col("sd")).alias("t"))
    alloc = sd.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_pop",
        "sd",
        F.floor(
            NEYMAN_TOTAL * (F.col("n_pop") * F.col("sd")) / F.col("t") + 0.5
        )
        .cast("long")
        .alias("alloc_n"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), F.col("o_orderkey")
    )
    ranked = o.select(
        F.col("o_orderpriority").alias("stratum"),
        "o_totalprice",
        F.row_number().over(w).alias("rk"),
    )
    return (
        ranked.join(F.broadcast(alloc), "stratum")
        .filter(F.col("rk") <= F.col("alloc_n"))
        .groupBy("stratum", "n_pop", "sd", "alloc_n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_selected"),
            stable_round(F.avg("o_totalprice"), 4).alias("sample_mean"),
        )
        .select(
            "stratum",
            "n_pop",
            stable_round(F.col("sd"), 4).alias("sd"),
            "alloc_n",
            "n_selected",
            "sample_mean",
        )
    )


#: Concurrency bucket width (5 minutes) for the peak-activity query.
PEAK_BUCKET_S = 300


@query(
    "events_peak_active_users",
    oracle=f"""
    WITH b AS (
      SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day_ts,
             (floor(epoch(ts) / {PEAK_BUCKET_S}) * {PEAK_BUCKET_S})::BIGINT
               AS bucket_s,
             count(DISTINCT user_id)::BIGINT AS active_users
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT day_ts, bucket_s, active_users,
             row_number() OVER (
               PARTITION BY day_ts
               ORDER BY active_users DESC, bucket_s ASC
             ) AS rk
      FROM b
    )
    SELECT day_ts, bucket_s AS peak_bucket_s,
           active_users AS peak_active_users
    FROM r WHERE rk = 1
    """,
)
def events_peak_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per day: the 5-minute bucket with the most
    DISTINCT active users — the capacity-planning readout (and the
    day-partitioned form of a sweep-line concurrency count: buckets
    make it an aggregate instead of a global boundary sort).

    Scale: one (day, bucket, user) distinct-aggregate — map-side
    combinable after the distinct shuffle on composite keys bounded by
    time×activity, never raw-event cardinality downstream; the per-day
    argmax is a window over bucket-cardinality rows partitioned by
    day. Ties (equal peak in two buckets) resolve to the earliest
    bucket in both engines."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.select(
            F.col("ts").cast("date").cast("timestamp").alias("day_ts"),
            (
                F.floor(F.unix_timestamp("ts") / PEAK_BUCKET_S)
                * PEAK_BUCKET_S
            )
            .cast("long")
            .alias("bucket_s"),
            "user_id",
        )
        .groupBy("day_ts", "bucket_s")
        .agg(F.count_distinct("user_id").cast("long").alias("active_users"))
    )
    w = Window.partitionBy("day_ts").orderBy(
        F.col("active_users").desc(), F.col("bucket_s").asc()
    )
    return (
        b.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "day_ts",
            F.col("bucket_s").alias("peak_bucket_s"),
            F.col("active_users").alias("peak_active_users"),
        )
    )


@query(
    "events_time_to_convert",
    oracle="""
    WITH u AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             min(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT date_diff('second', first_view, first_purchase) AS delta_s
      FROM u
      WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase >= first_view
    )
    SELECT count(*)::BIGINT AS n_converted,
           round(percentile_cont(0.25) WITHIN GROUP (ORDER BY delta_s), 1)
             AS p25_s,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY delta_s), 1)
             AS p50_s,
           round(percentile_cont(0.75) WITHIN GROUP (ORDER BY delta_s), 1)
             AS p75_s,
           round(percentile_cont(0.9) WITHIN GROUP (ORDER BY delta_s), 1)
             AS p90_s
    FROM d
    """,
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: seconds from each user's FIRST
    view to their FIRST subsequent purchase, summarized as quartiles
    and the p90 tail — the product-analytics latency readout, and the
    same shape as a label-delay profile in a training pipeline
    (how stale may a feature snapshot be before labels leak).

    Scale: conditional min-aggregates collapse the corpus to
    user-cardinality rows in ONE shuffle (no view×purchase self-join);
    the percentile aggregate runs over converted-user deltas only.
    Deltas are whole-second integers, so the percentile interpolation
    is exact in both engines."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    d = u.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        (
            F.unix_timestamp("first_purchase")
            - F.unix_timestamp("first_view")
        ).alias("delta_s")
    )
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        *[
            stable_round(
                F.percentile("delta_s", F.lit(q)), 1
            ).alias(name)
            for q, name in [
                (0.25, "p25_s"),
                (0.5, "p50_s"),
                (0.75, "p75_s"),
                (0.9, "p90_s"),
            ]
        ],
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, max(value) AS pv
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    ),
    j AS (
      SELECT e.user_id, e.ts, e.event_id,
             pb.ts AS bt, pb.pv AS bv,
             pf.ts AS ft, pf.pv AS fv
      FROM (SELECT user_id, ts, event_id FROM events) e
      ASOF LEFT JOIN p pb
        ON e.user_id = pb.user_id AND e.ts >= pb.ts
      ASOF LEFT JOIN p pf
        ON e.user_id = pf.user_id AND e.ts <= pf.ts
    )
    SELECT user_id, ts, event_id,
           CASE
             WHEN bt IS NULL AND ft IS NULL THEN 'none'
             WHEN ft IS NULL THEN 'backward'
             WHEN bt IS NULL THEN 'forward'
             WHEN date_diff('second', bt, ts)
                  <= date_diff('second', ts, ft) THEN 'backward'
             ELSE 'forward'
           END AS direction,
           CASE
             WHEN bt IS NULL AND ft IS NULL THEN NULL
             WHEN ft IS NULL THEN bt
             WHEN bt IS NULL THEN ft
             WHEN date_diff('second', bt, ts)
                  <= date_diff('second', ts, ft) THEN bt
             ELSE ft
           END AS matched_time,
           round(CASE
             WHEN bt IS NULL AND ft IS NULL THEN NULL
             WHEN ft IS NULL THEN bv
             WHEN bt IS NULL THEN fv
             WHEN date_diff('second', bt, ts)
                  <= date_diff('second', ts, ft) THEN bv
             ELSE fv
           END, 2) AS purchase_value_nearest
    FROM j
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join (``pd.merge_asof(direction=
    'nearest')``): every event matched to the temporally CLOSEST
    purchase — past or future — with ties going backward. Completes
    the as-of family (backward: ``join_asof_last_purchase``;
    backward+tolerance: ``join_asof_tolerance``): 'nearest' is the
    sensor-fusion/label-alignment variant where a slightly-future
    reading beats a stale past one.

    Scale: nearest = the better of one BACKWARD and one FORWARD pass,
    each the union + carry window of operators/asof.py (the forward
    pass runs the same operator over negated epoch seconds — carry-
    forward in negated time IS carry-backward in real time). Two
    window shuffles on user_id total, no self-join, and the per-row
    arbitration is a whole-second integer comparison identical in
    both engines."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.select("user_id", "ts", "event_id")
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pv"))
    )
    back = asof_join(left, right, on="ts", by="user_id").select(
        "user_id",
        "ts",
        "event_id",
        F.col("matched_time").alias("bt"),
        F.col("pv_asof").alias("bv"),
    )
    # forward pass: negate epoch seconds on both sides so the backward
    # operator's carry-forward picks the nearest FOLLOWING purchase
    lneg = left.select(
        "user_id",
        "event_id",
        (-F.unix_timestamp("ts")).alias("nts"),
        F.col("ts").alias("orig_ts"),
    )
    rneg = right.select(
        "user_id",
        (-F.unix_timestamp("ts")).alias("nts"),
        F.col("ts").alias("p_ts"),
        "pv",
    )
    fwd = asof_join(
        lneg, rneg, on="nts", by="user_id", value_cols=["p_ts", "pv"]
    ).select(
        "user_id",
        "event_id",
        F.col("p_ts_asof").alias("ft"),
        F.col("pv_asof").alias("fv"),
    )
    j = back.join(fwd, ["user_id", "event_id"])
    bd = F.unix_timestamp("ts") - F.unix_timestamp("bt")
    fd = F.unix_timestamp("ft") - F.unix_timestamp("ts")
    take_back = F.col("bt").isNotNull() & (
        F.col("ft").isNull() | (bd <= fd)
    )
    return j.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("bt").isNull() & F.col("ft").isNull(), "none")
        .when(take_back, "backward")
        .otherwise("forward")
        .alias("direction"),
        F.when(take_back, F.col("bt"))
        .otherwise(F.col("ft"))
        .alias("matched_time"),
        stable_round(
            F.when(take_back, F.col("bv")).otherwise(F.col("fv")), 2
        ).alias("purchase_value_nearest"),
    )


#: Power-iteration count for the stationary-distribution estimate.
MARKOV_ITERS = 3


def _markov_stationary_oracle() -> str:
    steps = []
    prev = "pi0"
    for k in range(1, MARKOV_ITERS + 1):
        steps.append(f"""
    pi{k}_raw AS (
      SELECT t.to_type AS event_type, sum(p.pi * t.p) AS pi
      FROM {prev} p JOIN t ON t.from_type = p.event_type
      GROUP BY 1
    ),
    pi{k} AS (
      SELECT event_type,
             round(pi / (SELECT sum(pi) FROM pi{k}_raw), 6) AS pi
      FROM pi{k}_raw
    )""")
        prev = f"pi{k}"
    return f"""
    WITH seq AS (
      SELECT event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ),
    t AS (
      SELECT event_type AS from_type, next_type AS to_type,
             round(count(*) * 1.0 / sum(count(*)) OVER (
               PARTITION BY event_type), 6) AS p
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    states AS (SELECT DISTINCT from_type AS event_type FROM t),
    pi0 AS (
      SELECT event_type,
             1.0 / (SELECT count(*) FROM states) AS pi
      FROM states
    ),{",".join(steps)}
    SELECT cur.event_type, cur.pi,
           round(abs(cur.pi - prev.pi), 6) AS delta
    FROM pi{MARKOV_ITERS} cur
    JOIN pi{MARKOV_ITERS - 1} prev USING (event_type)
    """


@query("events_markov_stationary", oracle=_markov_stationary_oracle)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the behavioral Markov chain: three
    power iterations π ← πP from uniform over the (rounded) transition
    matrix of ``events_transition_matrix``, renormalized and rounded
    each step, with the per-state |Δ| between the last two iterations
    as the convergence report — "where does user behavior settle" as a
    query, the long-run complement of the one-step matrix.

    Scale: ONE window shuffle on user_id builds the transition pairs
    (shared shape with the matrix query); every iteration is a join of
    two STATE-cardinality frames (5 rows here; thousands at worst for
    real event taxonomies) — the fact table is touched exactly once no
    matter the iteration count. Rounding the matrix AND each iterate
    to 6 decimals makes the fixed-point arithmetic engine-exact, the
    same discipline as the PageRank twins."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    wn = Window.partitionBy("from_type")
    t = (
        seq.groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "from_type",
            "to_type",
            stable_round(
                F.col("n") * 1.0 / F.sum("n").over(wn), 6
            ).alias("p"),
        )
    )
    from kafka_go_streamer_spark.operators.iterate import pinned

    t = pinned(t)  # consumed once per iteration: never re-window events
    states = t.select(F.col("from_type").alias("event_type")).distinct()
    ns = states.count()
    pi = states.select(
        "event_type", F.lit(1.0 / ns).alias("pi")
    )
    prev = pi
    for _ in range(MARKOV_ITERS):
        prev = pi
        raw = (
            pi.join(
                F.broadcast(t), pi["event_type"] == t["from_type"]
            )
            .groupBy(F.col("to_type").alias("event_type"))
            .agg(F.sum(F.col("pi") * F.col("p")).alias("pi"))
        )
        z = raw.agg(F.sum("pi").alias("z"))
        pi = raw.crossJoin(F.broadcast(z)).select(
            "event_type",
            stable_round(F.col("pi") / F.col("z"), 6).alias("pi"),
        )
    return (
        pi.join(
            prev.select(
                "event_type", F.col("pi").alias("pi_prev")
            ),
            "event_type",
        )
        .select(
            "event_type",
            "pi",
            stable_round(
                F.abs(F.col("pi") - F.col("pi_prev")), 6
            ).alias("delta"),
        )
    )


#: Daily maintenance windows (UTC seconds-of-day): the small interval
#: table the session intervals join against.
MAINT_WINDOWS = ((12 * 3600, 14 * 3600), (20 * 3600, 21 * 3600 + 1800))


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts)
                      > {SESSION_GAP_MIN * 60} THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id,
             floor(min(epoch(ts)))::BIGINT AS s_start,
             floor(max(epoch(ts)))::BIGINT AS s_end
      FROM (
        SELECT user_id, ts,
               sum(is_start) OVER (
                 PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS seq
        FROM flagged
      ) GROUP BY user_id, seq
    ),
    win AS (
      SELECT d.day, w.w_lo, w.w_hi,
             d.day * 86400 + w.w_lo AS w_start,
             d.day * 86400 + w.w_hi AS w_end
      FROM (SELECT DISTINCT floor(epoch(ts) / 86400)::BIGINT AS day
            FROM events) d
      CROSS JOIN (VALUES
        {", ".join(f"({lo}, {hi})" for lo, hi in MAINT_WINDOWS)}
      ) AS w(w_lo, w_hi)
    )
    SELECT w.day, w.w_lo,
           count(*)::BIGINT AS n_sessions,
           sum(least(s.s_end, w.w_end)
               - greatest(s.s_start, w.w_start))::BIGINT
             AS total_overlap_sec
    FROM sess s JOIN win w
      ON s.s_start < w.w_end AND w.w_start < s.s_end
    GROUP BY 1, 2
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: user session intervals (gap-based
    sessionization) against the daily maintenance-window calendar —
    which sessions were live during each window and for how many
    seconds, the canonical ops question ("who did the 12:00 deploy
    window hit") and the shape of every event-time interval
    enrichment.

    Scale: the calendar side is (days × windows) rows — broadcast, so
    the overlap predicate `s.start < w.end AND w.start < s.end` runs
    as a broadcast join with NO shuffle of the session side. When BOTH
    interval sides are fact-sized (session×session overlap), the same
    query decomposes each interval onto hour buckets and becomes the
    capped bucket-equi-join + exact-refine pattern the dedup family
    uses — the broadcast form here is the common enrichment case.
    Interval arithmetic is whole-second epochs, identical in both
    engines."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_start = F.when(
        prev.isNull()
        | (
            (F.col("ts").cast("long") - prev.cast("long"))
            > SESSION_GAP_MIN * 60
        ),
        1,
    ).otherwise(0)
    seq = F.sum(F.col("is_start")).over(
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = (
        ev.select("user_id", "ts", is_start.alias("is_start"))
        .select("user_id", "ts", seq.alias("seq"))
        .groupBy("user_id", "seq")
        .agg(
            F.min(F.col("ts").cast("long")).alias("s_start"),
            F.max(F.col("ts").cast("long")).alias("s_end"),
        )
    )
    days = ev.select(
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day")
    ).distinct()
    wins = days.crossJoin(
        F.broadcast(
            ev.sparkSession.createDataFrame(
                list(MAINT_WINDOWS), "w_lo LONG, w_hi LONG"
            )
        )
    ).select(
        "day",
        "w_lo",
        (F.col("day") * 86400 + F.col("w_lo")).alias("w_start"),
        (F.col("day") * 86400 + F.col("w_hi")).alias("w_end"),
    )
    return (
        sess.join(
            F.broadcast(wins),
            (F.col("s_start") < F.col("w_end"))
            & (F.col("w_start") < F.col("s_end")),
        )
        .groupBy("day", "w_lo")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum(
                F.least("s_end", "w_end") - F.greatest("s_start", "w_start")
            )
            .cast("long")
            .alias("total_overlap_sec"),
        )
    )


#: Top-k reported behavior paths.
PATH_TOP = 15


@query(
    "events_path_trigrams",
    oracle=f"""
    WITH seq AS (
      SELECT event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
      SELECT e1 || ' > ' || e2 || ' > ' || e3 AS path,
             count(*)::BIGINT AS n
      FROM seq WHERE e3 IS NOT NULL
      GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS t FROM paths)
    SELECT p.path, p.n,
           round(p.n * 1.0 / tot.t, 6) AS share
    FROM paths p CROSS JOIN tot
    ORDER BY p.n DESC, p.path ASC
    LIMIT {PATH_TOP}
    """,
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-behavior PATHS: the most common 3-step event-type
    sequences (per-user time order, double-lead window), with each
    path's share of all trigrams — the Sankey/flow view product
    analytics builds on, and the empirical counterpart of the Markov
    chain queries (a path whose share beats its chain-predicted
    probability is a correlated flow the first-order model misses).

    Scale: ONE window shuffle on user_id produces both leads (shared
    partitioning with every other per-user sequence query); paths
    collapse to a type³-cardinality aggregate (125 here), and the
    share window runs on that tiny frame. No self-joins of the event
    log — the lead() form is the bigram/trigram idiom throughout this
    repo."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    paths = seq.groupBy(
        F.concat_ws(" > ", "e1", "e2", "e3").alias("path")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = paths.agg(F.sum("n").alias("t"))
    return (
        paths.crossJoin(F.broadcast(tot))
        .select(
            "path",
            "n",
            stable_round(F.col("n") * 1.0 / F.col("t"), 6).alias("share"),
        )
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(PATH_TOP)
    )


@query(
    "events_dau_wau_stickiness",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             floor(epoch(ts) / 86400)::BIGINT AS day
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    dau AS (
      SELECT day, count(*)::BIGINT AS dau FROM ud GROUP BY 1
    ),
    wau AS (
      SELECT d.day, count(DISTINCT u.user_id)::BIGINT AS wau
      FROM days d
      JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
      GROUP BY 1
    )
    SELECT d.day, d.dau, w.wau,
           round(d.dau * 1.0 / w.wau, 6) AS stickiness
    FROM dau d JOIN wau w USING (day)
    """,
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness (DAU÷WAU) per day — the
    engagement headline triple every product dashboard opens with,
    here as the deterministic batch form over the event log.

    Scale: the log collapses to DISTINCT (user, day) FIRST — one
    map-side-combinable distinct at user-day cardinality, after which
    everything is tiny relative to the fact. The user-day frame is
    PINNED — its three consumers (DAU, day domain, offset explode)
    would otherwise each re-plan the fact scan + distinct (3 fact
    scans in the physical plan). The trailing window is an
    offset-exploded equi-join of user-days onto target days (7 rows
    per user-day, the same bounded-lag idiom as the EWMA smoother —
    never a range join) with the calendar-sized day domain broadcast,
    and the distinct-in-window count shuffles only user-day rows. At
    extreme user counts the exact WAU swaps for the mergeable HLL
    registers (sketch_hll_hourly_rollup shape) with identical query
    shape."""
    from kafka_go_streamer_spark.operators.iterate import pinned

    ev = load_table(spark, sf_dir, "events")
    ud = pinned(
        ev.select(
            "user_id",
            F.floor(F.unix_timestamp("ts") / 86400)
            .cast("long")
            .alias("day"),
        ).distinct()
    )  # one fact scan feeds DAU, the day domain, and the offset explode
    dau = ud.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    days = ud.select("day").distinct()
    offs = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        F.col("day").alias("uday"),
    ).select("user_id", (F.col("uday") + F.col("off")).alias("day"))
    wau = (
        offs.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )
    return dau.join(F.broadcast(wau), "day").select(
        "day",
        "dau",
        "wau",
        stable_round(F.col("dau") * 1.0 / F.col("wau"), 6).alias(
            "stickiness"
        ),
    )


#: HITS power-iteration count.
HITS_ITERS = 3


def _hits_oracle() -> str:
    steps = []
    prev_h, prev_a = "h0", "a0"
    for k in range(1, HITS_ITERS + 1):
        steps.append(f"""
    a{k} AS (
      SELECT s.event_type,
             coalesce(sum(t.n * h.hub), 0.0) AS auth
      FROM states s
      LEFT JOIN t ON t.to_type = s.event_type
      LEFT JOIN {prev_h} h ON h.event_type = t.from_type
      GROUP BY 1
    ),
    h{k} AS (
      SELECT s.event_type,
             coalesce(sum(t.n * a.auth), 0.0) AS hub
      FROM states s
      LEFT JOIN t ON t.from_type = s.event_type
      LEFT JOIN a{k} a ON a.event_type = t.to_type
      GROUP BY 1
    )""")
        prev_h, prev_a = f"h{k}", f"a{k}"
    return f"""
    WITH seq AS (
      SELECT event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ),
    t AS (
      SELECT event_type AS from_type, next_type AS to_type,
             count(*)::BIGINT AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    states AS (SELECT DISTINCT event_type FROM events),
    h0 AS (SELECT event_type, 1.0 AS hub FROM states),{",".join(steps)}
    SELECT s.event_type,
           round(coalesce(h.hub / nullif((SELECT sum(hub) FROM {prev_h}), 0),
                          0.0), 6) AS hub,
           round(coalesce(a.auth / nullif((SELECT sum(auth) FROM {prev_a}), 0),
                          0.0), 6) AS authority
    FROM states s
    JOIN {prev_h} h USING (event_type)
    JOIN {prev_a} a USING (event_type)
    ORDER BY s.event_type
    """


@query("events_hits_hubs", oracle=_hits_oracle)
def events_hits_hubs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities over the behavioral transition graph
    (edge weight = transition count): authority = "event types that
    journeys converge INTO" (weighted by how hub-like the senders
    are), hub = "event types that fan OUT into authoritative ones" —
    the directed complement of the PageRank/stationary pair, which
    mixes both roles into one score. Three mutual power iterations
    h←Wa, a←Wᵀh from the all-ones vector, UN-normalized — power
    iteration is scale-invariant, so the L1 normalization is applied
    exactly once, on the final iterates (both engines divide the same
    raw sums-of-products, then round to 6 decimals).

    Scale: identical discipline to ``events_markov_stationary`` — the
    fact is touched ONCE (one user-keyed window builds the transition
    pairs, pinned), and every iteration is joins over
    STATE-cardinality frames (|event types| rows), so iteration count
    never re-reads events. Skipping per-step normalization is also
    what keeps the lineage LINEAR: a normalizer consumes its raw
    frame twice (value + z), so normalizing inside the loop either
    doubles the plan per half-step (2^(2k) subtree copies) or forces
    an eager materialization barrier per half-step (6 driver-blocking
    jobs for k=3); the raw recurrence needs neither — the whole query
    is ONE job over the two pinned state-sized frames. Raw iterates
    grow like (Σn)^k, which double range absorbs even at 100 TB edge
    counts (1e12^6 ≪ 1e308)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    from kafka_go_streamer_spark.operators.iterate import pinned

    # ONE pinned frame carries both the transition weights and the full
    # state domain: keeping the null-next (terminal) rows through the
    # aggregate means every event type still appears as a from_type
    # (every event row emits exactly one pair row), so the state domain
    # no longer needs its own events scan + distinct + checkpoint
    # (2 events scans + 2 pin jobs -> 1 + 1; the extra null rows are
    # at most |types|).
    pairs = pinned(
        seq.groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    # states is referenced by the start vector and the self-loop
    # completion; pin the tiny distinct once so each reference is an
    # RDD scan, not its own exchange+aggregate subtree
    states = pinned(
        pairs.select(F.col("from_type").alias("event_type")).distinct()
    )
    # Zero-weight self-loops complete the edge list over the FULL state
    # domain ONCE (r17, VERDICT r16 #7): with every state guaranteed to
    # appear as both src and dst, each propagate's groupBy already
    # covers the whole domain and the per-half-step zero-fill join
    # over `states` (6 of them, each a broadcast exchange + hash join
    # + coalesce projection) disappears from the plan. A 0-weight term
    # adds exactly 0.0 to a sum of non-negative doubles, so the
    # iterates are bit-identical. The real (to_type IS NOT NULL)
    # filter stays a narrow op over the checkpointed frame.
    t = pairs.filter(F.col("to_type").isNotNull()).unionByName(
        states.select(
            F.col("event_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
            F.lit(0).cast("long").alias("n"),
        )
    )
    h = states.select("event_type", F.lit(1.0).alias("hub"))

    def _propagate(vec: DataFrame, val: str, src: str, dst: str, out: str):
        # new(dst) = sum over edges of n * vec(src), re-indexed on dst.
        # The self-loop completion makes the groupBy domain-complete —
        # no zero-fill join. No normalization — see docstring; keeps
        # each iterate a single-consumer frame.
        return (
            t.join(
                F.broadcast(
                    vec.select(
                        F.col("event_type").alias(src),
                        F.col(val).alias("_v"),
                    )
                ),
                src,
            )
            .groupBy(F.col(dst).alias("event_type"))
            .agg(F.sum(F.col("n") * F.col("_v")).alias(out))
        )

    a = None
    for _ in range(HITS_ITERS):
        # a(v) = sum_u n(u,v) * h(u): incoming mass, indexed by to_type
        a = _propagate(h, "hub", "from_type", "to_type", "auth")
        # h(u) = sum_v n(u,v) * a(v): outgoing mass, indexed by from_type
        h = _propagate(a, "auth", "to_type", "from_type", "hub")

    def _normed(vec: DataFrame, val: str, out: str):
        z = vec.agg(F.sum(val).alias("_z"))
        return vec.crossJoin(F.broadcast(z)).select(
            "event_type",
            stable_round(
                F.coalesce(
                    F.col(val) / F.when(F.col("_z") != 0, F.col("_z")),
                    F.lit(0.0),
                ),
                6,
            ).alias(out),
        )

    # the only double-consumption in the plan: the two final iterates
    # feed their own L1 normalizer — a bounded 4x of a linear lineage,
    # which Catalyst plans in one job (no barrier needed). Both
    # iterates are domain-complete (self-loop completion above), so
    # the old re-join onto `states` added nothing — the two normalized
    # frames join each other directly.
    return (
        _normed(h, "hub", "hub")
        .join(F.broadcast(_normed(a, "auth", "authority")), "event_type")
        .select("event_type", "hub", "authority")
        .orderBy("event_type")
    )


@query(
    "events_user_entropy",
    oracle="""
    WITH ut AS (
      SELECT user_id, event_type, count(*)::BIGINT AS c
      FROM events GROUP BY 1, 2
    ),
    ent AS (
      SELECT user_id,
             round(-sum((c * 1.0 / n) * ln(c * 1.0 / n)), 6) AS h,
             max(n)::BIGINT AS n_events
      FROM (
        SELECT user_id, c,
               sum(c) OVER (PARTITION BY user_id) AS n
        FROM ut
      ) GROUP BY 1
    )
    SELECT round(h, 1) AS entropy_bucket,
           count(*)::BIGINT AS n_users,
           round(avg(n_events), 2) AS avg_events
    FROM ent GROUP BY 1 ORDER BY 1
    """,
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity profile: Shannon entropy of each user's
    event-type mix, histogrammed at 0.1-nat resolution with the mean
    activity per bucket — separates single-action users (H = 0, often
    bots or landing-page bounces) from diverse engaged users, and the
    bucket×volume view shows whether heavy users are heavy because
    they do MORE KINDS of things or more of one thing.

    Scale: one (user, type) count shuffle, a user-partitioned window
    for the per-user total (k ≤ |types| rows per partition), the
    entropy fold per user, then a constant-sized bucket histogram —
    cardinality shrinks monotonically at every step, all aggregates
    map-side combinable. Probabilities are exact integer ratios, so
    the entropy doubles are identical on both engines before the
    rounded bucketing."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ut = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wn = Window.partitionBy("user_id")
    p = F.col("c") * 1.0 / F.col("n")
    ent = (
        ut.select("user_id", "c", F.sum("c").over(wn).alias("n"))
        .groupBy("user_id")
        .agg(
            stable_round(-F.sum(p * F.log(p)), 6).alias("h"),
            F.max("n").cast("long").alias("n_events"),
        )
    )
    return (
        ent.groupBy(stable_round(F.col("h"), 1).alias("entropy_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            stable_round(F.avg("n_events"), 2).alias("avg_events"),
        )
        .orderBy("entropy_bucket")
    )


#: Experiment sizing: two-sided alpha = 0.05, power = 0.80, and the
#: minimum detectable effect as a fraction of the observed mean.
POWER_Z_ALPHA = 1.959964
POWER_Z_BETA = 0.841621
POWER_MDE_FRAC = 0.05


@query(
    "events_power_analysis",
    oracle=f"""
    WITH st AS (
      SELECT event_type, count(*)::BIGINT AS n_obs,
             round(stddev_samp(value), 6) AS sd,
             round(abs(avg(value)) * {POWER_MDE_FRAC}, 6) AS mde
      FROM events GROUP BY 1
    )
    SELECT event_type, n_obs, sd, mde,
           ceil(2.0 * pow({POWER_Z_ALPHA} + {POWER_Z_BETA}, 2)
                * sd * sd / (mde * mde))::BIGINT AS n_required,
           (n_obs >= 2 * ceil(2.0 * pow({POWER_Z_ALPHA} + {POWER_Z_BETA}, 2)
                              * sd * sd / (mde * mde))::BIGINT)
             AS feasible_now
    FROM st ORDER BY event_type
    """,
)
def events_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sizing per event type: the per-arm sample size n =
    2(z_α/2 + z_β)²σ²/δ² needed to detect a {POWER_MDE_FRAC:.0%} shift
    of the mean at α = 0.05 with 80% power (normal approximation —
    the design-stage companion to the Welch test that ANALYZES the
    experiment afterwards), and whether the observed volume could
    already feed both arms. Over- and under-powered tests are the two
    standard A/B failure modes; this is the query that catches both
    before launch.

    Scale: one map-side-combinable aggregate over the fact — count,
    mean, and variance in a single pass; everything after is constant
    arithmetic on |types| rows. σ and δ are rounded to 6 before the
    sizing formula so both engines ceil the identical double."""
    ev = load_table(spark, sf_dir, "events")
    st = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        stable_round(F.stddev_samp("value"), 6).alias("sd"),
        stable_round(
            F.abs(F.avg("value")) * POWER_MDE_FRAC, 6
        ).alias("mde"),
    )
    n_req = F.ceil(
        2.0
        * F.pow(F.lit(POWER_Z_ALPHA + POWER_Z_BETA), 2)
        * F.col("sd")
        * F.col("sd")
        / (F.col("mde") * F.col("mde"))
    ).cast("long")
    return st.select(
        "event_type",
        "n_obs",
        "sd",
        "mde",
        n_req.alias("n_required"),
        (F.col("n_obs") >= 2 * n_req).alias("feasible_now"),
    ).orderBy("event_type")


@query(
    "events_interarrival_burstiness",
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch(ts) - lag(epoch(ts)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id
             ) AS gap
      FROM events
    ),
    st AS (
      SELECT event_type, count(gap)::BIGINT AS n_gaps,
             round(avg(gap), 6) AS mean_gap,
             round(stddev_samp(gap), 6) AS sd_gap
      FROM g WHERE gap IS NOT NULL GROUP BY 1
    )
    SELECT event_type, n_gaps, mean_gap, sd_gap,
           round((sd_gap - mean_gap)
                 / nullif(sd_gap + mean_gap, 0), 4) AS burstiness
    FROM st ORDER BY event_type
    """,
)
def events_interarrival_burstiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Goh-Barabási burstiness of per-user inter-arrival times per
    event type: B = (σ−μ)/(σ+μ) over the gaps between a user's
    consecutive events — B ≈ −1 is clockwork (bot-like periodic
    traffic), B ≈ 0 Poisson, B → 1 heavy-tailed human sessions. The
    point-process companion to the word-level Fano factor, and the
    signal that separates scripted accounts from organic ones BEFORE
    any content inspection.

    Scale: gaps come from one lag() window partitioned by (user,
    type) — the sessionizer's exact shuffle shape — followed by a
    map-side-combinable moment aggregate to |types| rows. Timestamps
    difference as exact epoch seconds (both engines subtract the
    identical microsecond-precision doubles); μ and σ round to 6
    before the bounded ratio, whose ±(σ+μ) denominator only vanishes
    for the degenerate single-gap case, reported NULL on both
    engines."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    sec = F.col("ts").cast("double")
    g = ev.select(
        "event_type",
        (sec - F.lag(sec).over(wl)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    st = g.groupBy("event_type").agg(
        F.count("gap").cast("long").alias("n_gaps"),
        stable_round(F.avg("gap"), 6).alias("mean_gap"),
        stable_round(F.stddev_samp("gap"), 6).alias("sd_gap"),
    )
    denom = F.when(
        (F.col("sd_gap") + F.col("mean_gap")) != 0,
        F.col("sd_gap") + F.col("mean_gap"),
    )
    return st.select(
        "event_type",
        "n_gaps",
        "mean_gap",
        "sd_gap",
        stable_round(
            (F.col("sd_gap") - F.col("mean_gap")) / denom, 4
        ).alias("burstiness"),
    ).orderBy("event_type")


def _entropy_rate_oracle() -> str:
    from kafka_go_streamer_spark.plans.registry import ORACLES

    markov = ORACLES["events_markov_stationary"]
    return f"""
    WITH m AS ({markov}),
    seq2 AS (
      SELECT event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ),
    t2 AS (
      SELECT event_type AS from_type, next_type AS to_type,
             round(count(*) * 1.0 / sum(count(*)) OVER (
               PARTITION BY event_type), 6) AS p
      FROM seq2 WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    h AS (
      SELECT count(DISTINCT m.event_type)::BIGINT AS n_states,
             -sum(m.pi * t2.p * ln(t2.p)) AS hr
      FROM m JOIN t2 ON t2.from_type = m.event_type
      WHERE t2.p > 0
    )
    SELECT n_states, round(hr, 4) AS entropy_rate,
           round(ln(n_states * 1.0), 4) AS max_entropy,
           round(1.0 - hr / ln(n_states * 1.0), 4) AS predictability
    FROM h
    """


@query("events_markov_entropy_rate", oracle=_entropy_rate_oracle)
def events_markov_entropy_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Entropy rate of the behavioral Markov chain: H = −Σᵢ πᵢ Σⱼ
    pᵢⱼ ln pᵢⱼ with π from the stationary-distribution query and P the
    rounded transition matrix — bits-per-step unpredictability of user
    behavior, and 1 − H/ln(k) as the predictability headroom a
    next-event model could exploit. The chain-level summary on top of
    the per-state stationary view, kept consistent by composing that
    query's own π.

    Scale: the π subplan and the transition matrix each cost one
    lead() window shuffle over the fact (the stationary query's
    audited shape); the entropy contraction is a k²-row weighted sum.
    π and p are both pre-rounded to 6, so the engines fold identical
    doubles. Transitions whose 6-rounded p collapses to 0 (a state
    with >~2M distinct successors at very large scale) are dropped on
    BOTH engines before the log — the p·ln p → 0 limit term — so
    DuckDB's hard ln(0) error and Spark's silent NULL can never
    diverge (ADVICE r9)."""
    from pyspark.sql import Window

    from kafka_go_streamer_spark.plans.registry import QUERIES as _Q

    pi = _Q["events_markov_stationary"](spark, sf_dir).select(
        "event_type", "pi"
    )
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    wf = Window.partitionBy("from_type")
    t = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    t = t.select(
        "from_type",
        "to_type",
        stable_round(
            F.col("n") * 1.0 / F.sum("n").over(wf), 6
        ).alias("p"),
    ).filter(F.col("p") > 0)
    h = (
        pi.join(
            t, pi["event_type"] == t["from_type"]
        )
        .agg(
            F.count_distinct(pi["event_type"])
            .cast("long")
            .alias("n_states"),
            (-F.sum(F.col("pi") * F.col("p") * F.log("p"))).alias("hr"),
        )
    )
    hmax = F.log(F.col("n_states") * 1.0)
    return h.select(
        "n_states",
        stable_round(F.col("hr"), 4).alias("entropy_rate"),
        stable_round(hmax, 4).alias("max_entropy"),
        stable_round(1.0 - F.col("hr") / hmax, 4).alias(
            "predictability"
        ),
    )


#: Skew report: how many of the heaviest keys to aggregate into the
#: concentration share.
SKEW_TOP = 10


@query(
    "quality_join_key_skew",
    oracle=f"""
    WITH k AS (
      SELECT user_id, count(*)::BIGINT AS c FROM events GROUP BY 1
    ),
    t AS (
      SELECT count(*)::BIGINT AS n_keys, sum(c)::BIGINT AS n_rows,
             max(c)::BIGINT AS max_per_key,
             round(avg(c), 6) AS mean_per_key
      FROM k
    ),
    top AS (
      SELECT sum(c)::BIGINT AS top_rows FROM (
        SELECT c FROM k ORDER BY c DESC, user_id ASC LIMIT {SKEW_TOP}
      )
    )
    SELECT t.n_rows, t.n_keys, t.mean_per_key, t.max_per_key,
           round(t.max_per_key / t.mean_per_key, 4) AS skew_factor,
           round(top.top_rows * 1.0 / t.n_rows, 6)
             AS top{SKEW_TOP}_share
    FROM t, top
    """,
)
def quality_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic for the pipeline's hottest shuffle key
    (user_id): max-over-mean rows per key and the row share owned by
    the {SKEW_TOP} heaviest keys — the numbers that decide whether the
    per-user windows and joins need salting (operators/skew.py's
    salted variant) or AQE's skew-join split before a 100 TB run, read
    BEFORE the job instead of from its straggler tasks after.

    Scale: one map-side-combinable key count, a constant-size moment
    aggregate, and a {SKEW_TOP}-row TakeOrdered — the diagnostic costs
    one shuffle of pre-combined (key, count) pairs, nothing else."""
    from kafka_go_streamer_spark.operators.iterate import pinned

    ev = load_table(spark, sf_dir, "events")
    k = pinned(
        ev.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
    )
    t = k.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
        F.max("c").cast("long").alias("max_per_key"),
        stable_round(F.avg("c"), 6).alias("mean_per_key"),
    )
    top = (
        k.orderBy(F.col("c").desc(), F.col("user_id").asc())
        .limit(SKEW_TOP)
        .agg(F.sum("c").cast("long").alias("top_rows"))
    )
    return t.crossJoin(F.broadcast(top)).select(
        "n_rows",
        "n_keys",
        "mean_per_key",
        "max_per_key",
        stable_round(
            F.col("max_per_key") / F.col("mean_per_key"), 4
        ).alias("skew_factor"),
        stable_round(
            F.col("top_rows") * 1.0 / F.col("n_rows"), 6
        ).alias(f"top{SKEW_TOP}_share"),
    )


def _half_life_oracle() -> str:
    from kafka_go_streamer_spark.plans.registry import ORACLES

    ret = ORACLES["events_retention_weekly"]
    return f"""
    WITH r AS ({ret}),
    base AS (
      SELECT cohort_week, n_active AS cohort_size FROM r
      WHERE week_offset = 0
    ),
    pts AS (
      SELECT cohort_week, cohort_size, k, ln(ratio) AS ly
      FROM (
        SELECT r.cohort_week, b.cohort_size,
               r.week_offset * 1.0 AS k,
               round(r.n_active * 1.0 / b.cohort_size, 6) AS ratio
        FROM r JOIN base b USING (cohort_week)
        WHERE r.week_offset >= 1
      ) WHERE ratio > 0
    ),
    fit AS (
      SELECT cohort_week, max(cohort_size)::BIGINT AS cohort_size,
             count(*)::BIGINT AS n_weeks,
             (count(*) * sum(k * ly) - sum(k) * sum(ly))
               / (count(*) * sum(k * k) - sum(k) * sum(k)) AS slope
      FROM pts GROUP BY 1 HAVING count(*) >= 2
    )
    SELECT cohort_week, cohort_size, n_weeks,
           round(slope, 4) AS decay_slope,
           CASE WHEN slope < 0
                THEN round(-ln(2) / slope, 2) END AS half_life_weeks
    FROM fit ORDER BY cohort_week
    """


@query("events_cohort_half_life", oracle=_half_life_oracle)
def events_cohort_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention half-life per weekly cohort: fit ln(retentionₖ) ~ k
    over the cohort's observed weeks (exponential-decay model) and
    report −ln2/slope — "in how many weeks does this cohort halve?",
    the single number product teams track across launches instead of
    eyeballing the full retention triangle. Composes the retention
    query's own counts, so triangle and half-life can never disagree.

    Scale: everything data-sized is the retention subplan's audited
    shape (two user-cardinality aggregates over one reused exchange);
    the log-linear fit is one grouped aggregate over the
    cohort×offset-cardinality triangle — weeks-squared rows at most.
    Retention ratios round to 6 before the log; a non-decaying cohort
    (slope ≥ 0) reports NULL half-life on both engines. A week whose
    6-rounded retention ratio collapses to 0 (cohort > ~2M users with
    a lone survivor) is excluded from the fit on BOTH engines before
    the log — otherwise DuckDB hard-errors on ln(0) while Spark emits
    a NULL that count(*) keeps but the sums skip, skewing the slope
    (ADVICE r9)."""
    from kafka_go_streamer_spark.operators.iterate import pinned
    from kafka_go_streamer_spark.plans.registry import QUERIES as _Q

    r = pinned(_Q["events_retention_weekly"](spark, sf_dir))
    base = r.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    pts = (
        r.filter(F.col("week_offset") >= 1)
        .join(F.broadcast(base), "cohort_week")
        .select(
            "cohort_week",
            "cohort_size",
            (F.col("week_offset") * 1.0).alias("k"),
            stable_round(
                F.col("n_active") * 1.0 / F.col("cohort_size"), 6
            ).alias("ratio"),
        )
        .filter(F.col("ratio") > 0)
        .select(
            "cohort_week",
            "cohort_size",
            "k",
            F.log("ratio").alias("ly"),
        )
    )
    cnt = F.count(F.lit(1))
    slope = (
        cnt * F.sum(F.col("k") * F.col("ly"))
        - F.sum("k") * F.sum("ly")
    ) / (cnt * F.sum(F.col("k") * F.col("k")) - F.sum("k") * F.sum("k"))
    fit = (
        pts.groupBy("cohort_week")
        .agg(
            F.max("cohort_size").cast("long").alias("cohort_size"),
            cnt.cast("long").alias("n_weeks"),
            slope.alias("slope"),
        )
        .filter(F.col("n_weeks") >= 2)
    )
    return fit.select(
        "cohort_week",
        "cohort_size",
        "n_weeks",
        stable_round(F.col("slope"), 4).alias("decay_slope"),
        F.when(
            F.col("slope") < 0,
            stable_round(-F.log(F.lit(2.0)) / F.col("slope"), 2),
        ).alias("half_life_weeks"),
    ).orderBy("cohort_week")
