"""TPC-H-shaped analytic classics over the test schema, plus cluster
assignment over embeddings.

The reference engine has no relational queries at all (SURVEY.md §2.2
— joins/aggs/windows all "absent"); these pin the engine's behavior on
the canonical decision-support shapes every OLAP engine is judged by,
adapted to the driver schema (lineitem here has no
commitdate/receiptdate/shipmode, so Q4/Q12 use shipdate-vs-orderdate
lateness). Every query carries its scale rationale inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.sources.tables import load_table


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
             AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND l.l_shipdate > TIMESTAMP '1996-07-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: segment-filtered 3-way star join -> grouped revenue ->
    top 10.

    Scale: customer is the small side (broadcast); lineitem never
    shuffles before its filter; top-10 compiles to
    TakeOrderedAndProject (per-partition heaps, no global sort).
    Ordering key is the ROUNDED revenue so the cross-engine tiebreak is
    exact, with (orderdate, orderkey) completing determinism."""
    cutoff = F.lit("1996-07-01").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@query(
    "tpch_q4_late_orders",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_late
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: order-priority counts of orders with at least one late
    line (EXISTS). Adapted: lateness = shipped >60 days after order
    date (this schema has no commitdate/receiptdate).

    Scale: EXISTS plans as a LEFT SEMI join on the order key — the
    lineitem side never duplicates order rows and the semi join
    short-circuits per key; one shuffle pair on l_orderkey."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late_lines = li.alias("l").join(
        o.select("o_orderkey", "o_orderdate").alias("oo"),
        F.col("l.l_orderkey") == F.col("oo.o_orderkey"),
    ).filter(
        F.col("l.l_shipdate")
        > F.col("oo.o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).select(F.col("l.l_orderkey").alias("lk"))
    return (
        o.join(late_lines, o.o_orderkey == F.col("lk"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2)
             AS forecast_revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.08
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: pure filter + global aggregate, the pushdown
    benchmark — every predicate is scan-pushable and the aggregate is
    a single partial+final pair with no grouping key."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.04, 0.08))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("forecast_revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "tpch_q12_ship_delay_buckets",
    oracle="""
    SELECT year(l.l_shipdate)::INTEGER AS ship_year,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    GROUP BY 1
    """,
)
def tpch_q12_ship_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: join + conditional two-way priority counts of slow
    shipments per ship year (adapted: slow = >30 days after order
    date; this schema has no shipmode/receiptdate).

    Scale: single equi-join shuffle pair on the order key; the CASE
    aggregation is map-side combined, so the wide fact join output
    collapses to ~years rows before the final exchange."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        )
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4)
             AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo revenue share over a ship-date window.

    Scale: part is a dimension -> broadcast, so the fact table is
    filtered by pushed scan predicates and never shuffles; the ratio
    is two map-side-combined sums in one aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            stable_round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "kmeans_assign_nearest_centroid",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ),
    cent AS (
      SELECT label AS c_label, pos, avg(v::DOUBLE) AS c
      FROM ex GROUP BY label, pos
    ),
    dist AS (
      SELECT ex.vec_id, cent.c_label,
             round(sum((ex.v::DOUBLE - cent.c) * (ex.v::DOUBLE - cent.c)),
                   4) AS d2
      FROM ex JOIN cent ON ex.pos = cent.pos
      GROUP BY ex.vec_id, cent.c_label
    ),
    ranked AS (
      SELECT vec_id, c_label AS assigned_label, d2,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY d2, c_label) AS rn
      FROM dist
    )
    SELECT vec_id, assigned_label, d2 FROM ranked WHERE rn = 1
    """,
)
def kmeans_assign_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means assignment step: every embedding goes to its nearest
    label-centroid (squared L2), the building block of IVF training and
    cluster-balanced corpus sampling.

    Scale shape: centroids are a TINY table (labels x dims) computed by
    one hash aggregate and then BROADCAST; distances accumulate
    relationally — explode once, join on dim position, one hash
    aggregate on (vec, centroid) — so nothing ever collects to the
    driver and the fan-out is rows x dims x k with k and dims bounded.
    Argmin = row_number window over k rows per vec, deterministic via
    the (d2, label) tiebreak on ROUNDED (4dp — cross-engine ulp-safe)
    distances."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "label", "pos", F.col("v").cast("double").alias("v"))
    cent = (
        ex.groupBy(F.col("label").alias("c_label"), "pos")
        .agg(F.avg("v").alias("c"))
    )
    dist = (
        ex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "c_label")
        .agg(
            stable_round(
                F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))), 4
            ).alias("d2")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "c_label")
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("c_label").alias("assigned_label"), "d2")
    )
