"""Second wave of TPC-H-shaped classics (Q5, Q7, Q8, Q10, Q13, Q15,
Q17, Q18, Q19, Q21, Q22 shapes), adapted to the driver schema.

Adaptations forced by the schema (TESTDATA.md): there is no partsupp
table (so Q2/Q9/Q11/Q16/Q20 have no equivalent), no commitdate /
receiptdate (lateness = shipped >60 days after order date, as in
tpch_classics Q4/Q12), no c_phone (Q22 buckets by nation instead of
phone country code), no p_container (Q17/Q19 predicate on p_size
instead). Nations are named NATION_0..NATION_24.

The reference engine has none of these operators (SURVEY.md §2.2 —
joins/aggs all "absent"); these queries pin the decision-support
shapes — multi-way star joins, disjunctive pushdown, correlated
aggregates, semi/anti self-joins, scalar subqueries — that a
100 TB warehouse engine lives on. Every query carries its scale
rationale inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.sources.tables import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
             AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: 6-way star join — revenue by nation where the customer
    and the supplier sit in the same nation, region-restricted.

    Scale: customer/supplier/nation/region are all dimensions →
    broadcast; lineitem joins orders on the order key (the one real
    shuffle pair), and the same-nation constraint rides along as a
    post-broadcast filter, never a second shuffle. The region filter
    prunes the nation broadcast before it reaches the fact table."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy("n_name")
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           year(l.l_shipdate)::INTEGER AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
             AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume — revenue shipped between two
    fixed nations, either direction, by ship year. Exercises the
    same-table-twice (nation as both supplier-side and customer-side)
    join and a disjunctive cross-dimension predicate.

    Scale: both nation copies, customer, and supplier broadcast; the
    disjunction evaluates after the broadcasts so the only shuffle is
    lineitem⋈orders on the order key; the pair filter collapses the
    output before the tiny final aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("ns_key") == s.s_nationkey)
        .join(F.broadcast(nc), F.col("nc_key") == c.c_nationkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT year(o.o_orderdate)::INTEGER AS o_year,
           round(sum(CASE WHEN ns.n_name = 'NATION_1'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4)
             AS mkt_share
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = nc.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of revenue sold into a region, per
    order year — a conditional-sum ratio over a deep star join.

    Scale: identical join topology to Q5/Q7 (one fact shuffle, all
    dimensions broadcast); the share is two map-side-combined sums in
    one aggregate, so the join output reduces to ~years rows before the
    final exchange — no second pass over the fact table for the
    denominator."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1995-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("nc_key") == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == F.col("nc_region"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("ns_key") == s.s_nationkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            stable_round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(0.0)
                )
                / F.sum(rev),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
             AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 customers by revenue lost to returns in a
    half-year window.

    Scale: returnflag + orderdate predicates push to the scans; the
    grouped revenue reduces per customer before the global top-20,
    which compiles to TakeOrderedAndProject (per-partition heaps —
    no full sort at any scale). Ordering on the ROUNDED revenue with
    the unique custkey tiebreak keeps the limit cross-engine-stable."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


@query(
    "tpch_q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q13 shape: histogram of per-customer order counts, keeping
    zero-order customers via an outer join with an extra join-side
    predicate (the canonical comment-filter, adapted to priority).

    Scale: the non-equi part of the condition stays in the join (NOT a
    post-filter — that would turn LEFT JOIN + filter into an inner
    join and drop the zero bucket); count(o_orderkey) counts only
    matched rows. Two cheap aggregates: first keyed by custkey (the
    join's own partitioning is reused — no extra shuffle), then by the
    tiny count domain."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev.total_revenue
    FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    WHERE rev.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the supplier(s) achieving maximum quarterly revenue —
    the classic "view + scalar max" query.

    Scale: per-supplier revenue is one map-side-combined aggregate over
    the date-pruned scan; the scalar max is computed from that tiny
    aggregate (supplier-cardinality rows) and broadcast back — NOT a
    global window over an unpartitioned sort, which would single-thread
    at scale. Comparing on the ROUNDED revenue keeps the max-equality
    cross-engine-exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        stable_round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("mx"))
        .join(F.broadcast(s), s.s_suppkey == rev.l_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue that would be lost by refusing small-quantity
    orders — a correlated per-part average threshold (adapted: brand
    filter only, this schema has no p_container).

    Scale: the correlated subquery decorrelates into a per-part
    aggregate of lineitem joined back on partkey. The per-part avg
    table is part-cardinality (dimension-sized) → broadcast, so the
    fact table sees one scan + one broadcast probe, no self-shuffle.
    The brand filter is applied to the part dimension BEFORE the join,
    pruning both sides."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(per_part), li.l_partkey == F.col("pp_key"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            stable_round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


@query(
    "tpch_q18_large_volume_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 10
    """,
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: the orders whose total quantity exceeds 300 units,
    with their customers — an IN-subquery over a grouped HAVING.

    Scale: the qualifying-orderkey set is computed once by a map-side-
    combined aggregate and joined back LEFT SEMI on the order key —
    at 100 TB that set is tiny relative to lineitem (HAVING > 300
    is a high bar), so the semi join prunes the fact table before the
    wide customer join. Top-10 compiles to TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 300)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(big, li.l_orderkey == F.col("big_key"), "left_semi")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(stable_round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
             AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 25)
       OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 35)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue under a 3-arm disjunction of conjunctive
    brand/size/quantity predicates (adapted: p_size stands in for the
    missing p_container).

    Scale: Catalyst extracts the common l_partkey=p_partkey equi-key
    so this stays a broadcast hash join (NOT a cartesian with a post
    filter — the historical Q19 trap); the per-side halves of each
    disjunct (brand+size on part, quantity on lineitem's scan via
    OR-derived bounds) evaluate before/inside the join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    arm = lambda brand, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s_lo, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return j.filter(
        arm("Brand#11", 1, 15, 1, 15)
        | arm("Brand#22", 10, 30, 10, 25)
        | arm("Brand#33", 20, 50, 20, 35)
    ).agg(
        stable_round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch_q21_suppliers_kept_waiting",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def tpch_q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier finalized order (lateness = >60 days after order
    date, as in Q4/Q12 — no receiptdate in this schema).

    Scale: the classic semi+anti self-join pair. Both EXISTS arms
    become LEFT SEMI / LEFT ANTI joins of lineitem against itself on
    the order key — each a single shuffle on l_orderkey that AQE can
    co-plan with the l1⋈orders shuffle on the same key (one exchange
    reused three times, no nested-loop anywhere). The suppkey
    inequality rides inside the join condition, not a post-filter."""
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    # ONE lineitem⋈orders definition shared by both late-line branches:
    # the order-key shuffle (SortMergeJoin at real scale) is planned
    # once and reused (ReusedExchange) instead of re-joining per EXISTS
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_suppkey").alias("sk"),
        F.col("o_orderstatus").alias("status"),
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("is_late"),
    )
    l1 = lo.filter((F.col("status") == "F") & F.col("is_late")).select(
        F.col("ok").alias("wk"), F.col("sk").alias("ws")
    )
    other = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    late_other = lo.filter(F.col("is_late")).select(
        F.col("ok").alias("ok3"), F.col("sk").alias("sk3")
    )
    waiting = (
        l1.join(
            other,
            (F.col("wk") == F.col("ok2")) & (F.col("ws") != F.col("sk2")),
            "left_semi",
        )
        .join(
            late_other,
            (F.col("wk") == F.col("ok3")) & (F.col("ws") != F.col("sk3")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(s), F.col("ws") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@query(
    "tpch_q22_idle_customer_balance",
    oracle="""
    SELECT n.n_name, count(*) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (
        SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY n.n_name
    """,
)
def tpch_q22_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: wealthy-but-dormant customers — above-average
    balance, no orders since 1999 — counted per nation (adapted:
    nation stands in for the missing c_phone country code; the
    recency cutoff replaces "no orders ever", which is empty in this
    data where nearly every customer has some order).

    Scale: the global average is an uncorrelated scalar subquery →
    one tiny aggregate broadcast into the filter; NOT EXISTS becomes a
    LEFT ANTI join against orders on the customer key. The anti join
    only needs orders' o_custkey column (column pruning reaches the
    scan); nation broadcasts."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("1999-01-01"))
        .select("o_custkey")
    )
    n = load_table(spark, sf_dir, "nation")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            stable_round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
