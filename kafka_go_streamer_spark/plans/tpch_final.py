"""Final wave of TPC-H shapes: Q2, Q9, Q11, Q16, Q20 — the five that
need the ``partsupp`` table, which the driver schema lacks (TESTDATA.md).
Each derives the supplier-part facts it needs from ``lineitem`` (the
distinct (l_partkey, l_suppkey) pairs ARE a supply relation with
observable unit costs and quantities), so the canonical plan shapes —
correlated min-per-group (Q2), multi-dim profit rollup (Q9), scalar
aggregate threshold (Q11), NOT-IN anti join under count-distinct (Q16),
nested correlated semi join (Q20) — are all exercised against real keys.

The reference engine (a per-message router, SURVEY.md §2.2) has none of
these; with this module the repo covers all 22 TPC-H query shapes
(Q1 = agg_pricing_summary, Q6 = tpch_q6_forecast_revenue, ...).

Scale notes ride on each query; the shared one: the derived supply
relation is ONE shuffle on (l_partkey, l_suppkey) — at 100 TB that
aggregation is map-side-combinable (few distinct pairs per input split)
and every dimension joined after it broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.sources.tables import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived supply relation: per (part, supplier) pair, the minimum
    observed unit price across all lineitems — the stand-in for
    partsupp.ps_supplycost. Rounded at 2 decimals BEFORE any min-per-
    group comparison so both engines compare identical quanta."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey", "l_suppkey").agg(
        stable_round(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")), 2
        ).alias("unit_cost")
    )


_SUPPLY_SQL = """
  SELECT l_partkey, l_suppkey,
         round(min(l_extendedprice / l_quantity), 2) AS unit_cost
  FROM lineitem GROUP BY 1, 2
"""


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL}),
    eu AS (
      SELECT p.p_partkey, p.p_brand, s.s_name, s.s_acctbal,
             n.n_name, su.unit_cost
      FROM supply su
      JOIN supplier s ON s.s_suppkey = su.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      JOIN part p     ON p.p_partkey = su.l_partkey
      WHERE r.r_name = 'EUROPE' AND p.p_size = 5
    )
    SELECT p_partkey, p_brand, s_name, s_acctbal, n_name, unit_cost
    FROM eu
    WHERE unit_cost = (SELECT min(e2.unit_cost) FROM eu e2
                       WHERE e2.p_partkey = eu.p_partkey)
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for every size-5 part, the European supplier(s) offering
    the minimum unit cost — the classic correlated min-per-group.

    Scale: the correlated subquery decorrelates into a window min over
    the SAME region-filtered relation (one shuffle for the supply agg,
    one partition-local window on p_partkey — no second scan, no
    re-join of the subquery as a separate aggregate). All four
    dimensions broadcast; the region filter prunes the supplier
    broadcast before it touches the supply rows."""
    su = _supply(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 5)
    eu = (
        su.join(F.broadcast(s), su.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .join(F.broadcast(p), p.p_partkey == su.l_partkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        eu.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            "p_partkey", "p_brand", "s_name", "s_acctbal", "n_name",
            "unit_cost",
        )
    )


@query(
    "tpch_q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation,
           year(o.o_orderdate)::INTEGER AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - 0.01 * p.p_retailprice * l.l_quantity), 2) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
                   AND contains(p.p_name, 'gear')
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit on a product family ('gear' parts) by supplier
    nation and order year. partsupp.ps_supplycost becomes a retail-price
    cost proxy (1% of retail per unit) — same expression shape, same
    join graph minus the partsupp hop.

    Scale: part/supplier/nation broadcast (part is filtered to the
    family BEFORE broadcast, so the broadcast ships only matching
    parts and doubles as the lineitem filter); lineitem⋈orders on the
    order key is the one shuffle; the (nation, year) rollup is a few
    hundred groups — partial aggregation collapses it map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("gear")
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - (
        0.01 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(stable_round(F.sum(amount), 2).alias("profit"))
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH sup_val AS (
      SELECT l.l_partkey AS ps_partkey,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
               AS stock_value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY 1
    )
    SELECT ps_partkey, stock_value
    FROM sup_val
    WHERE stock_value > (SELECT round(sum(stock_value) * 0.001, 2)
                         FROM sup_val)
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose NATION_3-supplied value exceeds a fixed
    fraction of the nation's total — a scalar aggregate subquery
    gating the same aggregate it is derived from.

    Scale: the nation filter broadcasts INTO the lineitem scan (tiny
    supplier dim), one shuffle groups by part, and the scalar total is
    a one-row broadcast joined back — the per-part relation is
    computed ONCE and reused for both sides (no second scan of
    lineitem for the denominator)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    sup_val = (
        li.join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("stock_value")
        )
    )
    # threshold rounded at the same 2dp quantum as the per-part values:
    # an unrounded corpus-wide sum is exactly the cross-engine FP-drift
    # class functions/rounding.py exists to prevent (summation order
    # differs per engine; a part landing within ~1e-9 of the raw
    # threshold would flip the > between engines)
    total = sup_val.agg(
        stable_round(F.sum("stock_value") * F.lit(0.001), 2).alias(
            "threshold"
        )
    )
    return (
        sup_val.join(F.broadcast(total))
        .filter(F.col("stock_value") > F.col("threshold"))
        .select("ps_partkey", "stock_value")
    )


@query(
    "tpch_q16_supplier_relationship",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
      )
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16_supplier_relationship(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q16 shape: how many distinct suppliers can deliver each
    (brand, type, size) bucket, excluding a complaint blacklist —
    NOT IN compiled as a broadcast anti join under count-distinct.

    Scale: the blacklist subquery is a tiny broadcast anti join (NOT
    IN with a non-nullable key — no null-semantics trap); the part
    filter broadcasts; the only shuffle is the count-distinct's
    two-phase (partial distinct per map task, then exchange on the
    group key)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25)
    )
    excl = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").endswith("7"))
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(
            F.broadcast(excl), li.l_suppkey == excl.s_suppkey, "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20_part_promotion",
    oracle="""
    WITH shipped96 AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty96
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ),
    alltime AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty_all
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT a.l_suppkey
      FROM alltime a
      JOIN shipped96 g ON g.l_partkey = a.l_partkey
                      AND g.l_suppkey = a.l_suppkey
      JOIN part p ON p.p_partkey = a.l_partkey
      WHERE p.p_name LIKE 'red%'
        AND a.qty_all >= 40
        AND g.qty96 > 0.5 * a.qty_all
    )
    """,
)
def tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers who moved more than half their all-time
    volume (≥40 units of history, so one-shot pairs don't trivially
    qualify) of a 'red' part during 1996 — partsupp.ps_availqty becomes
    the all-time shipped quantity, and the nested IN-subquery chain
    (supplier IN (... part IN (...))) keeps the two-level semi-join
    plan.

    Scale: both quantity rollups come from the same lineitem scan and
    shuffle on the same (part, supplier) key, so the 96⋈alltime join
    is co-partitioned (no extra exchange under AQE); the part-name
    filter broadcasts; the final supplier gate is a semi join against
    a small distinct set. Quantities are whole numbers — the >½ gate
    is exact in FP on both engines, no rounding epsilon needed."""
    li = load_table(spark, sf_dir, "lineitem")
    shipped96 = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty96"))
    )
    alltime = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty_all")
    )
    promo = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    cand = (
        alltime.join(shipped96, ["l_partkey", "l_suppkey"])
        .join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            (F.col("qty_all") >= 40)
            & (F.col("qty96") > 0.5 * F.col("qty_all"))
        )
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    return s.join(
        cand, s.s_suppkey == cand.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name", "s_acctbal")
