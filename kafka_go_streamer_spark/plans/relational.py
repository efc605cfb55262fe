"""Relational operator surface (SURVEY.md §2.2): aggregations, joins,
window functions, sorts/top-k, set ops, scalar function families.

The reference has none of these (it is a stateless router,
reference main.go:507-542); this is the committed Spark-native extension
surface. Every query is a declarative DataFrame composition — Catalyst
handles pushdown/pruning/join selection — with an ANSI-SQL DuckDB twin.

Scale notes per query are inline: which side broadcasts, where the
shuffles are, and why the plan survives 100x data.

Float discipline: every float aggregate is rounded identically on both
sides so order-insensitive value hashes are bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round

from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@query(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: the canonical hash-aggregate.

    Scale: partial aggregation map-side then one shuffle on a 6-value
    group key — the shuffle payload is O(partitions x groups), constant
    in input size."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_round(F.sum("l_quantity"), 2).alias("sum_qty"),
            stable_round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            stable_round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            stable_round(F.avg("l_quantity"), 4).alias("avg_qty"),
            stable_round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            stable_round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_orders_by_priority",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           count(*)                       AS n_orders,
           round(sum(o_totalprice), 2)    AS total,
           round(avg(o_totalprice), 4)    AS avg_price,
           round(min(o_totalprice), 2)    AS min_price,
           round(max(o_totalprice), 2)    AS max_price
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    """,
)
def agg_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/sum/avg/count family over a low-cardinality composite key."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            stable_round(F.sum("o_totalprice"), 2).alias("total"),
            stable_round(F.avg("o_totalprice"), 4).alias("avg_price"),
            stable_round(F.min("o_totalprice"), 2).alias("min_price"),
            stable_round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey)  AS n_customers,
           count(*)                   AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg in Spark).

    Scale: countDistinct shuffles by (group, distinct value) first, so it
    stays balanced even when one status dominates."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*)                  AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical grouping sets (rollup -> subtotals + grand total)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            stable_round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full grouping-set lattice."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(stable_round(F.sum("l_extendedprice"), 2).alias("sum_price"))
    )


@query(
    "agg_conditional_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'view')     AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           round(sum(value) FILTER (WHERE event_type = 'purchase'), 2) AS purchase_value
    FROM events
    GROUP BY user_id
    """,
)
def agg_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via groupBy().pivot(): wide per-entity feature vector.

    Scale: pivot over a *known, fixed* value list (no extra pass to
    discover values), one shuffle on user_id."""
    ev = _t(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    counts = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL for empty cells; normalize to 0 like FILTER does
    for k in kinds:
        counts = counts.withColumn(k, F.coalesce(F.col(k), F.lit(0)))
    pv = ev.filter(F.col("event_type") == "purchase").groupBy("user_id").agg(
        stable_round(F.sum("value"), 2).alias("purchase_value")
    )
    return counts.join(pv, "user_id", "left")


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4)  AS sd_price,
           round(var_samp(l_extendedprice), 4)     AS var_price,
           round(median(l_extendedprice), 4)       AS median_price,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/median/correlation."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        stable_round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        stable_round(F.var_samp("l_extendedprice"), 4).alias("var_price"),
        stable_round(F.median("l_extendedprice"), 4).alias("median_price"),
        stable_round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "join_revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped star join.

    Scale: nation/region are broadcast (constant size at every SF);
    customer is broadcast below the threshold, else AQE picks
    sort-merge; the only unavoidable shuffle is lineitem->orders on
    orderkey. Filters reach the parquet scans (pushdown)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "join_top_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, c.c_mktsegment,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate, c.c_mktsegment
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def join_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped join + global top-k.

    Scale: global LIMIT after ORDER BY is a TakeOrderedAndProject —
    each partition keeps its local top-10, driver merges k x partitions
    rows, never a full sort."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "c_mktsegment")
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers having at least one big order."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): dead-letter analogue in relational
    form — rows matching no partner, like the router's unmatched path."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_outer_nation_order_counts",
    oracle="""
    SELECT n.n_name, count(o.o_orderkey) AS n_orders
    FROM nation n
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    LEFT JOIN orders o   ON o.o_custkey = c.c_custkey
    GROUP BY n.n_name
    """,
)
def join_outer_nation_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER joins preserving empty nations (count(col) skips NULLs)."""
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        nation.join(cust, cust.c_nationkey == nation.n_nationkey, "left")
        .join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("n_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "window_topk_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice, rn
    FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             row_number() OVER (
               PARTITION BY p_brand
               ORDER BY p_retailprice DESC, p_partkey ASC
             ) AS rn
      FROM part
    ) WHERE rn <= 3
    """,
)
def window_topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number window.

    Scale: one shuffle on the partition key; Spark inserts a
    WindowGroupLimit (rank-based top-k pushdown) so each partition keeps
    only k rows before the sort at scale."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rn")
    )


@query(
    "window_rank_dense_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over one window definition."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_lag_lead_order_gap",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           date_diff('day',
                     lag(o_orderdate) OVER w,
                     o_orderdate)::INTEGER AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def window_lag_lead_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + event-gap derivation per entity (sessionization building
    block)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("days_since_prev"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_total
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum with an explicit ROWS frame."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        stable_round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (
             PARTITION BY user_id
             ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 4) AS moving_avg
    FROM events
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame (3-event moving average per user)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        stable_round(F.avg("value").over(w), 4).alias("moving_avg"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / set ops
# ---------------------------------------------------------------------------


@query(
    "sort_global_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 20
    """,
)
def sort_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT -> TakeOrderedAndProject (no full sort)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(20)
    )


@query(
    "set_ops_customer_cohorts",
    oracle="""
    WITH q1 AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
         q2 AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    SELECT 'both' AS cohort, count(*) AS n FROM (SELECT * FROM q1 INTERSECT SELECT * FROM q2)
    UNION ALL
    SELECT 'only_1996' AS cohort, count(*) AS n FROM (SELECT * FROM q1 EXCEPT SELECT * FROM q2)
    UNION ALL
    SELECT 'either' AS cohort, count(*) AS n FROM (SELECT * FROM q1 UNION SELECT * FROM q2)
    """,
)
def set_ops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION over yearly customer cohorts."""
    orders = _t(spark, sf_dir, "orders")

    def year_custs(y: int) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    q1, q2 = year_custs(1996), year_custs(1997)
    spark_row = lambda name, df: df.agg(  # noqa: E731
        F.lit(name).alias("cohort"), F.count(F.lit(1)).alias("n")
    ).select("cohort", "n")
    return (
        spark_row("both", q1.intersect(q2))
        .unionByName(spark_row("only_1996", q1.exceptAll(q2)))
        .unionByName(spark_row("either", q1.union(q2).distinct()))
    )


# ---------------------------------------------------------------------------
# Scalar function families
# ---------------------------------------------------------------------------


@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           lower(p_name)                                   AS name_lower,
           upper(p_brand)                                  AS brand_upper,
           length(p_name)::INTEGER                         AS name_len,
           concat_ws('|', p_brand, p_type)                 AS brand_type,
           string_split(p_name, ' ')[1]                    AS first_word,
           regexp_extract(p_name, '([a-z]+)$', 1)          AS last_word,
           substring(p_type, 1, 3)                         AS type_prefix,
           replace(p_name, ' ', '_')                       AS name_snake,
           ltrim(rtrim('  ' || p_brand || '  '))           AS trimmed,
           CASE WHEN p_name LIKE '%bolt%' THEN 1 ELSE 0 END AS has_bolt
    FROM part
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family: case, length, concat, split, regex
    extraction, substring, replace, trim, LIKE."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.substring("p_type", 1, 3).alias("type_prefix"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.ltrim(F.rtrim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  ")))).alias(
            "trimmed"
        ),
        F.when(F.col("p_name").like("%bolt%"), 1).otherwise(0).alias("has_bolt"),
    )


@query(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)::INTEGER                     AS yr,
           month(o_orderdate)::INTEGER                    AS mo,
           dayofmonth(o_orderdate)::INTEGER               AS dom,
           date_trunc('month', o_orderdate)::TIMESTAMP    AS month_start,
           date_diff('day', DATE '1995-01-01',
                     o_orderdate::DATE)::INTEGER          AS days_since_epoch95,
           (o_orderdate + INTERVAL 90 DAY)                AS due_date,
           strftime(o_orderdate, '%Y-%m')                 AS ym
    FROM orders
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract, trunc, diff, interval arithmetic,
    formatting."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch95"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@query(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 50000), 2)     AS abs_delta,
           floor(l_quantity)::BIGINT                  AS qty_floor,
           ceil(l_quantity)::BIGINT                   AS qty_ceil,
           round(sqrt(l_extendedprice), 6)            AS price_sqrt,
           round(ln(l_extendedprice + 1), 6)          AS price_ln,
           round(pow(l_discount, 2), 6)               AS disc_sq,
           (l_orderkey % 7)::BIGINT                   AS key_mod,
           round(greatest(l_tax, l_discount), 2)      AS max_rate,
           round(least(l_tax, l_discount), 2)         AS min_rate,
           sign(l_extendedprice - 50000)::DOUBLE      AS price_sign
    FROM lineitem
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric function family: abs/floor/ceil/sqrt/ln/pow/mod/
    greatest/least/sign."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        stable_round(F.abs(F.col("l_extendedprice") - 50000), 2).alias("abs_delta"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil("l_quantity").alias("qty_ceil"),
        stable_round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        stable_round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        stable_round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        stable_round(F.greatest("l_tax", "l_discount"), 2).alias("max_rate"),
        stable_round(F.least("l_tax", "l_discount"), 2).alias("min_rate"),
        F.signum(F.col("l_extendedprice") - 50000).alias("price_sign"),
    )


@query(
    "json_extraction",
    oracle="""
    SELECT event_id, event_type,
           json_extract_string(props, '$.k')::INTEGER AS k
    FROM events
    WHERE json_extract_string(props, '$.k')::INTEGER > 50
    """,
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props envelope — the parse
    the reference never did on its JSON-ish payloads."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select("event_id", "event_type", k.alias("k")).filter(
        F.col("k") > 50
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT n.n_name, o.o_orderpriority,
           CAST(grouping(n.n_name) AS INTEGER) AS g_nation,
           CAST(grouping(o.o_orderpriority) AS INTEGER) AS g_priority,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total_price
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    GROUP BY GROUPING SETS ((n.n_name, o.o_orderpriority), (n.n_name), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS lattice (finer than rollup/cube: only the
    three levels asked for) with grouping() flags disambiguating real
    NULLs from subtotal rows.

    Scale: Spark expands grouping sets into a single Expand + one hash
    aggregate — one shuffle total, not one scan per set; the customer
    and nation dimensions broadcast before the expansion so the fact
    rows fan out only by the 3 requested sets."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).join(
        F.broadcast(n), n.n_nationkey == c.c_nationkey
    )
    return joined.groupingSets(
        [["n_name", "o_orderpriority"], ["n_name"], []],
        "n_name",
        "o_orderpriority",
    ).agg(
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
        stable_round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@query(
    "window_range_frame_1h",
    oracle="""
    SELECT event_id, user_id, ts,
           round(sum(value) OVER w, 2) AS rolling_1h_value,
           count(*) OVER w AS n_events_1h
    FROM events
    WINDOW w AS (
      PARTITION BY user_id
      ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
    )
    """,
)
def window_range_frame_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame keyed on event time: per user, the rolling 1-hour
    sum/count ending at each event — a value-based frame (all peers of
    the current second included), not a row-count frame.

    Scale: one shuffle on user_id then a per-partition ordered scan
    with a sliding two-pointer frame — no self-join re-derivation of
    the window (the O(n·w) trap). Frame key = epoch seconds on both
    engines (floor, not round) so frames agree exactly."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("timestamp").cast("long"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        stable_round(F.sum("value").over(w), 2).alias("rolling_1h_value"),
        F.count(F.lit(1)).over(w).alias("n_events_1h"),
    )


@query(
    "window_distribution_ranks",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           first_value(o_orderkey) OVER (
             PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS top_order_in_priority
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
)
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank + cume_dist within
    order priority, plus first_value over a full-partition frame (the
    per-group champion) — deterministic via the orderkey tiebreak.

    Scale: all three share one partitioning (priority) so Catalyst
    plans a single window exchange+sort; first_value's unbounded frame
    is computed in the same pass."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    w_top = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        stable_round(F.percent_rank().over(w), 6).alias("pct_rank"),
        stable_round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w_top).alias("top_order_in_priority"),
    )


@query(
    "json_variant_stats",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           sum(json_extract_string(props, '$.k')::INTEGER)::BIGINT AS k_sum,
           round(avg(json_extract_string(props, '$.k')::INTEGER), 4) AS k_avg
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
)
def json_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type:
    ``parse_json`` decodes each props payload ONCE into the binary
    variant encoding, and field access is ``variant_get`` path lookup
    over that encoding — the engine-native path for JSON at scale
    (contrast ``json_extraction``, which re-parses the raw string per
    ``get_json_object`` call; with many extracted fields the variant
    form parses once where the string form parses per field).

    Scale: parse + path-get are codegen'd row-local expressions; the
    aggregate is one map-side-combined shuffle on event_type.
    ``try_parse_json`` would null out malformed rows instead of
    failing the query — the fixture's props are clean, so the strict
    parse doubles as an input contract."""
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("k_sum"),
            stable_round(F.avg("k"), 4).alias("k_avg"),
        )
    )
