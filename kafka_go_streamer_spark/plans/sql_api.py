"""Queries expressed through the SQL API (``spark.sql`` over temp
views) and the array/higher-order-function family — same Catalyst plans
as the DataFrame API, registered to prove the SQL surface end-to-end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.sources.tables import load_table


@query(
    "sql_api_monthly_revenue",
    oracle="""
    SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS ym,
           count(DISTINCT o.o_orderkey) AS n_orders,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus <> 'F'
    GROUP BY 1
    """,
)
def sql_api_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue rollup written as literal Spark SQL — Catalyst
    produces the same plan as the DataFrame form; registered through
    temp views like a warehouse query.

    The Spark-side SQL runs through the SAME ``stabilize_rounds``
    rewrite the oracle gets (the epsilon syntax is engine-neutral):
    a raw-SQL query is the one place ``stable_round`` can't be used,
    and an unguarded round() here against a guarded oracle flips
    revenue cells that land near a rounding boundary."""
    from kafka_go_streamer_spark.plans.registry import stabilize_rounds

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        stabilize_rounds(
            """
        SELECT date_format(date_trunc('month', o.o_orderdate), 'yyyy-MM') AS ym,
               count(DISTINCT o.o_orderkey) AS n_orders,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM v_orders o JOIN v_lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus <> 'F'
        GROUP BY 1
        """
        )
    )


@query(
    "sql_api_correlated_subquery",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal
    FROM customer c
    WHERE c.c_acctbal > (
      SELECT avg(c2.c_acctbal) FROM customer c2
      WHERE c2.c_nationkey = c.c_nationkey
    )
    """,
)
def sql_api_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (decorrelated by Catalyst into an
    aggregate + join) — customers above their nation's average balance."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_acctbal
        FROM v_customer c
        WHERE c.c_acctbal > (
          SELECT avg(c2.c_acctbal) FROM v_customer c2
          WHERE c2.c_nationkey = c.c_nationkey
        )
        """
    )


@query(
    "array_functions",
    oracle="""
    WITH w0 AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    )
    SELECT doc_id,
           len(w)::INTEGER                                   AS n_words,
           len(list_distinct(w))::INTEGER                    AS n_distinct,
           w[1]                                              AS first_word,
           list_sort(list_distinct(w))[1]                    AS min_word,
           array_to_string(list_slice(w, 2, 4), '-')         AS mid_words,
           list_contains(w, 'spark')                         AS has_spark,
           len(list_filter(w, x -> length(x) > 5))::INTEGER  AS n_long_words
    FROM w0
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order function family: size, distinct, indexing,
    sort, slice, contains, lambda filter — all JVM-side."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    bound = d.select("doc_id", w.alias("w"))
    return bound.select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
        F.col("w").getItem(0).alias("first_word"),
        F.array_sort(F.array_distinct("w")).getItem(0).alias("min_word"),
        F.array_join(F.slice("w", 2, 3), "-").alias("mid_words"),
        F.array_contains("w", "spark").alias("has_spark"),
        F.size(F.filter("w", lambda x: F.length(x) > 5)).alias("n_long_words"),
    )


@query(
    "map_functions",
    oracle="""
    WITH lines AS (
      SELECT l_orderkey, l_linenumber, round(sum(l_quantity), 2) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    per AS (
      SELECT l_orderkey,
             map(list(l_linenumber ORDER BY l_linenumber),
                 list(qty ORDER BY l_linenumber)) AS m
      FROM lines GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           cardinality(m)::INTEGER AS n_lines,
           list_min(map_keys(m))::INTEGER AS first_line,
           round(list_aggregate(map_values(m), 'sum'), 2) AS total_qty,
           round(coalesce(list_aggregate(
             list_filter(map_values(m), v -> v >= 10), 'sum'), 0), 2)
             AS big_qty
    FROM per
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-column family: build a map per order (line number -> summed
    quantity), then size / map_keys / map_values / map_filter / lambda
    aggregation over it — all JVM-side higher-order functions.

    The per-(order, line) pre-aggregate guarantees unique map keys (the
    synthetic lineitem repeats line numbers within an order); the map
    is built from a SORTED entry array so both engines construct the
    identical map. Output columns are scalars derived from the map —
    map-typed output would compare engine-specific dict renderings.
    DuckDB has no map_filter, so its twin filters map_values instead —
    same values, same result."""
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.groupBy("l_orderkey", "l_linenumber").agg(
        stable_round(F.sum("l_quantity"), 2).alias("qty")
    )
    per = lines.groupBy("l_orderkey").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("k"),
                        F.col("qty").alias("v"),
                    )
                )
            )
        ).alias("m")
    )
    plus = lambda acc, x: acc + x  # noqa: E731
    return per.select(
        "l_orderkey",
        F.size("m").alias("n_lines"),
        F.array_min(F.map_keys("m")).cast("int").alias("first_line"),
        stable_round(
            F.aggregate(F.map_values("m"), F.lit(0.0), plus), 2
        ).alias("total_qty"),
        stable_round(
            F.aggregate(
                F.map_values(F.map_filter("m", lambda k, v: v >= 10)),
                F.lit(0.0),
                plus,
            ),
            2,
        ).alias("big_qty"),
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4)  AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (quantile_cont semantics). The
    approximate variant (approx_percentile / t-digest) is the scale
    path but engine-specific, so the exact one carries the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        stable_round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        stable_round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
        stable_round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99"),
    )


#: Parameter values for the parameterized-SQL demo — bound through
#: Spark's named-parameter API, NOT string interpolation.
PARAM_SEGMENT = "BUILDING"
PARAM_MIN_BAL = 1000.0


@query(
    "sql_api_parameterized",
    oracle=f"""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           round(avg(c_acctbal), 2) AS avg_balance
    FROM customer
    WHERE c_mktsegment = '{PARAM_SEGMENT}' AND c_acctbal > {PARAM_MIN_BAL}
    GROUP BY 1
    """,
)
def sql_api_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL through Spark's named-argument binding
    (``spark.sql(query, args={...})``) — the injection-safe way a
    service layer runs user-scoped queries: parameters are bound as
    typed literals by the parser, never spliced into the query text.

    Scale: binding happens at plan time, so the bound literals
    constant-fold and push into the scan exactly like hand-written
    ones (segment + balance both reach PushedFilters); plan caching
    across parameter values is Catalyst's normal literal handling."""
    from kafka_go_streamer_spark.plans.registry import stabilize_rounds

    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "v_customer"
    )
    return spark.sql(
        stabilize_rounds(
            """
        SELECT c_mktsegment,
               count(*) AS n_customers,
               round(avg(c_acctbal), 2) AS avg_balance
        FROM v_customer
        WHERE c_mktsegment = :segment AND c_acctbal > :min_bal
        GROUP BY c_mktsegment
        """
        ),
        args={"segment": PARAM_SEGMENT, "min_bal": PARAM_MIN_BAL},
    )


#: BFS depth bound for the recursive-CTE reachability query (the
#: recursion terminates by depth, so UNION ALL semantics suffice in
#: both engines).
RCTE_DEPTH = 2
RCTE_SEEDS = 3


def _rcte_oracle() -> str:
    from kafka_go_streamer_spark.plans.registry import ORACLES

    wpairs = ORACLES["dedup_winnowing_pairs"]
    return f"""
    WITH RECURSIVE wp AS ({wpairs}),
    e AS (
      SELECT id_a AS a, id_b AS b FROM wp
      UNION ALL
      SELECT id_b AS a, id_a AS b FROM wp
    ),
    seeds AS (
      SELECT a AS seed FROM e GROUP BY a ORDER BY a LIMIT {RCTE_SEEDS}
    ),
    reach(seed, doc, d) AS (
      SELECT seed, seed, 0 FROM seeds
      UNION ALL
      SELECT r.seed, e.b, r.d + 1
      FROM reach r JOIN e ON e.a = r.doc
      WHERE r.d < {RCTE_DEPTH}
    ),
    m AS (SELECT seed, doc, min(d) AS d FROM reach GROUP BY 1, 2)
    SELECT seed,
           sum(CASE WHEN d = 1 THEN 1 ELSE 0 END)::BIGINT AS n_dist1,
           sum(CASE WHEN d = 2 THEN 1 ELSE 0 END)::BIGINT AS n_dist2
    FROM m GROUP BY 1
    """


@query("sql_api_recursive_cte", oracle=_rcte_oracle)
def sql_api_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``): depth-bounded BFS
    over the winnowing near-dup graph — for the three smallest
    documents that have any near-dup edge, how many documents sit at
    graph distance 1 and (newly) at distance 2. The SQL-standard
    iteration surface that complements the DataFrame-driven loops
    (``dedup_connected_components``'s contraction, PageRank's unrolled
    refinement): same fixpoint semantics, declared in one statement.

    Scale: each recursion step is one equi-join of the frontier
    against the (capped, winnowing-blocked) edge list — exactly the
    partitioned rank⋈edges shape of the big-graph PageRank, planned by
    the engine's recursion operator instead of a Python loop; the
    depth bound caps work, and min(d) GROUP BY collapses revisits so
    UNION ALL recursion terminates without needing distinct-union
    semantics in either engine. Edge generation reuses the registered
    winnowing-pair query (Spark side: the DataFrame as a temp view;
    oracle: the same SQL as a CTE)."""
    from kafka_go_streamer_spark.operators.iterate import pinned
    from kafka_go_streamer_spark.plans.registry import QUERIES as _Q

    # pin the edge source: the recursion references the view in the
    # seed CTE and every step, and an unpinned temp view re-derives
    # the whole winnowing pipeline per reference
    pinned(_Q["dedup_winnowing_pairs"](spark, sf_dir)).createOrReplaceTempView(
        "v_wpairs"
    )
    return spark.sql(
        f"""
        WITH RECURSIVE e AS (
          SELECT id_a AS a, id_b AS b FROM v_wpairs
          UNION ALL
          SELECT id_b AS a, id_a AS b FROM v_wpairs
        ),
        seeds AS (
          SELECT a AS seed FROM e GROUP BY a ORDER BY a LIMIT {RCTE_SEEDS}
        ),
        reach(seed, doc, d) AS (
          SELECT seed, seed, 0 FROM seeds
          UNION ALL
          SELECT r.seed, e.b, r.d + 1
          FROM reach r JOIN e ON e.a = r.doc
          WHERE r.d < {RCTE_DEPTH}
        ),
        m AS (SELECT seed, doc, min(d) AS d FROM reach GROUP BY 1, 2)
        SELECT seed,
               CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dist1,
               CAST(sum(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dist2
        FROM m GROUP BY seed
        """
    )


@query(
    "window_mom_growth",
    oracle="""
    WITH m AS (
      SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS ym,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
               AS revenue
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    )
    SELECT ym, revenue,
           lag(revenue) OVER (ORDER BY ym) AS prev_revenue,
           round(100.0 * (revenue - lag(revenue) OVER (ORDER BY ym))
                 / lag(revenue) OVER (ORDER BY ym), 2) AS pct_change
    FROM m
    """,
)
def window_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: the monthly rollup with
    lag()-based percent change — the BI staple, and the same
    prior-period comparison shape a data pipeline uses for corpus
    snapshot drift ("tokens ingested vs last month").

    Scale: the corpus collapses to MONTH-cardinality rows in one
    broadcast-join + aggregate pass; the unpartitioned lag window runs
    over dozens of month rows (trivially single-task — the window
    input is the rollup, never the fact table). Growth is computed on
    the ROUNDED monthly revenue so both engines difference identical
    decimals."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    # orders is FACT-sized: no broadcast hint — AQE picks the join
    # strategy (sort-merge on the orderkey at real scale, broadcast on
    # tiny fixtures), same policy as pipeline_incremental_ingest's
    # corpus-sized side.
    m = (
        li.join(o.select("o_orderkey", "o_orderdate"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            F.date_format(
                F.date_trunc("month", "o_orderdate"), "yyyy-MM"
            ).alias("ym")
        )
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue")
        )
    )
    w = Window.orderBy("ym")
    prev = F.lag("revenue").over(w)
    return m.select(
        "ym",
        "revenue",
        prev.alias("prev_revenue"),
        stable_round(100.0 * (F.col("revenue") - prev) / prev, 2).alias(
            "pct_change"
        ),
    )


#: Per-group LATERAL top-n size.
LATERAL_TOPN = 3


@query(
    "sql_api_lateral_topn",
    oracle=f"""
    SELECT n.n_name, t.c_name, t.bal
    FROM nation n
    JOIN LATERAL (
      SELECT c.c_name, round(c.c_acctbal, 2) AS bal
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY round(c.c_acctbal, 2) DESC, c.c_name ASC
      LIMIT {LATERAL_TOPN}
    ) t ON true
    """,
)
def sql_api_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:1999 lateral derived table,
    Spark 3.2+/DuckDB): the top-{LATERAL_TOPN} customers by balance
    PER NATION written as a per-row subquery instead of a
    window+filter — the SQL-surface idiom migrating warehouse users
    expect to keep working verbatim (its window twin is
    ``window_topk_parts_per_brand``).

    Scale: Catalyst de-correlates the lateral subquery into a
    ranked-window plan over the (nationkey)-partitioned customer
    table — the same physical shape as the explicit window form, one
    shuffle on the correlation key, never an N-subquery loop. Ordering
    is on the ROUNDED balance with a name tiebreak so both engines cut
    identical top-3 sets."""
    from kafka_go_streamer_spark.plans.registry import stabilize_rounds

    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "v_nation_lat"
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "v_customer_lat"
    )
    return spark.sql(
        stabilize_rounds(
            f"""
        SELECT n.n_name, t.c_name, t.bal
        FROM v_nation_lat n
        JOIN LATERAL (
          SELECT c.c_name, round(c.c_acctbal, 2) AS bal
          FROM v_customer_lat c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY round(c.c_acctbal, 2) DESC, c.c_name ASC
          LIMIT {LATERAL_TOPN}
        ) t
        """
        )
    )
