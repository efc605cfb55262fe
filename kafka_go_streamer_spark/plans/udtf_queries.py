"""Python UDTF surface: a table function over documents, exercised
through the LATERAL join path.

UDTFs are the one Spark extension point where an operator returns a
VARIABLE number of rows per input row with arbitrary Python logic —
the escape hatch for parsers/expanders no builtin covers. They run
Python-side (slow path): this module deliberately implements a task
that explode() could express, precisely so the oracle can check the
UDTF machinery itself; anything explode CAN express should use explode
(see plans/text.py). Scale shape: a UDTF lateral join is a narrow
per-partition transform — no shuffle, parallel in the number of input
splits, batched through Arrow.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.sources.tables import load_table


@udtf(returnType="word string, n int")
class WordCountsUDTF:
    """Emit (word, count) per distinct word of the lower-cased,
    whitespace-split input text — the Python twin of
    ``functions/text.py:words`` so the DuckDB oracle can replay it
    relationally."""

    def eval(self, text: str):  # noqa: D102
        for word, n in sorted(Counter(text.lower().strip().split()).items()):
            yield word, n


@query(
    "udtf_word_counts",
    oracle="""
    SELECT doc_id, word, count(*)::INTEGER AS n
    FROM (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
      FROM documents
    )
    WHERE word <> ''  -- str.split() emits no token for empty/blank text;
                      -- string_split_regex('') would emit one '' row
    GROUP BY doc_id, word
    """,
)
def udtf_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document word histogram via a registered Python UDTF in a
    LATERAL join (SQL `..., LATERAL word_counts(text)`)."""
    spark.udtf.register("word_counts", WordCountsUDTF)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, wc.word, wc.n
        FROM _udtf_docs d, LATERAL word_counts(d.text) wc
        """
    )


@query(
    "udaf_geomean_price_by_priority",
    oracle="""
    SELECT o_orderpriority,
           round(exp(avg(ln(o_totalprice))), 2) AS geomean_price,
           count(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def udaf_geomean_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas grouped-aggregate UDF (the UDAF surface): geometric mean
    of order value per priority, computed as exp(mean(ln x)) inside an
    Arrow-batched pandas aggregation.

    Like the UDTF module, the task is deliberately SQL-expressible so
    the oracle can certify the UDAF machinery itself; a production
    aggregate that built-ins can express should use built-ins.
    Scale shape: pandas grouped-agg UDFs get the same partial-free
    hash-shuffle as any agg — each group's rows stream to one executor,
    so group cardinality (5 priorities here) bounds parallelism; for
    high-cardinality keys this is fine, for tiny key domains prefer a
    built-in decomposition (exp∘avg∘ln) that keeps map-side partials."""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed explicitly: `from __future__ import annotations`
    # stringifies type hints, so signature inference can't see pd.Series
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def geomean(v):
        return float(np.exp(np.log(v.to_numpy()).mean()))

    # Spark disallows mixing pandas and JVM aggregates in one agg()
    # (INVALID_PANDAS_UDF_PLACEMENT), so n rides as a second pandas agg
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def n_rows(v):
        return len(v)

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(geomean("o_totalprice") + F.lit(5e-5), 2).alias("geomean_price"),
        n_rows("o_totalprice").alias("n"),
    )
