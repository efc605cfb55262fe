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
