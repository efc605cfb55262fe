"""Routing operator surface expressed over the driver tables: the
reference's content-based router semantics (filters, first-match-wins
multi-way split, default/action resolution, drop, dead-letter,
projection, split->merge) run as batch queries on `documents` and
`events` so the DuckDB oracle can replay them.

The Spark side and the SQL side derive from the SAME Spliter object via
``routing_expr`` / ``routing_case_sql`` — one source of truth for the
semantics under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round

from kafka_go_streamer_spark.config import Extractor, Split, Spliter
from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.routing import route, route_and_filter, routing_case_sql
from kafka_go_streamer_spark.sources.tables import load_table

#: The documents-table routing program: exercises every split flavor the
#: reference supports (regex, substring, explicit topic, action
#: indirection, default matched, drop-on-missing-action, dead-letter).
DOCS_SPLITER = Spliter(
    input_topic="documents-in",
    actions={
        "matched": "docs-matched",
        "unmatched": "docs-unmatched",
        "debug": "docs-debug",
        # note: no 'archive' key -> splits with action=archive are dropped
    },
    splits=[
        Split(Extractor(r"spark .*join", use_regex=True), output_topic="docs-spark-join"),
        Split(Extractor("window"), action="debug"),
        Split(Extractor("hash")),  # -> default 'matched'
        Split(Extractor("vector"), action="archive"),  # -> drop
    ],
)

#: Events routing program: tier events by type (substring on a short
#: column) with an unmatched dead-letter.
EVENTS_SPLITER = Spliter(
    input_topic="events-in",
    actions={"matched": "events-low", "unmatched": "events-other"},
    splits=[
        Split(Extractor("error"), output_topic="events-alert"),
        Split(Extractor("purchase"), output_topic="events-revenue"),
        Split(Extractor("signup"), output_topic="events-growth"),
        Split(Extractor("click")),
    ],
)

_DOCS_CASE = routing_case_sql(DOCS_SPLITER, "text")
_EVENTS_CASE = routing_case_sql(EVENTS_SPLITER, "event_type")


@query(
    "route_documents",
    oracle=f"""
    SELECT doc_id AS key, topic FROM (
      SELECT doc_id, {_DOCS_CASE} AS topic FROM documents
    ) WHERE topic IS NOT NULL
    """,
)
def route_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship router: first-match-wins multi-way split over document
    text, producing (key, topic) for every row the reference would emit.

    Scale: narrow plan, zero shuffles — scan, case-when, filter,
    project. Parallelism == input splits; nothing to re-balance."""
    docs = load_table(spark, sf_dir, "documents")
    msgs = docs.select(F.col("doc_id").alias("key"), F.col("text").alias("value"))
    return route_and_filter(msgs, DOCS_SPLITER).select("key", "topic")


@query(
    "route_documents_counts",
    oracle=f"""
    SELECT coalesce(topic, '__dropped__') AS topic, count(*) AS n FROM (
      SELECT {_DOCS_CASE} AS topic FROM documents
    ) GROUP BY 1
    """,
)
def route_documents_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routing distribution including the dropped bucket — pins the
    drop-vs-unmatched distinction numerically."""
    docs = load_table(spark, sf_dir, "documents")
    msgs = docs.select(F.col("text").alias("value"))
    return (
        route(msgs, DOCS_SPLITER)
        .groupBy(F.coalesce(F.col("topic"), F.lit("__dropped__")).alias("topic"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "route_split_merge_roundtrip",
    oracle=f"""
    SELECT topic, count(*) AS n, count(DISTINCT doc_id) AS n_keys FROM (
      SELECT doc_id, {_DOCS_CASE} AS topic FROM documents
    ) WHERE topic IS NOT NULL
    GROUP BY topic
    """,
)
def route_split_merge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split the routed stream into one DataFrame per topic (the
    reference's per-topic writer array, main.go:371-377), then merge back
    with unionByName — proves the split is a disjoint partition.

    Scale: the per-topic filters share one scan via the common routed
    plan; union is a no-shuffle bag concat."""
    docs = load_table(spark, sf_dir, "documents")
    msgs = docs.select(F.col("doc_id").alias("key"), F.col("text").alias("value"))
    routed = route(msgs, DOCS_SPLITER)
    topics = [
        t
        for t in {rs.topic for rs in DOCS_SPLITER.resolved_splits()}
        if t is not None
    ]
    if DOCS_SPLITER.unmatched_topic:
        topics.append(DOCS_SPLITER.unmatched_topic)
    parts = [routed.filter(F.col("topic") == t) for t in sorted(topics)]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return merged.groupBy("topic").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("key").alias("n_keys"),
    )


@query(
    "route_events_by_type",
    oracle=f"""
    SELECT topic, count(*) AS n, round(sum(value), 2) AS total_value FROM (
      SELECT value, {_EVENTS_CASE} AS topic FROM events
    ) GROUP BY topic
    """,
)
def route_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routing on the events stream table + per-route aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return (
        route(ev, EVENTS_SPLITER, value_col="event_type")
        .groupBy("topic")
        .agg(
            F.count(F.lit(1)).alias("n"),
            stable_round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "filter_regex",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE regexp_matches(text, 'stream.*(window|watermark)')
    """,
)
def filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone regex predicate (reference main.go:510-515 analogue)."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").rlike("stream.*(window|watermark)"))
        .select("doc_id", "lang", "n_chars")
    )


@query(
    "filter_contains",
    oracle="""
    SELECT doc_id, source
    FROM documents
    WHERE position('shuffle' in text) > 0 AND NOT position('broadcast' in text) > 0
    """,
)
def filter_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal substring predicates with boolean structure
    (reference main.go:516-522 analogue)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(
        F.col("text").contains("shuffle") & ~F.col("text").contains("broadcast")
    ).select("doc_id", "source")


@query(
    "project_key_value",
    oracle="""
    SELECT doc_id AS key, text AS value
    FROM documents
    WHERE lang = 'en'
    """,
)
def project_key_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's {Key, Value} projection (main.go:496-499): all
    other columns dropped before the sink."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang") == "en")
        .select(F.col("doc_id").alias("key"), F.col("text").alias("value"))
    )
