"""File-based sources: text / csv / json batch and streaming readers.

The reference's only non-Kafka input is a flat text corpus
(sample_input.txt, one raw message value per line) cat'd into Kafka for
demos; ``read_message_lines`` reproduces exactly that shape — a
(key NULL, value STRING) frame the routing core consumes directly.
Explicit schemas everywhere: schema inference is a full extra pass over
the data and is banned at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_message_lines(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited message values -> (key, value) like the Kafka
    projection (reference main.go:496-499; corpus shape of
    sample_input.txt)."""
    return spark.read.text(path).select(
        F.lit(None).cast("string").alias("key"),
        F.col("value"),
    )


def stream_message_lines(spark: SparkSession, path: str) -> DataFrame:
    """Streaming variant of :func:`read_message_lines` (file source)."""
    return spark.readStream.text(path).select(
        F.lit(None).cast("string").alias("key"),
        F.col("value"),
    )


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", header).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC batch reader — same columnar pushdown/pruning properties as
    parquet (both flow through the vectorized reader and
    DataSourceV2 filter pushdown)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC writer; ``partition_by`` produces the hive-style directory
    layout partition pruning keys on."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def avro_available(spark: SparkSession) -> bool:
    """True when the external spark-avro module is deployable; gate
    avro reads on this (it ships separately from core Spark). Uses
    Spark's own data-source lookup: merely class-loading
    AvroFileFormat is NOT sufficient — a partial avro jar (the Kafka
    schema-registry functions) satisfies Class.forName while the file
    source remains unregistered."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro batch reader — the row-oriented interchange format of the
    Kafka ecosystem (schema-registry payloads); columnar pushdown does
    not apply, so prefer parquet/ORC for analytics-at-rest and treat
    avro as an ingest/interchange format."""
    return spark.read.format("avro").load(path)


def write_avro(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").format("avro").save(path)


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath. The
    test/driver environment ships without it; the streaming router then
    runs on file sources only."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def xml_available(spark: SparkSession) -> bool:
    """True when the XML file source is registered (built into Spark
    core since 4.0; this gate exists for older runtimes)."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "xml", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """XML batch reader (Spark 4 built-in source): ``row_tag`` names
    the repeated element that maps to one row. Schema inference walks
    the documents twice — pass an explicit schema in production, the
    same discipline as the CSV/JSON readers here."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def write_xml(df: DataFrame, path: str, row_tag: str, root_tag: str) -> None:
    df.write.mode("overwrite").format("xml").option("rowTag", row_tag).option(
        "rootTag", root_tag
    ).save(path)
