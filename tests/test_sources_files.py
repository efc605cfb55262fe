"""File source coverage: text/csv/json readers with explicit schemas,
and the sample-corpus message shape feeding the routing core."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from kafka_go_streamer_spark.routing import route_and_filter
from kafka_go_streamer_spark.sources.files import (
    avro_available,
    kafka_available,
    read_csv,
    read_json,
    read_message_lines,
    read_orc,
    write_orc,
)
from tests.test_routing import SPLITER_OPENSTACK


def test_read_message_lines_into_router(spark, tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text(
        'aaa source":"/var/log/syslog zzz\n'
        "random-token-here\n"
        'b source":"/var/log/ceph/ceph.log c\n'
    )
    msgs = read_message_lines(spark, str(p))
    assert msgs.columns == ["key", "value"]
    routed = {
        r["value"][:4]: r["topic"]
        for r in route_and_filter(msgs, SPLITER_OPENSTACK).collect()
    }
    assert routed == {
        "aaa ": "sc-hubudb1-forti-match",
        "rand": "ic-hrzagt1-openstack-unmatched",
        "b so": "ic-hrzagt1-openstack-match",
    }


def test_read_csv_with_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,name,score\n1,alpha,0.5\n2,beta,1.5\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    df = read_csv(spark, str(p), schema)
    assert df.schema == schema
    assert {(r["id"], r["name"], r["score"]) for r in df.collect()} == {
        (1, "alpha", 0.5),
        (2, "beta", 1.5),
    }


def test_read_json_with_schema(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    rows = [{"id": 1, "tags": ["a", "b"]}, {"id": 2, "tags": []}]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    df = read_json(spark, str(p), schema)
    got = {r["id"]: list(r["tags"]) for r in df.collect()}
    assert got == {1: ["a", "b"], 2: []}


def test_orc_roundtrip_preserves_values(spark, sf_dir, tmp_path):
    from kafka_go_streamer_spark.sources.tables import load_table

    src = load_table(spark, sf_dir, "nation")
    write_orc(src, str(tmp_path / "nation_orc"))
    back = read_orc(spark, str(tmp_path / "nation_orc"))
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_orc_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """A filter on the partition column must prune directories at plan
    time — the scan's partition count, not a post-scan filter, carries
    the predicate."""
    from pyspark.sql import functions as F

    from kafka_go_streamer_spark.sources.tables import load_table

    src = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    write_orc(src, str(tmp_path / "orders_orc"), partition_by=["o_year"])
    back = read_orc(spark, str(tmp_path / "orders_orc"))
    pruned = back.filter(F.col("o_year") == 1995)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_year" in plan
    n_years = src.select("o_year").distinct().count()
    assert n_years > 1
    assert pruned.count() == src.filter(F.col("o_year") == 1995).count()


def test_avro_availability_probe(spark, sf_dir, tmp_path):
    """spark-avro is an external module this container does NOT deploy
    (a partial avro jar class-loads, but the file source is
    unregistered) — the probe must report that instead of letting
    reads fail; where the module IS deployed, the gated roundtrip
    runs."""
    if not avro_available(spark):
        return
    from kafka_go_streamer_spark.sources.files import read_avro, write_avro
    from kafka_go_streamer_spark.sources.tables import load_table

    src = load_table(spark, sf_dir, "region")
    write_avro(src, str(tmp_path / "region_avro"))
    back = read_avro(spark, str(tmp_path / "region_avro"))
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_kafka_availability_probe(spark):
    # environment truth: no connector jar in this container — the router
    # must detect that instead of failing at .start()
    assert kafka_available(spark) is False


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Corpus schema evolution: a later batch adds a column (and drops
    nothing). mergeSchema reads the union schema with NULLs for the
    old rows — the append-only evolution contract a long-lived corpus
    directory needs (writers upgrade, readers keep working; partition
    pruning and pushdown are unaffected because the physical files are
    untouched)."""
    from pyspark.sql import functions as F

    base = tmp_path / "evolving"
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id bigint, text string"
    ).write.parquet(str(base / "batch=1"))
    spark.createDataFrame(
        [(3, "c", "en")], "doc_id bigint, text string, lang string"
    ).write.parquet(str(base / "batch=2"))

    merged = spark.read.option("mergeSchema", "true").parquet(
        str(base / "batch=1"), str(base / "batch=2")
    )
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    rows = {r["doc_id"]: r["lang"] for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: "en"}

    # narrow reads over the evolved directory still prune columns: a
    # projection that only needs the original columns must not fail on
    # (or read) the new one
    old_only = (
        spark.read.option("mergeSchema", "true")
        .parquet(str(base / "batch=1"), str(base / "batch=2"))
        .select("doc_id", "text")
        .filter(F.col("doc_id") >= 2)
    )
    assert old_only.count() == 2


def test_xml_round_trip(spark, sf_dir, tmp_path):
    """Spark 4 built-in XML source: region round-trips through an XML
    file with values and row structure intact."""
    import pytest

    from kafka_go_streamer_spark.sources.files import (
        read_xml,
        write_xml,
        xml_available,
    )
    from kafka_go_streamer_spark.sources.tables import load_table

    if not xml_available(spark):
        pytest.skip("xml source not registered on this runtime")
    region = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_xml")
    write_xml(region, path, row_tag="region", root_tag="regions")
    back = read_xml(spark, path, row_tag="region", schema=region.schema)
    assert sorted(
        (r["r_regionkey"], r["r_name"]) for r in back.collect()
    ) == sorted((r["r_regionkey"], r["r_name"]) for r in region.collect())
    assert back.count() == region.count()
