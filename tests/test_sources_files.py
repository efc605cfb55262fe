"""File source coverage: text/csv/json readers with explicit schemas,
and the sample-corpus message shape feeding the routing core."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from kafka_go_streamer_spark.routing import route_and_filter
from kafka_go_streamer_spark.sources.files import (
    kafka_available,
    read_csv,
    read_json,
    read_message_lines,
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


def test_kafka_availability_probe(spark):
    # environment truth: no connector jar in this container — the router
    # must detect that instead of failing at .start()
    assert kafka_available(spark) is False
