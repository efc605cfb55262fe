"""Bulk routing distribution test mirroring the reference's demo corpus
shape (sample_input.txt: ~10k messages, ~1% match rate) — a seeded
synthetic corpus routed by both the DataFrame core and its SQL twin,
with exact expected per-topic counts."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from kafka_go_streamer_spark.routing import route, routing_case_sql
from tests.test_routing import SPLITER_OPENSTACK

PATTERNS = [
    'source":"/var/log/syslog',
    'source":"/var/log/ceph/ceph-mon',
    'source":"/var/log/ceph/ceph.log',
    'source":"/var/log/ceph/ceph-osd',
]


def _corpus(n: int = 5000, match_rate: float = 0.01):
    rng = random.Random(42)
    rows, expected = [], {
        "sc-hubudb1-forti-match": 0,
        "ic-hrzagt1-openstack-debug": 0,
        "ic-hrzagt1-openstack-match": 0,
        "ic-hrzagt1-openstack-drop": 0,
        "ic-hrzagt1-openstack-unmatched": 0,
    }
    topics = [
        "sc-hubudb1-forti-match",
        "ic-hrzagt1-openstack-debug",
        "ic-hrzagt1-openstack-match",
        "ic-hrzagt1-openstack-drop",
    ]
    for i in range(n):
        if rng.random() < match_rate:
            k = rng.randrange(len(PATTERNS))
            pre = "".join(rng.choices(string.ascii_letters, k=rng.randrange(8)))
            suf = "".join(rng.choices(string.ascii_letters, k=rng.randrange(8)))
            rows.append((str(i), pre + PATTERNS[k] + suf))
            expected[topics[k]] += 1
        else:
            rows.append(
                (str(i), "".join(rng.choices(string.ascii_lowercase, k=19)))
            )
            expected["ic-hrzagt1-openstack-unmatched"] += 1
    return rows, expected


def test_bulk_distribution_dataframe_and_sql_twin(spark):
    rows, expected = _corpus()
    df = spark.createDataFrame(rows, "key string, value string")
    got = {
        r["topic"]: r["n"]
        for r in route(df, SPLITER_OPENSTACK)
        .groupBy("topic")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {k: v for k, v in expected.items() if v > 0}

    # SQL twin agrees on the exact same frame
    df.createOrReplaceTempView("bulk_corpus")
    case = routing_case_sql(SPLITER_OPENSTACK, "value")
    got_sql = {
        r["topic"]: r["n"]
        for r in spark.sql(
            f"SELECT {case} AS topic, count(*) AS n FROM bulk_corpus GROUP BY 1"
        ).collect()
    }
    assert got_sql == got
