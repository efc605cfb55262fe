"""foreachBatch fan-out sink: the reference's per-topic writer array
(reference main.go:371-377) re-expressed as one streaming query whose
each micro-batch splits the routed frame by topic and writes per-topic
parquet directories — the sink shape for destinations the Kafka sink
can't express."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from kafka_go_streamer_spark.sources.files import stream_message_lines
from kafka_go_streamer_spark.streaming.router import route_microbatch
from tests.test_routing import GOLDEN_OPENSTACK, SPLITER_OPENSTACK


pytestmark = pytest.mark.slow


def test_foreachbatch_per_topic_parquet(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "msgs.txt").write_text("\n".join(v for _, v, _ in GOLDEN_OPENSTACK))
    out_root = str(tmp_path / "out")

    def sink(batch_df, epoch_id: int) -> None:
        routed = route_microbatch(batch_df, SPLITER_OPENSTACK)
        # one pass, partitioned write: partitionBy('topic') gives the
        # per-topic directory layout without one job per topic
        routed.write.mode("append").partitionBy("topic").parquet(out_root)

    q = (
        stream_message_lines(spark, str(src))
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["topic"]: r["value"]
        for r in spark.read.parquet(out_root).select(
            "topic", "value"
        ).collect()
    }
    expected_topics = {t for _, _, t in GOLDEN_OPENSTACK}
    assert set(got) == expected_topics
    # each topic directory holds exactly its routed message
    for _, v, t in GOLDEN_OPENSTACK:
        assert got[t] == v
    # directory layout: one partition dir per topic
    dirs = {d for d in os.listdir(out_root) if d.startswith("topic=")}
    assert len(dirs) == len(expected_topics)
