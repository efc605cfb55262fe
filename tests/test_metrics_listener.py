"""RouterMetricsListener: per-query rows/sec + batch stats off the
driver's progress events (observability parity with the reference's
pprof/zap hooks, main.go:124-161)."""

from __future__ import annotations

from tests.test_routing import GOLDEN_OPENSTACK, SPLITER_OPENSTACK

from kafka_go_streamer_spark.streaming import (
    RouterMetricsListener,
    start_file_stream_router,
)


def test_listener_captures_throughput(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.txt").write_text("\n".join(v for _, v, _ in GOLDEN_OPENSTACK) + "\n")

    listener = RouterMetricsListener()
    spark.streams.addListener(listener)
    try:
        q = start_file_stream_router(
            spark, SPLITER_OPENSTACK, str(d), query_name="metered"
        )
        q.awaitTermination(120)
        # progress events land on the listener bus after batch commit
        assert listener.wait_for_rows("metered", len(GOLDEN_OPENSTACK))
    finally:
        spark.streams.removeListener(listener)

    stats = listener.snapshot()["metered"]
    assert stats["batches"] >= 1
    assert stats["total_input_rows"] == len(GOLDEN_OPENSTACK)
    assert stats["peak_rows_per_sec"] > 0
    assert stats["avg_batch_ms"] > 0
