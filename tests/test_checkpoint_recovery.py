"""Checkpoint-recovery semantics: the headline behavioral upgrade over
the reference. The reference commits consumer offsets BEFORE the
producer flush (main.go:361-365 commit vs :573 flush), so a crash in
that window silently drops messages (at-most-once). Spark's checkpoint
commits offsets only after the sink commits the batch — stop/kill a
query at any point, restart it from the same checkpoint, and nothing
is lost (and with the file sink's idempotent manifest, nothing is
duplicated either).

These tests kill and restart a file-source router mid-stream and assert
the delivered set is exactly the input set across restarts."""

from __future__ import annotations

import pytest

from tests.test_routing import GOLDEN_OPENSTACK, SPLITER_OPENSTACK

from kafka_go_streamer_spark.streaming import (
    RouterMetricsListener,
    start_checkpointed_file_router,
)


pytestmark = pytest.mark.slow


def _routed_values(spark, output_dir):
    df = spark.read.parquet(output_dir)
    return {r["value"]: r["topic"] for r in df.collect()}, df.count()


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "in": tmp_path / "in",
        "out": tmp_path / "out",
        "ckpt": tmp_path / "ckpt",
    }
    d["in"].mkdir()
    return d


def test_restart_resumes_with_no_loss_and_no_duplicates(spark, dirs):
    """Phase 1 processes the first half, the query is stopped (the
    micro-batch analogue of a crash: no graceful drain of future
    input), the second half arrives while the engine is DOWN, and the
    restarted query must deliver exactly the missing half."""
    half = len(GOLDEN_OPENSTACK) // 2
    (dirs["in"] / "a.txt").write_text(
        "\n".join(v for _, v, _ in GOLDEN_OPENSTACK[:half]) + "\n"
    )

    q1 = start_checkpointed_file_router(
        spark, SPLITER_OPENSTACK, str(dirs["in"]), str(dirs["out"]),
        str(dirs["ckpt"]), query_name="ckpt_phase1",
    )
    q1.awaitTermination(120)
    got1, n1 = _routed_values(spark, str(dirs["out"]))
    expected_all = {v: t for _, v, t in GOLDEN_OPENSTACK}
    assert got1 == {v: t for _, v, t in GOLDEN_OPENSTACK[:half]}

    # input arrives while the engine is down
    (dirs["in"] / "b.txt").write_text(
        "\n".join(v for _, v, _ in GOLDEN_OPENSTACK[half:]) + "\n"
    )

    listener = RouterMetricsListener()
    spark.streams.addListener(listener)
    try:
        q2 = start_checkpointed_file_router(
            spark, SPLITER_OPENSTACK, str(dirs["in"]), str(dirs["out"]),
            str(dirs["ckpt"]), query_name="ckpt_phase2",
        )
        q2.awaitTermination(120)
        assert listener.wait_for_rows(
            "ckpt_phase2", len(GOLDEN_OPENSTACK) - half
        )
    finally:
        spark.streams.removeListener(listener)

    got2, n2 = _routed_values(spark, str(dirs["out"]))
    # no loss: every golden message delivered with its expected route
    assert got2 == expected_all
    # no duplicates: file-sink manifest + recovered offsets
    assert n2 == len(GOLDEN_OPENSTACK)
    # and the restart did NOT rescan phase-1 files: the listener saw
    # only the second half enter the restarted query
    stats = listener.snapshot().get("ckpt_phase2")
    assert stats is not None and stats["total_input_rows"] == len(
        GOLDEN_OPENSTACK
    ) - half


def test_restart_with_nothing_new_is_a_noop(spark, dirs):
    (dirs["in"] / "a.txt").write_text(
        "\n".join(v for _, v, _ in GOLDEN_OPENSTACK) + "\n"
    )
    q1 = start_checkpointed_file_router(
        spark, SPLITER_OPENSTACK, str(dirs["in"]), str(dirs["out"]),
        str(dirs["ckpt"]), query_name="ckpt_idem1",
    )
    q1.awaitTermination(120)
    q2 = start_checkpointed_file_router(
        spark, SPLITER_OPENSTACK, str(dirs["in"]), str(dirs["out"]),
        str(dirs["ckpt"]), query_name="ckpt_idem2",
    )
    q2.awaitTermination(120)
    got, n = _routed_values(spark, str(dirs["out"]))
    assert got == {v: t for _, v, t in GOLDEN_OPENSTACK}
    assert n == len(GOLDEN_OPENSTACK)
