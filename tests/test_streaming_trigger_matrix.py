"""Streaming twin for ``events_lateness_trigger_matrix``
(plans/lateness.py): the registered query SIMULATES the per-batch
watermark rule at three trigger widths; this suite replays the same
jittered arrivals through the REAL windowed aggregation with the
micro-batch boundaries pinned to each trigger's arrival slots, and
asserts the engine reproduces the simulation exactly:

* batches are the occupied arrival slots ``arrival_us // trigger``
  (an empty slot is a no-data batch — it leaves the watermark where
  it was, on both sides);
* the engine's ``numRowsDroppedByWatermark`` must equal the pure
  per-batch prediction for EVERY trigger width. Empirically pinned
  here (extending tests/test_streaming_lateness.py's semantics): for
  a streaming AGGREGATION the counter counts the late PRE-AGGREGATED
  rows the state store rejects — i.e. one per DISTINCT late window
  per batch, not one per late input row (two late rows of the same
  window in one batch merge before the filter and count once);
* drops are monotone non-increasing in trigger width (the slot
  boundaries nest: 60 s | 600 s | 3600 s), which is the matrix's
  headline claim — a coarser trigger holds the watermark back and
  buys late data back;
* the prefix replayed here faces the same watermark sequence as the
  full fixture's first events, so each streamed drop count is bounded
  by the registered matrix's ``n_dropped_batch`` at the same
  (trigger, delay) cell — the twin and the table cross-check.

The replay uses a fixed PREFIX of the arrival order (PREFIX_EVENTS)
so the finest trigger stays at a few hundred micro-batches; batch
files are written directly with pyarrow (one file per occupied slot)
because the promote-one-file pattern is the pinned-boundary harness,
not the thing under test.
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from kafka_go_streamer_spark.plans import QUERIES
from kafka_go_streamer_spark.plans import lateness as L
from kafka_go_streamer_spark.sources.tables import load_table

pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.01"
#: Arrival-order prefix replayed per trigger: big enough that the two
#: finer triggers provably drop rows, small enough that the 60 s
#: trigger stays near ~260 occupied slots (micro-batches).
PREFIX_EVENTS = 300
DELAY_S = 300  # the matrix's middle delay column
WINDOW_S = L.MATRIX_WINDOW_S


def _prefix(spark):
    pdf = (
        L.jittered_arrivals(load_table(spark, SF, "events"))
        .select("event_id", "us", "arrival_us")
        .toPandas()
        .sort_values(["arrival_us", "event_id"])
        .reset_index(drop=True)
        .iloc[:PREFIX_EVENTS]
    )
    return pdf


def _slot_batches(pdf, trigger_s):
    """The prefix as one pandas slice per OCCUPIED arrival slot."""
    slot = pdf.arrival_us // (trigger_s * 1_000_000)
    return [g for _, g in pdf.groupby(slot, sort=True)]


def _predict(batches, delay_s, window_s):
    """Pure-Python per-batch watermark replay (pinned semantics).
    Returns (engine-countable drops, late input rows): the engine's
    counter sees one row per DISTINCT late window per batch (rows
    merge in the pre-shuffle partial aggregate before the state
    store's late filter); the registered matrix counts input ROWS."""
    d_us, w_us = delay_s * 1_000_000, window_s * 1_000_000
    wm = -(10**18)
    n_windows = n_rows = 0
    for bk in batches:
        late = [
            (us // w_us + 1) * w_us
            for us in bk.us
            if (us // w_us + 1) * w_us <= wm
        ]
        n_rows += len(late)
        n_windows += len(set(late))
        wm = max(wm, (int(bk.us.max()) - d_us) // 1000 * 1000)
    return n_windows, n_rows


def _stream_drops(spark, tmp_path, batches, trigger_s):
    """Replay the slot batches through the real windowed agg, one
    promoted file + processAllAvailable per occupied slot, and return
    the engine's late-drop counter."""
    stage = tmp_path / f"t{trigger_s}"
    feed = stage / "feed"
    feed.mkdir(parents=True)
    paths = []
    for k, bk in enumerate(batches):
        p = stage / f"b{k:05d}.parquet"
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(bk.event_id, pa.int64()),
                    "ts": pa.array(bk.us, pa.timestamp("us")),
                }
            ),
            p,
        )
        paths.append(p)
    agg = (
        spark.readStream.schema("event_id bigint, ts timestamp")
        .parquet(str(feed))
        .withWatermark("ts", f"{DELAY_S} seconds")
        .groupBy(F.window("ts", f"{WINDOW_S} seconds"))
        .count()
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(f"trig_{trigger_s}")
        .outputMode("append")
        .option("checkpointLocation", str(stage / "ckpt"))
        .start()
    )
    # recentProgress retains only the last ~100 updates and the finest
    # trigger produces a few hundred batches: fold drops per batchId as
    # the run goes instead of reading the buffer once at the end
    drops_by_batch: dict[int, int] = {}

    def _fold() -> None:
        for pr in q.recentProgress:
            drops_by_batch[pr["batchId"]] = sum(
                o.get("numRowsDroppedByWatermark", 0)
                for o in pr.get("stateOperators", [])
            )

    try:
        for p in paths:
            shutil.copy(p, feed / p.name)
            q.processAllAvailable()
            _fold()
    finally:
        q.stop()
    _fold()
    return sum(drops_by_batch.values())


@pytest.mark.timeout(600)
def test_streaming_trigger_matrix_twin(spark, tmp_path):
    pdf = _prefix(spark)
    matrix = {
        (r["trigger_s"], r["delay_s"]): r["n_dropped_batch"]
        for r in QUERIES["events_lateness_trigger_matrix"](
            spark, SF
        ).collect()
    }
    drops = {}
    for t in L.TRIGGER_GRID_S:
        batches = _slot_batches(pdf, t)
        pred_windows, pred_rows = _predict(batches, DELAY_S, WINDOW_S)
        engine = _stream_drops(spark, tmp_path, batches, t)
        assert engine == pred_windows, (t, engine, pred_windows)
        # the prefix faces the same watermark sequence as the full
        # fixture's first arrivals, so every prefix-late ROW is also
        # late in the registered matrix's full-fixture count
        assert engine <= pred_rows <= matrix[(t, DELAY_S)], (
            t,
            engine,
            pred_rows,
            matrix,
        )
        drops[t] = engine
    # the matrix's headline claim, reproduced by the real engine:
    # coarser triggers drop less (slot boundaries nest 60|600|3600)
    t0, t1, t2 = L.TRIGGER_GRID_S
    assert drops[t0] >= drops[t1] >= drops[t2]
    # non-degenerate on this fixture: the finer two triggers really
    # lose rows; the 1 h trigger really buys them all back
    assert drops[t1] > 0
    assert drops[t2] == 0
