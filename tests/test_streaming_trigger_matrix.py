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

HARNESS SEMANTICS NOTE (r17): the promote-one-file +
``processAllAvailable`` loop is LOAD-BEARING, not just a convenience.
The engine filters late rows with the PREVIOUS micro-batch's
watermark; the no-data micro-batch that each ``processAllAvailable``
runs after its data batch commits the advanced watermark, so the next
data batch filters with a one-batch-lag watermark — the rule the
registered matrix simulates. Queueing every slot file up front behind
``maxFilesPerTrigger=1`` runs the data batches back-to-back with no
no-data batches between, the filter watermark lags one EXTRA batch,
and the engine provably drops fewer rows (measured: 10 vs 12 at the
60 s trigger). What r17 changed instead, keeping the per-file loop:
the three triggers replay CONCURRENTLY from a thread pool (each is an
independent query on its own feed/checkpoint; wall time collapses to
the finest trigger's), and per-batch drop counters fold through ONE
StreamingQueryListener keyed by query name instead of re-parsing the
~100-entry ``recentProgress`` ring buffer through py4j after every
promotion. 914 s -> ~3 min on the same box, identical assertions.
"""

from __future__ import annotations

import shutil
import time
from concurrent.futures import ThreadPoolExecutor

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

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


class _DropFold(StreamingQueryListener):
    """Folds per-batch drop counters for every query it sees, keyed by
    query name: the progress events arrive on the async listener bus,
    so each promotion costs zero py4j traffic (the old harness
    re-parsed the whole ``recentProgress`` ring buffer per file)."""

    def __init__(self):
        self.drops: dict[str, dict[int, int]] = {}
        self.terminated: set[str] = set()

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        self.drops.setdefault(p.name, {})[p.batchId] = sum(
            o.numRowsDroppedByWatermark for o in p.stateOperators
        )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        self.terminated.add(str(event.id))


def _stream_drops(spark, tmp_path, fold, batches, trigger_s):
    """Replay the slot batches through the real windowed agg, one
    promoted file + processAllAvailable per occupied slot, and return
    the engine's late-drop counter (folded by the shared listener)."""
    name = f"trig_{trigger_s}"
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
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(stage / "ckpt"))
        .start()
    )
    try:
        for p in paths:
            shutil.copy(p, feed / p.name)
            q.processAllAvailable()
    finally:
        q.stop()
    # the listener bus is async but FIFO: the QueryTerminated event
    # (emitted by the stop() above) arrives AFTER every progress event
    # of this query, so waiting for it guarantees the fold is complete
    # — counting folded ids instead is racy, because interleaved
    # no-data batches inflate the id range past len(paths) while the
    # final data batch's event can still be in flight (observed: one
    # drop undercounted at the 600 s trigger).
    deadline = time.time() + 60
    qid = str(q.id)
    while qid not in fold.terminated and time.time() < deadline:
        time.sleep(0.05)
    assert qid in fold.terminated, (name, "listener never drained")
    return sum(fold.drops.get(name, {}).values())


@pytest.mark.timeout(600)
def test_streaming_trigger_matrix_twin(spark, tmp_path):
    pdf = _prefix(spark)
    matrix = {
        (r["trigger_s"], r["delay_s"]): r["n_dropped_batch"]
        for r in QUERIES["events_lateness_trigger_matrix"](
            spark, SF
        ).collect()
    }
    fold = _DropFold()
    spark.streams.addListener(fold)
    try:
        # the three replays are independent queries on independent
        # feeds/checkpoints: run them concurrently so the wall time is
        # the finest trigger's replay, not the sum of all three
        with ThreadPoolExecutor(max_workers=3) as pool:
            futs = {
                t: pool.submit(
                    _stream_drops,
                    spark,
                    tmp_path,
                    fold,
                    _slot_batches(pdf, t),
                    t,
                )
                for t in L.TRIGGER_GRID_S
            }
            drops = {t: f.result() for t, f in futs.items()}
    finally:
        spark.streams.removeListener(fold)
    for t in L.TRIGGER_GRID_S:
        batches = _slot_batches(pdf, t)
        pred_windows, pred_rows = _predict(batches, DELAY_S, WINDOW_S)
        assert drops[t] == pred_windows, (t, drops[t], pred_windows)
        # the prefix faces the same watermark sequence as the full
        # fixture's first arrivals, so every prefix-late ROW is also
        # late in the registered matrix's full-fixture count
        assert drops[t] <= pred_rows <= matrix[(t, DELAY_S)], (
            t,
            drops[t],
            pred_rows,
            matrix,
        )
    # the matrix's headline claim, reproduced by the real engine:
    # coarser triggers drop less (slot boundaries nest 60|600|3600)
    t0, t1, t2 = L.TRIGGER_GRID_S
    assert drops[t0] >= drops[t1] >= drops[t2]
    # non-degenerate on this fixture: the finer two triggers really
    # lose rows; the 1 h trigger really buys them all back
    assert drops[t1] > 0
    assert drops[t2] == 0
