"""Streaming twins for the lateness/watermark wave (plans/lateness.py):
the SAME jittered arrivals replayed through the REAL operators with
pinned micro-batch boundaries, asserted against a pure-Python
prediction of Spark's documented per-batch watermark semantics
(empirically verified in round 13 and encoded here):

* the watermark in effect during a data batch is the one computed at
  the end of the PREVIOUS data batch (max event time seen, minus the
  delay, truncated to whole milliseconds) — under the
  promote-one-file + processAllAvailable pattern the interleaved
  no-data batches make that exactly "max event time of all earlier
  batches";
* a row is dropped late by the windowed aggregation iff its window
  END <= that watermark (numRowsDroppedByWatermark counts these);
* append mode finally emits exactly the windows with end <= the final
  watermark; later windows stay in state;
* dropDuplicatesWithinWatermark: in-batch duplicates always collapse;
  a key's state is evicted once the watermark passes its event time +
  delay, after which a RE-STAMPED redelivery is delivered again
  (leak) — while a redelivery carrying the ORIGINAL timestamp is
  caught by the operator's late filter instead (ts behind the
  watermark), so it can never reach downstream twice.

The batch-side twin of these rules is the registered
``events_lateness_watermark_grid`` / ``events_watermark_dedup_audit``
pair (continuous-watermark limit); the streamed drop counts must stay
BELOW the grid's conservative continuous bound for the same
(delay, window) cell.
"""

from __future__ import annotations

import shutil
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kafka_go_streamer_spark.plans import QUERIES
from kafka_go_streamer_spark.plans import lateness as L
from kafka_go_streamer_spark.sources.tables import load_table

pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.01"
N_BATCHES = 20


def _arrival_batches(spark, cols, order, n_batches=N_BATCHES):
    """The jittered frame as n_batches arrival-ordered pandas slices."""
    pdf = (
        L.jittered_arrivals(load_table(spark, SF, "events"))
        .select(*cols)
        .toPandas()
        .sort_values(list(order))
        .reset_index(drop=True)
    )
    n = len(pdf)
    return [
        pdf.iloc[k * n // n_batches : (k + 1) * n // n_batches]
        for k in range(n_batches)
    ]


def _promote_run(spark, tmp_path, batches, build_stream, cols):
    """Write each batch to its own parquet, promote one file at a time
    into the feed dir with processAllAvailable between promotions —
    fully pinned batch boundaries.

    Batch files are written directly with pyarrow (timestamps kept
    UTC-adjusted so they read back as TIMESTAMP_LTZ, exactly like the
    old per-batch ``spark.createDataFrame(...).write.parquet`` jobs —
    which cost a ~1-2 s Spark write job per batch, ~half this suite's
    wall)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    stage = tmp_path / "stage"
    feed = tmp_path / "feed"
    stage.mkdir()
    feed.mkdir()
    paths = []
    for k, bk in enumerate(batches):
        p = stage / f"b{k:03d}.parquet"
        tbl = pa.Table.from_pandas(bk[cols], preserve_index=False)
        fields = [
            pa.field(f.name, pa.timestamp("us", tz="UTC"))
            if pa.types.is_timestamp(f.type)
            else f
            for f in tbl.schema
        ]
        pq.write_table(tbl.cast(pa.schema(fields)), p)
        paths.append(p)
    schema = spark.read.parquet(str(stage / "b000.parquet")).schema
    q = build_stream(
        spark.readStream.schema(schema).parquet(str(feed))
    )
    try:
        for k, p in enumerate(paths):
            shutil.copy(p, feed / f"b{k:03d}.parquet")
            q.processAllAvailable()
    finally:
        q.stop()
    return q


def _engine_late_drops(q):
    return sum(
        o.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for o in p.get("stateOperators", [])
    )


@pytest.mark.timeout(600)
def test_streaming_window_drops_match_prediction(spark, tmp_path):
    """Windowed aggregation under withWatermark at (delay=300s,
    window=3600s) — a cell of the registered lateness grid: emitted
    window counts and the engine's late-drop counter must equal the
    per-batch-semantics prediction exactly, and the streamed drops
    must stay within the grid's continuous-watermark bound."""
    D_S, W_S = 300, 3600
    D, W = D_S * 1_000_000, W_S * 1_000_000
    batches = _arrival_batches(
        spark, ("event_id", "ts", "us", "arrival_us"), ("arrival_us", "event_id")
    )

    def build(stream):
        agg = (
            stream.withWatermark("ts", f"{D_S} seconds")
            .groupBy(F.window("ts", f"{W_S} seconds"))
            .count()
        )
        return (
            agg.writeStream.format("memory")
            .queryName("lat_win")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    q = _promote_run(spark, tmp_path, batches, build, ["event_id", "ts"])

    # pure-Python prediction of the pinned semantics
    def wend(us):
        return (us // W + 1) * W

    wm = -(10**18)
    kept, n_drop = [], 0
    for bk in batches:
        for us in bk.us:
            if wend(us) <= wm:
                n_drop += 1
            else:
                kept.append(us)
        wm = max(wm, (int(bk.us.max()) - D) // 1000 * 1000)
    cnt = Counter(wend(us) for us in kept)
    predicted = {w: c for w, c in cnt.items() if w <= wm}

    got = {
        int(r["wend"].timestamp() * 1e6): int(r["n"])
        for r in spark.sql(
            "SELECT window.end AS wend, count AS n FROM lat_win"
        ).collect()
    }
    assert got == predicted
    assert _engine_late_drops(q) == n_drop
    # non-degenerate: the jittered tail provably crosses batch
    # boundaries and loses rows
    assert n_drop > 0
    # streamed (per-batch watermark) drops are a subset of the grid's
    # continuous-watermark bound for the same cell
    grid = {
        (r["delay_s"], r["window_s"]): r["n_dropped"]
        for r in QUERIES["events_lateness_watermark_grid"](
            spark, SF
        ).collect()
    }
    assert 0 < n_drop <= grid[(D_S, W_S)]


@pytest.mark.timeout(600)
def test_streaming_dedup_leak_matches_prediction(spark, tmp_path):
    """dropDuplicatesWithinWatermark against re-stamped redeliveries
    (the registered events_watermark_dedup_audit's duplicate shape):
    per-key delivered counts must equal the eviction-rule prediction —
    in-batch dups collapse, a dup after state eviction (wm past
    ts+delay) is delivered again, and a late ORIGINAL is dropped by
    the late filter leaving the redelivery as the only copy."""
    D_S = 1800
    D = D_S * 1_000_000
    base = _arrival_batches(
        spark,
        ("event_id", "us", "arrival_us"),
        ("arrival_us", "event_id"),
        n_batches=1,
    )[0]
    # originals + re-stamped redeliveries, one union frame ordered by
    # arrival (kind breaks orig/dup arrival ties, orig first)
    rows = []
    for eid, us, arr in zip(base.event_id, base.us, base.arrival_us):
        rows.append((int(arr), 0, int(eid), int(us)))
    import hashlib

    def h60(eid, salt):
        return int(
            hashlib.md5(f"{eid}{salt}".encode()).hexdigest()[:15], 16
        )

    for eid, us, arr in zip(base.event_id, base.us, base.arrival_us):
        if h60(int(eid), "df") % L.DUP_MOD == 0:
            gap = h60(int(eid), "dg") % (L.DUP_GAP_MAX_US + 1)
            rows.append((int(arr) + gap, 1, int(eid), int(arr) + gap))
    rows.sort()
    n = len(rows)
    import pandas as pd

    slices = [
        pd.DataFrame(
            rows[k * n // N_BATCHES : (k + 1) * n // N_BATCHES],
            columns=["arrival_us", "kind", "event_id", "ts_us"],
        ).assign(
            ts=lambda d: pd.to_datetime(d.ts_us, unit="us"),
            us=lambda d: d.ts_us,
        )
        for k in range(N_BATCHES)
    ]

    def build(stream):
        dd = stream.withWatermark("ts", f"{D_S} seconds")
        dd = dd.dropDuplicatesWithinWatermark(["event_id"])
        return (
            dd.writeStream.format("memory")
            .queryName("lat_ddw")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .start()
        )

    q = _promote_run(spark, tmp_path, slices, build, ["event_id", "ts"])

    # prediction: per-batch watermark, late filter, state eviction
    wm = -(10**18)
    state: dict[int, int] = {}  # event_id -> expiry us
    delivered: Counter = Counter()
    n_late = n_dedup = n_leak = 0
    for bk in slices:
        # evict state the watermark has passed
        state = {k: exp for k, exp in state.items() if exp >= wm}
        for _, kind, eid, ts_us in sorted(
            bk[["arrival_us", "kind", "event_id", "ts_us"]].itertuples(
                index=False
            )
        ):
            if ts_us < wm:
                n_late += 1
                continue
            if eid in state:
                n_dedup += 1
                continue
            if kind == 1 and delivered[eid]:
                n_leak += 1
            state[eid] = ts_us + D
            delivered[eid] += 1
        wm = max(wm, (int(bk.ts_us.max()) - D) // 1000 * 1000)

    got = Counter(
        r["event_id"] for r in spark.sql(
            "SELECT event_id FROM lat_ddw"
        ).collect()
    )
    assert got == delivered
    assert _engine_late_drops(q) == n_late
    # all three paths provably exercised on this fixture
    assert n_dedup > 0
    assert n_leak > 0
    assert max(delivered.values()) == 2  # real duplicate deliveries
