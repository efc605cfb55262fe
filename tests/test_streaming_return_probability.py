"""Streaming twin for ``events_return_probability``
(plans/fidelity.py): the registered query computes, per event type,
the probability the user's next action arrives within each horizon,
via a lead() window over the full table. This suite replays the same
events as a micro-batched stream through the real
``applyInPandasWithState`` session-gap operator
(streaming/stateful.py:return_gaps_stream) with pinned batch
boundaries (promote-one-file, the trigger-matrix harness pattern) and
asserts:

* the streamed (prev_type, gap_us) pairs equal, as a multiset, a
  pure-pandas per-user replay of the fixture — including pairs whose
  two events land in DIFFERENT micro-batches (the state register
  carrying across batches is the thing under test);
* folding the streamed pairs into the hazard table reproduces the
  registered batch query exactly: per type, round(n_within_h /
  n_events, 6) matches every ``p_return_{h}h`` column, and the
  censored share equals (n_events - emitted pairs) / n_events — one
  censored event per user, the register still held at feed end.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_go_streamer_spark.plans import QUERIES
from kafka_go_streamer_spark.plans.fidelity import RETURN_H_GRID
from kafka_go_streamer_spark.sources.tables import load_table
from kafka_go_streamer_spark.streaming.stateful import return_gaps_stream

pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"
N_BATCHES = 6


def _arrival(spark) -> pd.DataFrame:
    from pyspark.sql import functions as F

    return (
        load_table(spark, SF, "events")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("us"),
        )
        .toPandas()
        .sort_values(["us", "event_id"])
        .reset_index(drop=True)
    )


def _golden_pairs(pdf: pd.DataFrame) -> Counter:
    """Pure-pandas per-user replay: (prev_type, gap_us) multiset."""
    out: Counter = Counter()
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        us = g["us"].to_numpy()
        et = g["event_type"].to_numpy()
        for i in range(1, len(g)):
            out[(et[i - 1], int(us[i] - us[i - 1]))] += 1
    return out


@pytest.mark.timeout(600)
def test_streaming_return_gaps_twin(spark, tmp_path):
    pdf = _arrival(spark)
    # contiguous arrival-order chunks, one per micro-batch
    size = -(-len(pdf) // N_BATCHES)
    chunks = [pdf.iloc[i * size : (i + 1) * size] for i in range(N_BATCHES)]
    chunks = [c for c in chunks if len(c)]

    # the twin only proves something if some user's consecutive events
    # straddle a batch boundary
    straddles = 0
    for a, b in zip(chunks, chunks[1:]):
        straddles += len(
            set(a["user_id"]) & set(b["user_id"])
        )
    assert straddles > 0

    feed = tmp_path / "feed"
    feed.mkdir()
    paths = []
    for k, c in enumerate(chunks):
        p = tmp_path / f"b{k:03d}.parquet"
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(c["event_id"], pa.int64()),
                    "user_id": pa.array(c["user_id"], pa.int64()),
                    "event_type": pa.array(c["event_type"], pa.string()),
                    "us": pa.array(c["us"], pa.int64()),
                }
            ),
            p,
        )
        paths.append(p)

    stream = spark.readStream.schema(
        "event_id bigint, user_id bigint, event_type string, us bigint"
    ).parquet(str(feed))
    q = (
        return_gaps_stream(stream)
        .writeStream.format("memory")
        .queryName("return_gaps")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        import shutil

        for p in paths:
            shutil.copy(p, feed / p.name)
            q.processAllAvailable()
    finally:
        q.stop()

    streamed = Counter(
        (r["event_type"], r["gap_us"])
        for r in spark.sql("SELECT * FROM return_gaps").collect()
    )
    assert streamed == _golden_pairs(pdf)

    # fold the streamed pairs into the hazard table and pin it to the
    # registered batch query, column for column
    n_events = Counter(pdf["event_type"])
    emitted = Counter(t for (t, _) in streamed.elements())
    batch = {
        r["event_type"]: r
        for r in QUERIES["events_return_probability"](spark, SF).collect()
    }
    assert set(batch) == set(n_events)
    for etype, row in batch.items():
        n = n_events[etype]
        assert row["n_events"] == n
        for h in RETURN_H_GRID:
            within = sum(
                c
                for (t, gap), c in streamed.items()
                if t == etype and gap <= h * 3_600_000_000
            )
            assert float(row[f"p_return_{h}h"]) == round(within / n, 6), (
                etype,
                h,
            )
        censored = n - emitted[etype]
        assert float(row["censored_share"]) == round(censored / n, 6)
    # exactly one censored event per user: the register at feed end
    assert sum(
        n_events[t] - emitted[t] for t in n_events
    ) == pdf["user_id"].nunique()
