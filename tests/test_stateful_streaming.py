"""Custom stateful streaming operator: per-key running totals via
applyInPandasWithState, fed by a two-batch file stream so state
demonstrably carries across micro-batches."""

from __future__ import annotations

import time

from kafka_go_streamer_spark.streaming.stateful import running_totals_per_user


def test_running_totals_carry_state_across_batches(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    (src / "b1.csv").write_text("user_id,value\n1,10.0\n1,5.0\n2,1.0\n")

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("header", True)
        .csv(str(src))
    )
    q = (
        running_totals_per_user(stream)
        .writeStream.format("memory")
        .queryName("state_smoke")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r["user_id"]: (r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM state_smoke").collect()
        }
        assert first == {1: (2, 15.0), 2: (1, 1.0)}

        # second batch arrives: state must accumulate, not reset
        (src / "b2.csv").write_text("user_id,value\n1,2.5\n3,7.0\n")
        time.sleep(0.2)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM state_smoke").collect()
        latest = {}
        for r in rows:  # memory sink appends updates; last write wins
            latest[r["user_id"]] = (r["n_events"], r["total_value"])
        assert latest[1] == (3, 17.5)
        assert latest[3] == (1, 7.0)
        assert latest[2] == (1, 1.0)
    finally:
        q.stop()
