"""Multiple spliters as concurrent StreamingQueries on one session —
the Spark analogue of the reference's per-spliter consume/produce
goroutine pairs (reference main.go:315-337), on file sources."""

from __future__ import annotations

import pytest

from kafka_go_streamer_spark.config import Extractor, Split, Spliter
from kafka_go_streamer_spark.streaming import start_file_stream_router

SPLITER_A = Spliter(
    input_topic="in-a",
    actions={"matched": "a-match", "unmatched": "a-dead"},
    splits=[Split(Extractor("alpha"))],
)
SPLITER_B = Spliter(
    input_topic="in-b",
    actions={"matched": "b-match"},
    splits=[Split(Extractor("beta"))],
)


pytestmark = pytest.mark.slow


def test_two_spliters_run_concurrently(spark, tmp_path):
    da, db = tmp_path / "a", tmp_path / "b"
    da.mkdir(), db.mkdir()
    (da / "1.txt").write_text("has alpha inside\nnothing here\n")
    (db / "1.txt").write_text("some beta value\nalso nothing\n")

    qa = start_file_stream_router(spark, SPLITER_A, str(da), query_name="out_a")
    qb = start_file_stream_router(spark, SPLITER_B, str(db), query_name="out_b")
    try:
        qa.awaitTermination(120)
        qb.awaitTermination(120)
        a = {
            (r["value"], r["topic"])
            for r in spark.sql("SELECT * FROM out_a").collect()
        }
        b = {
            (r["value"], r["topic"])
            for r in spark.sql("SELECT * FROM out_b").collect()
        }
        assert a == {
            ("has alpha inside", "a-match"),
            ("nothing here", "a-dead"),
        }
        # spliter B has no unmatched topic -> non-matching rows dropped
        assert b == {("some beta value", "b-match")}
    finally:
        for q in (qa, qb):
            if q.isActive:
                q.stop()
