"""As-of join semantics: backward match, exact-tie inclusion, tolerance,
keys with no match — checked against hand-computed expectations and the
pandas merge_asof reference implementation."""

from __future__ import annotations

import datetime as dt

from kafka_go_streamer_spark.operators.asof import asof_join, asof_join_pandas


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:03"), 100.0),
            ("A", _ts("2024-01-01 10:00:08"), 101.0),
            ("B", _ts("2024-01-01 10:00:01"), 50.0),
            ("C", _ts("2024-01-01 10:00:05"), 7.0),
        ],
        "sym string, ts timestamp, trade_px double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:01"), 99.5),
            ("A", _ts("2024-01-01 10:00:03"), 99.9),  # exact tie with trade 1
            ("A", _ts("2024-01-01 10:00:07"), 100.5),
            ("B", _ts("2024-01-01 10:00:02"), 49.9),  # after B's only trade
        ],
        "sym string, ts timestamp, quote_px double",
    )
    return trades, quotes


def test_asof_backward_with_ties_and_missing(spark):
    trades, quotes = _frames(spark)
    out = {
        (r["sym"], r["ts"].second): (r["quote_px_asof"], r["matched_time"])
        for r in asof_join(trades, quotes, on="ts", by="sym").collect()
    }
    assert out[("A", 3)][0] == 99.9  # exact tie matches (<=)
    assert out[("A", 8)][0] == 100.5
    assert out[("B", 1)] == (None, None)  # quote arrives later -> no match
    assert out[("C", 5)] == (None, None)  # key absent from right
    assert len(out) == 4  # all left rows preserved


def test_asof_tolerance(spark):
    trades, quotes = _frames(spark)
    out = {
        (r["sym"], r["ts"].second): r["quote_px_asof"]
        for r in asof_join(
            trades, quotes, on="ts", by="sym", tolerance_seconds=1
        ).collect()
    }
    assert out[("A", 3)] == 99.9  # 0s gap, within tolerance
    assert out[("A", 8)] == 100.5  # 1s gap, within tolerance
    # widen the gap: trade at 10:00:08 vs quote 10:00:07 = 1s ok; make sure
    # a 2s+ gap nulls out
    out0 = {
        (r["sym"], r["ts"].second): r["quote_px_asof"]
        for r in asof_join(
            trades, quotes, on="ts", by="sym", tolerance_seconds=0
        ).collect()
    }
    assert out0[("A", 8)] is None and out0[("A", 3)] == 99.9


def test_asof_matches_pandas_reference(spark):
    trades, quotes = _frames(spark)
    a = {
        (r["sym"], r["ts"]): r["quote_px_asof"]
        for r in asof_join(trades, quotes, on="ts", by="sym").collect()
    }
    b = {
        (r["sym"], r["ts"]): r["quote_px_asof"]
        for r in asof_join_pandas(trades, quotes, on="ts", by="sym").collect()
    }
    assert a == b


def test_asof_no_shuffle_explosion(spark):
    """The scalable form must contain exactly one Exchange (the window
    shuffle), no joins."""
    trades, quotes = _frames(spark)
    plan = (
        asof_join(trades, quotes, on="ts", by="sym")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
