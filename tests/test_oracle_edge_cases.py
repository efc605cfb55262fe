"""Adversarial fixtures for the oracle edge cases fixed in round 2
(asof NULL-value carry, UDTF empty-token parity, session-window
tie-break) — the driver's fixed testdata never triggers these, so they
are pinned here against hand-built frames, with DuckDB replaying the
oracle construction on the same rows.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_go_streamer_spark.operators.asof import asof_join


def test_asof_null_valued_latest_right_row(spark):
    """If the MOST RECENT right row at-or-before a left timestamp has a
    NULL value, the as-of result must be that NULL — not a value
    resurrected from an older right row (the bug a per-column
    last(ignorenulls=True) carry has; the struct carry fixes it)."""
    base = dt.datetime(2024, 1, 1)

    def t(minutes):
        return base + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [(1, t(10), "a"), (1, t(25), "b")], "user_id int, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, t(0), 100.0), (1, t(20), None)],
        "user_id int, ts timestamp, amount double",
    )
    out = {
        r["tag"]: (r["amount_asof"], r["matched_time"])
        for r in asof_join(left, right, on="ts", by="user_id").collect()
    }
    # left "a" at t10: latest right is t0 -> 100.0
    assert out["a"] == (100.0, t(0))
    # left "b" at t25: latest right is t20 whose amount is NULL ->
    # NULL amount, but matched_time still t20 (the match EXISTS)
    assert out["b"] == (None, t(20))


def test_udtf_word_counts_empty_and_blank_text(spark):
    """Empty and all-whitespace documents must emit ZERO rows from both
    the Python UDTF (str.split() drops empty tokens) and the oracle
    construction (which must filter the '' token string_split_regex
    emits) — the parity gap ADVICE flagged at udtf_queries.py:35."""
    from kafka_go_streamer_spark.plans.udtf_queries import WordCountsUDTF

    spark.udtf.register("word_counts_edge", WordCountsUDTF)
    rows = [(1, ""), (2, "   "), (3, "a b a"), (4, "\t\n")]
    spark.createDataFrame(rows, "doc_id int, text string").createOrReplaceTempView(
        "_edge_docs"
    )
    got = {
        (r["doc_id"], r["word"]): r["n"]
        for r in spark.sql(
            "SELECT d.doc_id, wc.word, wc.n "
            "FROM _edge_docs d, LATERAL word_counts_edge(d.text) wc"
        ).collect()
    }
    assert got == {(3, "a"): 2, (3, "b"): 1}

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    oracle = con.execute(
        """
        SELECT doc_id, word, count(*)::INTEGER AS n
        FROM (
          SELECT doc_id,
                 unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
          FROM documents
        )
        WHERE word <> ''
        GROUP BY doc_id, word
        """
    ).fetchall()
    assert {(d, w): n for d, w, n in oracle} == got


@pytest.mark.parametrize("gap_minutes", [30])
def test_session_window_duplicate_ts_and_exact_boundary(spark, gap_minutes):
    """Duplicate (user, ts) rows and an event EXACTLY gap after the
    previous one: Spark's session_window merges the boundary event
    (inclusive end) and DuckDB's `> gap` gaps-and-islands construction
    does the same; duplicate timestamps break ties on event_id
    identically. Pinned here because the driver testdata never places
    an event exactly on a session boundary."""
    base = dt.datetime(2024, 1, 1)

    def t(minutes):
        return base + dt.timedelta(minutes=minutes)

    rows = [
        (1, t(0), 10, 1.0),
        (1, t(0), 11, 2.0),  # duplicate (user, ts)
        (1, t(gap_minutes), 12, 3.0),  # exactly at the gap boundary
        (1, t(3 * gap_minutes), 13, 4.0),  # clear new session
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id int, value double"
    )
    got = sorted(
        (r["s"], r["e"], r["n"])
        for r in df.groupBy(
            "user_id", F.session_window("ts", f"{gap_minutes} minutes").alias("sw")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("sw.start").alias("s"), F.col("sw.end").alias("e"), "n")
        .collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (user_id INT, ts TIMESTAMP, event_id INT, value DOUBLE)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?)", rows)
    want = sorted(
        (s, e, n)
        for _, s, e, n in con.execute(
            f"""
            WITH marked AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                               > INTERVAL '{gap_minutes} minutes'
                          OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                          THEN 1 ELSE 0 END AS new_session
              FROM events
            ),
            islands AS (
              SELECT user_id, ts,
                     sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS session_no
              FROM marked
            )
            SELECT user_id, min(ts) AS s,
                   max(ts) + INTERVAL '{gap_minutes} minutes' AS e,
                   count(*) AS n
            FROM islands GROUP BY user_id, session_no
            """
        ).fetchall()
    )
    assert got == want
    assert [n for _, _, n in got] == [3, 1]


def test_simhash64_cross_engine_fuzz(spark):
    """Randomized cross-engine parity for the 64-bit SimHash: Spark's
    two-half construction must equal DuckDB's BIGINT expression on
    arbitrary word soups — including signatures with the sign bit set,
    which is exactly where a BIGINT-unsafe twin diverges."""
    import random

    from kafka_go_streamer_spark.operators.dedup import (
        simhash64_sql,
        simhash64_table,
    )

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(200)]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(1, 40))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r["simhash64"]
        for r in simhash64_table(df, "doc_id").collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = dict(
        con.execute(
            f"""
            WITH w0 AS (
              SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\\s+') AS w
              FROM documents
            )
            SELECT doc_id, {simhash64_sql('w')} AS sh FROM w0
            """
        ).fetchall()
    )
    assert got == want
    # the fuzz must actually exercise the sign bit for the test to
    # mean anything
    assert any(v < 0 for v in got.values())
