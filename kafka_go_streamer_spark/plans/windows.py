"""Event-time windowing over the ``events`` stream table — the
streaming-native operators the reference never had (its only notion of
time is a wall-clock flush timer, reference main.go:439). Expressed
here in batch form (identical semantics; the streaming wrap adds
``withWatermark`` — see ``streaming/`` and its tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round

from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.sources.tables import load_table

SESSION_GAP_MIN = 30


@query(
    "window_tumbling_hourly",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (streaming-compatible: add a
    watermark and this exact plan runs under readStream).

    Scale: one shuffle on (window, type); partial aggregation happens
    map-side so shuffle volume is O(windows x types), not O(events)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            stable_round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "window_sliding_hourly",
    oracle="""
    SELECT window_start, count(*) AS n, round(avg(value), 4) AS avg_value
    FROM (
      SELECT time_bucket(INTERVAL '30 minutes', ts)
               - (k * INTERVAL '30 minutes') AS window_start, value
      FROM events, (VALUES (0), (1)) shifts(k)
    )
    GROUP BY window_start
    """,
)
def window_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h size, 30 min slide): every event lands in
    exactly size/slide windows; Spark's window() generates them
    directly, the oracle replays via shifted buckets."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            stable_round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "avg_value")
    )


@query(
    "window_session_per_user",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '{SESSION_GAP_MIN} minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    islands AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '{SESSION_GAP_MIN} minutes' AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS session_value
    FROM islands
    GROUP BY user_id, session_no
    """,
)
def window_session_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user via
    ``session_window`` — the merging-window operator; the oracle replays
    it with the classic gaps-and-islands construction."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            stable_round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@query(
    "event_dedup_first_per_key",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC
      ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def event_dedup_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stream dedup: keep the earliest event per
    (user, type) — the batch twin of dropDuplicatesWithinWatermark
    (which keeps an arbitrary first; this pins order so it is
    oracle-checkable)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )
