"""Round-12 wave 3: pipeline economics — the storage-layout, batch-shape
and serving-cost planning tables a 100 TB deployment reads before it
spends cluster time.

* ``storage_shard_plan`` — per-source output-shard plan at a target
  shard size: shard counts, bytes and docs per shard, corpus share.
  The table that turns "write the cleaned corpus" into a concrete
  `repartitionByRange(n)` argument per source, and the first thing an
  operator checks when a source starts emitting 4 KB files.

* ``storage_skipping_minmax_audit`` — data-skipping effectiveness of
  two physical layouts (arrival order vs time-sorted) simulated as
  fixed-row-count files with per-file min/max zone maps, probed by a
  deterministic grid of point-in-time queries. The number that
  justifies (or kills) a write-time sort: parquet readers skip a file
  iff the probe falls outside its [min,max].

* ``storage_partition_layout_skew`` — row-count skew of three
  candidate partitioning keys (event_type, user-id bucket, day).
  Skew = max/mean partition rows; the straggler predictor read before
  choosing a `partitionBy` for the events sink.

* ``pack_length_bucket_plan`` — power-of-two sequence-length buckets:
  docs, real tokens, padded tokens and padding waste per bucket under
  a pad-to-bucket-ceiling batching policy — the cheap alternative a
  team weighs against the greedy packer (``pack_fill_rate_stats``
  prices packing; this prices NOT packing).

* ``events_trigger_batch_profile`` — micro-batch row-count profile at
  candidate trigger intervals (1 s / 10 s / 60 s): batches, mean/p50/
  p95/max rows per batch. The reference flushes on a hardcoded 10 s
  timer (main.go:439); this is the measurement that tells you what
  the 10 s actually buys at the observed arrival rate.

* ``ann_recall_cost_frontier`` — the IVF recall/cost frontier: for
  each nprobe, mean recall@10 AND mean vectors scanned per query (+
  corpus share). ``ann_nprobe_recall_curve`` reports what each nprobe
  FINDS; this adds what it COSTS — the two columns an operator reads
  together to pick the knee.

Scale discipline: every audit here aggregates to a handful of rows in
one or two passes; the layout simulations use rank arithmetic (the
write-time range sort a real layout job performs anyway, expressed as
`repartitionByRange` + footer stats at cluster scale); the frontier
reuses the fixed-panel discipline (PANEL_MAX_ID) so panel × corpus
work never grows quadratically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions import text as X
from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.sources.tables import load_table

#: Target shard size for the output-layout plan. Test-scale stand-in;
#: production swaps one constant (e.g. 256 MiB) — the plan shape is
#: size-independent.
SHARD_TARGET_BYTES = 16_384

#: Simulated file count / probe count for the zone-map skipping audit.
SKIP_N_FILES = 64
SKIP_N_PROBES = 8

#: Sequence-length bucket ceilings (pad-to-ceiling policy). Anything
#: longer than the top bucket clips into it (documented; the corpus
#: max is far below it at every SF).
LEN_BUCKETS = (16, 32, 64, 128, 256, 512)

#: Candidate micro-batch trigger intervals, seconds.
TRIGGER_SWEEP = (1, 10, 60)

#: nprobe settings priced by the frontier (4 = all seed cells — the
#: exhaustive anchor: recall 1.0 at full scan share).
FRONTIER_NPROBES = (1, 2, 4)


@query(
    "storage_shard_plan",
    oracle=f"""
    WITH per_source AS (
      SELECT source, count(*)::BIGINT AS n_docs,
             sum(n_chars)::BIGINT AS total_bytes
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, total_bytes,
           greatest(ceil(total_bytes * 1.0 / {SHARD_TARGET_BYTES}), 1)::BIGINT
             AS n_shards,
           round(total_bytes * 1.0 /
             greatest(ceil(total_bytes * 1.0 / {SHARD_TARGET_BYTES}), 1), 2)
             AS mean_shard_bytes,
           round(n_docs * 1.0 /
             greatest(ceil(total_bytes * 1.0 / {SHARD_TARGET_BYTES}), 1), 2)
             AS docs_per_shard,
           round(total_bytes * 1.0 / sum(total_bytes) OVER (), 6)
             AS corpus_share
    FROM per_source
    """,
)
def storage_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-shard plan per source at SHARD_TARGET_BYTES: how many
    shards each source's cleaned bytes fill, the resulting shard size
    and docs-per-shard, and the source's corpus share. This is the
    argument to `repartitionByRange` a layout job computes before the
    write — too few shards makes unsplittable hot files, too many
    makes the small-file problem compaction then pays for.

    Scale: one map-side-combined aggregate on source (single-digit
    cardinality), then window arithmetic over the 20-row result —
    the fact table is scanned once and never shuffled on a wide key."""
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_bytes"),
    )
    n_shards = F.greatest(
        F.ceil(F.col("total_bytes") * 1.0 / SHARD_TARGET_BYTES), F.lit(1)
    )
    return per_source.select(
        "source",
        "n_docs",
        "total_bytes",
        n_shards.cast("long").alias("n_shards"),
        stable_round(F.col("total_bytes") * 1.0 / n_shards, 2).alias(
            "mean_shard_bytes"
        ),
        stable_round(F.col("n_docs") * 1.0 / n_shards, 2).alias(
            "docs_per_shard"
        ),
        stable_round(
            F.col("total_bytes")
            * 1.0
            / F.sum("total_bytes").over(Window.partitionBy()),
            6,
        ).alias("corpus_share"),
    )


def _skipping_audit_sql() -> str:
    return f"""
    WITH bounds AS (
      SELECT min(event_id) AS id_lo, max(event_id) AS id_hi,
             min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
      FROM events
    ),
    base AS (
      SELECT event_id, epoch_us(ts) AS us, id_lo, id_hi, lo, hi
      FROM events CROSS JOIN bounds
    ),
    files AS (
      SELECT 'arrival' AS layout,
             ((event_id - id_lo) * {SKIP_N_FILES})
               // (id_hi - id_lo + 1) AS file_id,
             min(us) AS f_min, max(us) AS f_max
      FROM base GROUP BY 1, 2
      UNION ALL
      SELECT 'time_sorted' AS layout,
             ((us - lo) * {SKIP_N_FILES}) // (hi - lo + 1) AS file_id,
             min(us) AS f_min, max(us) AS f_max
      FROM base GROUP BY 1, 2
    ),
    probes AS (
      SELECT lo + ((hi - lo) * i) // {SKIP_N_PROBES + 1} AS p
      FROM bounds, generate_series(1, {SKIP_N_PROBES}) AS t(i)
    )
    SELECT layout,
           count(DISTINCT file_id)::INTEGER AS n_files,
           round(sum(CASE WHEN p BETWEEN f_min AND f_max
                          THEN 1 ELSE 0 END) * 1.0 / {SKIP_N_PROBES}, 4)
             AS mean_files_hit,
           round(1.0 - sum(CASE WHEN p BETWEEN f_min AND f_max
                                THEN 1 ELSE 0 END) * 1.0
                 / ({SKIP_N_PROBES} * {SKIP_N_FILES}), 4) AS skip_rate
    FROM files CROSS JOIN probes
    GROUP BY layout
    """


@query("storage_skipping_minmax_audit", oracle=_skipping_audit_sql)
def storage_skipping_minmax_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Zone-map data-skipping audit: simulate writing the events table
    as SKIP_N_FILES equal-row files under two layouts — arrival order
    (what a streaming sink produces) and time-sorted (what a
    write-time range sort produces) — then probe each layout's
    per-file [min ts, max ts] zone maps with a fixed grid of
    point-in-time queries. `mean_files_hit` is the files a reader must
    open per probe; `skip_rate` is the share of file opens the layout
    saves. The delta between the two rows is the measured value of
    sorting before writing — the number that decides whether the
    extra shuffle pays for itself.

    Scale: NO global sort anywhere (the r12 version ranked the fact
    with two unpartitioned row_number windows — the single-task
    pattern this repo bans). File assignment is pure arithmetic on
    broadcast scalar bounds: the arrival layout bins on the dense
    `event_id` range ((id - id_lo) * N div span — dense ids make the
    equal-width id bins equal-row files, the order a streaming sink
    writes), and the time-sorted layout bins on equal-width [min ts,
    max ts] ranges — exactly the non-overlapping zone maps a
    `repartitionByRange`-sorted write produces. One scan, one
    map-side-combined groupBy per layout; everything downstream is
    128 file rows × 8 probe rows. Integer microsecond arithmetic,
    bit-identical across engines. Plan-asserted: no Window over the
    fact (tests/test_plan_shapes.py)."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min("event_id").alias("id_lo"),
        F.max("event_id").alias("id_hi"),
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    )
    base = e.select(
        "event_id", F.unix_micros("ts").alias("us")
    ).crossJoin(F.broadcast(bounds))

    def files_for(layout: str, bin_expr: str) -> DataFrame:
        return (
            base.select(
                F.lit(layout).alias("layout"),
                F.expr(bin_expr).alias("file_id"),
                F.col("us"),
            )
            .groupBy("layout", "file_id")
            .agg(F.min("us").alias("f_min"), F.max("us").alias("f_max"))
        )

    files = files_for(
        "arrival",
        f"((event_id - id_lo) * {SKIP_N_FILES}) div (id_hi - id_lo + 1)",
    ).unionByName(
        files_for(
            "time_sorted", f"((us - lo) * {SKIP_N_FILES}) div (hi - lo + 1)"
        )
    )
    probes = bounds.select(
        F.explode(
            F.expr(
                f"transform(sequence(1, {SKIP_N_PROBES}), "
                f"i -> lo + ((hi - lo) * i) div {SKIP_N_PROBES + 1})"
            )
        ).alias("p")
    )
    hit = F.col("p").between(F.col("f_min"), F.col("f_max"))
    return (
        files.crossJoin(F.broadcast(probes))
        .groupBy("layout")
        .agg(
            F.countDistinct("file_id").cast("int").alias("n_files"),
            stable_round(
                F.sum(F.when(hit, 1).otherwise(0)) * 1.0 / SKIP_N_PROBES, 4
            ).alias("mean_files_hit"),
            stable_round(
                F.lit(1.0)
                - F.sum(F.when(hit, 1).otherwise(0))
                * 1.0
                / (SKIP_N_PROBES * SKIP_N_FILES),
                4,
            ).alias("skip_rate"),
        )
    )


@query(
    "storage_partition_layout_skew",
    oracle="""
    WITH parts AS (
      SELECT 'by_event_type' AS layout, event_type AS pkey, count(*) AS c
      FROM events GROUP BY 1, 2
      UNION ALL
      SELECT 'by_user_mod_64', (user_id % 64)::VARCHAR, count(*)
      FROM events GROUP BY 1, 2
      UNION ALL
      SELECT 'by_day', strftime(date_trunc('day', ts), '%Y-%m-%d'), count(*)
      FROM events GROUP BY 1, 2
    )
    SELECT layout, count(*)::INTEGER AS n_partitions,
           round(avg(c), 2) AS mean_rows,
           max(c)::BIGINT AS max_rows,
           round(max(c) * 1.0 / avg(c), 4) AS skew
    FROM parts GROUP BY layout
    """,
)
def storage_partition_layout_skew(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partition-key skew audit for the events sink: for each candidate
    `partitionBy` key (event_type, a 64-way user-id bucket, calendar
    day), the partition count, mean and max rows, and skew = max/mean.
    Skew is the straggler multiplier: a key with skew 8 makes the
    slowest write task 8× the average, and the same ratio poisons any
    later shuffle that reuses the key. Read this table before
    committing a layout; it's why `by_event_type` (few hot values) is
    usually the wrong choice even though it prunes best.

    Scale: three map-side-combined aggregates over one scan each (or
    one scan with a 3× constant fan — both shapes are linear and
    narrow); the skew arithmetic runs on the tiny partition frames."""
    e = load_table(spark, sf_dir, "events")
    layouts = [
        ("by_event_type", F.col("event_type")),
        ("by_user_mod_64", (F.col("user_id") % 64).cast("string")),
        ("by_day", F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")),
    ]
    parts = None
    for name, key in layouts:
        p = e.groupBy(key.alias("pkey")).agg(
            F.count(F.lit(1)).alias("c")
        ).select(F.lit(name).alias("layout"), "pkey", "c")
        parts = p if parts is None else parts.unionByName(p)
    return parts.groupBy("layout").agg(
        F.count(F.lit(1)).cast("int").alias("n_partitions"),
        stable_round(F.avg("c"), 2).alias("mean_rows"),
        F.max("c").cast("long").alias("max_rows"),
        stable_round(F.max("c") * 1.0 / F.avg("c"), 4).alias("skew"),
    )


def _len_bucket_case_sql(tok: str) -> str:
    arms = " ".join(
        f"WHEN {tok} <= {b} THEN {b}" for b in LEN_BUCKETS
    )
    return f"CASE {arms} ELSE {LEN_BUCKETS[-1]} END"


@query(
    "pack_length_bucket_plan",
    oracle=f"""
    WITH toks AS (
      SELECT {X.token_count_sql('text')} AS tok FROM documents
    ),
    bucketed AS (
      SELECT {_len_bucket_case_sql('tok')}::INTEGER AS bucket, tok
      FROM toks
    )
    SELECT bucket,
           count(*)::BIGINT AS n_docs,
           sum(tok)::BIGINT AS real_tokens,
           (count(*) * bucket)::BIGINT AS padded_tokens,
           round(1.0 - sum(tok) * 1.0 / (count(*) * bucket), 4)
             AS waste_share
    FROM bucketed GROUP BY bucket
    """,
)
def pack_length_bucket_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucket plan under pad-to-ceiling batching: docs
    land in the smallest power-of-two bucket ≥ their token count; per
    bucket, real tokens vs padded tokens and the padding-waste share.
    This prices the SIMPLE batching policy (bucket + pad) against the
    greedy packer (`pack_fill_rate_stats` prices packing) — the two
    tables together answer "is the packer's shuffle worth the pad
    tokens it saves" in FLOPs, before anyone burns cluster time.

    Scale: one narrow projection (regex token count is in-row, no
    explode) into one map-side-combined aggregate on a ≤6-value key —
    scan speed at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    tok = X.token_count(F.col("text"))
    bucket = F.lit(LEN_BUCKETS[-1])
    for b in reversed(LEN_BUCKETS):
        bucket = F.when(tok <= b, F.lit(b)).otherwise(bucket)
    t = d.select(tok.alias("tok"), bucket.cast("int").alias("bucket"))
    g = t.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("tok").cast("long").alias("real_tokens"),
    )
    return g.select(
        "bucket",
        "n_docs",
        "real_tokens",
        (F.col("n_docs") * F.col("bucket")).cast("long").alias(
            "padded_tokens"
        ),
        stable_round(
            F.lit(1.0)
            - F.col("real_tokens") * 1.0
            / (F.col("n_docs") * F.col("bucket")),
            4,
        ).alias("waste_share"),
    )


@query(
    "events_trigger_batch_profile",
    oracle=f"""
    WITH batches AS (
      SELECT g.interval_s,
             epoch_us(e.ts) // (g.interval_s * 1000000) AS b,
             count(*) AS rows_in_batch
      FROM events e
      CROSS JOIN (VALUES {", ".join(f"({s})" for s in TRIGGER_SWEEP)})
        AS g(interval_s)
      GROUP BY 1, 2
    )
    SELECT interval_s,
           count(*)::BIGINT AS n_batches,
           round(avg(rows_in_batch), 2) AS mean_rows,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY rows_in_batch),
                 2) AS p50_rows,
           round(percentile_cont(0.95) WITHIN GROUP (ORDER BY rows_in_batch),
                 2) AS p95_rows,
           max(rows_in_batch)::BIGINT AS max_rows
    FROM batches GROUP BY interval_s
    """,
)
def events_trigger_batch_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Micro-batch row-count profile at candidate trigger intervals:
    bucket events by wall-clock window of 1 s / 10 s / 60 s and report
    batches, mean/p50/p95/max rows per (non-empty) batch. The
    reference flushes on a hardcoded 10 s timer (main.go:439,
    585) with no way to know what that buys; this is the sizing table
    a Structured Streaming `trigger(processingTime=...)` decision
    actually needs — p95 rows per batch is the state/throughput spike
    the executors must absorb.

    Scale: a constant 3× fan (one row per swept interval) into a
    map-side-combined count on (interval, bucket), then per-interval
    percentiles over the bounded batch frame (batches, not events)."""
    e = load_table(spark, sf_dir, "events")
    fanned = e.select(
        F.unix_micros("ts").alias("us"),
        F.explode(
            F.array(*[F.lit(s) for s in TRIGGER_SWEEP])
        ).alias("interval_s"),
    )
    batches = fanned.groupBy(
        "interval_s",
        F.expr("us div (interval_s * 1000000)").alias("b"),
    ).agg(F.count(F.lit(1)).alias("rows_in_batch"))
    return batches.groupBy("interval_s").agg(
        F.count(F.lit(1)).cast("long").alias("n_batches"),
        stable_round(F.avg("rows_in_batch"), 2).alias("mean_rows"),
        stable_round(
            F.percentile("rows_in_batch", F.lit(0.5)), 2
        ).alias("p50_rows"),
        stable_round(
            F.percentile("rows_in_batch", F.lit(0.95)), 2
        ).alias("p95_rows"),
        F.max("rows_in_batch").cast("long").alias("max_rows"),
    )


def _frontier_sql() -> str:
    from kafka_go_streamer_spark.functions.vectors import cosine_sql
    from kafka_go_streamer_spark.plans.scale_ops import _ivf_cells_sql
    from kafka_go_streamer_spark.plans.similarity import PANEL_MAX_ID

    branches = []
    for p in FRONTIER_NPROBES:
        branches.append(f"""
    SELECT {p}::INTEGER AS nprobe,
           round((
             SELECT sum(hits) * 1.0 / (10 * (SELECT count(*) FROM qs))
             FROM (
               SELECT g.q_id, count(c.vec_id) AS hits
               FROM gt g LEFT JOIN (
                 SELECT q_id, vec_id FROM (
                   SELECT s.q_id, s.vec_id,
                          row_number() OVER (
                            PARTITION BY s.q_id
                            ORDER BY s.sim DESC, s.vec_id ASC) AS rn
                   FROM cand_scored s WHERE s.crank <= {p}
                 ) WHERE rn <= 10
               ) c ON c.q_id = g.q_id AND c.vec_id = g.vec_id
               GROUP BY 1
             )
           ), 6) AS mean_recall_at_10,
           round((SELECT count(*) FROM cand_scored WHERE crank <= {p})
             * 1.0 / (SELECT count(*) FROM qs), 2) AS mean_scanned,
           round((SELECT count(*) FROM cand_scored WHERE crank <= {p})
             * 1.0 / ((SELECT count(*) FROM qs)
                      * (SELECT count(*) FROM embeddings)), 6)
             AS scan_share""")
    return f"""
    WITH {_ivf_cells_sql()},
    qs AS MATERIALIZED (
      SELECT vec_id AS q_id, embedding AS qv
      FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < {PANEL_MAX_ID}
    ),
    gt AS MATERIALIZED (
      SELECT q_id, vec_id FROM (
        SELECT q.q_id, e.vec_id,
               row_number() OVER (
                 PARTITION BY q.q_id
                 ORDER BY round({cosine_sql('e.embedding', 'q.qv')}, 6) DESC,
                          e.vec_id ASC) AS rn
        FROM embeddings e CROSS JOIN qs q
        WHERE e.vec_id <> q.q_id
      ) WHERE rn <= 10
    ),
    qc AS MATERIALIZED (
      SELECT q_id, qv, cent_id,
             row_number() OVER (
               PARTITION BY q_id
               ORDER BY round({cosine_sql('cv', 'qv')}, 6) DESC,
                        cent_id ASC) AS crank
      FROM cents CROSS JOIN qs
    ),
    cand_scored AS MATERIALIZED (
      SELECT qc.q_id, cl.vec_id, qc.crank,
             round({cosine_sql('cl.embedding', 'qc.qv')}, 6) AS sim
      FROM cells cl JOIN qc ON cl.cell = qc.cent_id
      WHERE cl.vec_id <> qc.q_id
    )
    {" UNION ALL ".join(branches)}
    """


@query("ann_recall_cost_frontier", oracle=_frontier_sql)
def ann_recall_cost_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF recall/COST frontier: per nprobe, mean recall@10 vs
    ground truth AND the price paid for it — mean candidate vectors
    scored per query, plus that cost as a share of a full corpus scan.
    ``ann_nprobe_recall_curve`` shows what each nprobe finds; an
    operator cannot pick a knee from recall alone. Reading this table,
    nprobe=2 at (say) recall 0.9 for 1/2 the scan of nprobe=4 is a
    decision; the anchor row (all cells) pins recall 1.0 at the full
    in-cell scan share.

    Scale: ground truth and candidate scores computed ONCE against the
    FIXED query panel (PANEL_MAX_ID — the hubness-cap discipline);
    per-nprobe recall re-ranks and the cost column merely COUNTS the
    already-scored candidate frame — no rescoring, no growth in
    panel × corpus work beyond the single audited pass.

    Reference parity note: the reference has no vector surface at all;
    this extends the BASELINE.json north star (similarity search as a
    first-class family) with the tuning economics."""
    from kafka_go_streamer_spark.functions.vectors import cosine
    from kafka_go_streamer_spark.operators.iterate import pinned
    from kafka_go_streamer_spark.plans.scale_ops import (
        IVF_CENTROID_IDS,
        _ivf_cells,
    )
    from kafka_go_streamer_spark.plans.similarity import PANEL_MAX_ID

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < PANEL_MAX_ID)
    ).select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    wq = Window.partitionBy("q_id")
    gt = pinned(
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            stable_round(cosine(F.col("embedding"), F.col("qv")), 6).alias(
                "sim"
            ),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                wq.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
            ),
        )
        .filter(F.col("rn") <= 10)
        .select("q_id", "vec_id")
    )
    cents = emb.filter(F.col("vec_id").isin(*IVF_CENTROID_IDS)).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv")
    )
    qc = (
        cents.crossJoin(F.broadcast(qs))
        .select(
            "q_id",
            "qv",
            "cent_id",
            stable_round(cosine(F.col("cv"), F.col("qv")), 6).alias("qsim"),
        )
        .withColumn(
            "crank",
            F.row_number().over(
                wq.orderBy(F.col("qsim").desc(), F.col("cent_id").asc())
            ),
        )
        .select("q_id", "qv", "cent_id", "crank")
    )
    cells = _ivf_cells(spark, sf_dir)
    scored = pinned(
        cells.join(F.broadcast(qc), cells.cell == qc.cent_id)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "crank",
            stable_round(cosine(F.col("embedding"), F.col("qv")), 6).alias(
                "sim"
            ),
        )
    )
    nq = qs.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    ncorpus = emb.agg(F.count(F.lit(1)).cast("long").alias("n_corpus"))
    # nprobe as a DATA dimension (same collapse as the other ANN grid
    # queries): the cuts explode onto the pinned panel-sized candidate
    # frame for the per-p top-10 windows, the scan cost is a plain
    # conditional aggregate over `scored` (no explode needed), and the
    # |grid| unioned branches become one linear plan.
    top_all = (
        scored.select(
            "q_id",
            "vec_id",
            "crank",
            "sim",
            F.explode(
                F.array(*[F.lit(p) for p in FRONTIER_NPROBES])
            ).alias("pp"),
        )
        .filter(F.col("crank") <= F.col("pp"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("pp", "q_id").orderBy(
                    F.col("sim").desc(), F.col("vec_id").asc()
                )
            ),
        )
        .filter(F.col("rn") <= 10)
        .select("pp", "q_id", "vec_id")
    )
    hits = top_all.join(gt, ["q_id", "vec_id"]).agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("pp") == p, 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias(f"h{p}")
            for p in FRONTIER_NPROBES
        ]
    )
    nscan = scored.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("crank") <= p, 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias(f"s{p}")
            for p in FRONTIER_NPROBES
        ]
    )
    return (
        hits.crossJoin(F.broadcast(nscan))
        .crossJoin(F.broadcast(nq))
        .crossJoin(F.broadcast(ncorpus))
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(p).cast("int").alias("nprobe"),
                            stable_round(
                                F.col(f"h{p}")
                                * 1.0
                                / (10 * F.col("n_queries")),
                                6,
                            ).alias("mean_recall_at_10"),
                            stable_round(
                                F.col(f"s{p}") * 1.0 / F.col("n_queries"),
                                2,
                            ).alias("mean_scanned"),
                            stable_round(
                                F.col(f"s{p}")
                                * 1.0
                                / (F.col("n_queries") * F.col("n_corpus")),
                                6,
                            ).alias("scan_share"),
                        )
                        for p in FRONTIER_NPROBES
                    ]
                )
            ).alias("s")
        )
        .select("s.nprobe", "s.mean_recall_at_10", "s.mean_scanned", "s.scan_share")
    )


# ------------------------------------------- storage_zorder_skipping_audit

#: 2-D layout audit geometry: 8x8 bin grid -> 64 files per layout,
#: probed by 8 deterministic 2x2-bin rectangles.
Z_GRID_BITS = 3
Z_N_FILES = 64
Z_N_PROBES = 8


def _zorder_audit_sql() -> str:
    g = 1 << Z_GRID_BITS  # 8
    z_expr = (
        "((tb % 2) + 2 * (ub % 2) + 4 * ((tb // 2) % 2)"
        " + 8 * ((ub // 2) % 2) + 16 * ((tb // 4) % 2)"
        " + 32 * ((ub // 4) % 2))"
    )
    return f"""
    WITH bounds AS (
      SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi,
             min(user_id) AS ulo, max(user_id) AS uhi
      FROM events
    ),
    base AS (
      SELECT epoch_us(ts) AS us, user_id, lo, hi, ulo, uhi
      FROM events CROSS JOIN bounds
    ),
    binned AS (
      SELECT us, user_id,
             ((us - lo) * {g}) // (hi - lo + 1) AS tb,
             ((user_id - ulo) * {g}) // (uhi - ulo + 1) AS ub,
             ((us - lo) * {Z_N_FILES}) // (hi - lo + 1) AS tb64
      FROM base
    ),
    files AS (
      SELECT 'time_sorted' AS layout, tb64 AS file_id,
             min(us) AS f_tmin, max(us) AS f_tmax,
             min(user_id) AS f_umin, max(user_id) AS f_umax
      FROM binned GROUP BY 1, 2
      UNION ALL
      SELECT 'zorder', {z_expr},
             min(us), max(us), min(user_id), max(user_id)
      FROM binned GROUP BY 1, 2
    ),
    pr AS (
      SELECT i,
             ('0x' || substr(md5(i::VARCHAR || 'za'), 1, 15))::BIGINT
               % ({g} - 1) AS a,
             ('0x' || substr(md5(i::VARCHAR || 'zb'), 1, 15))::BIGINT
               % ({g} - 1) AS b
      FROM generate_series(1, {Z_N_PROBES}) t(i)
    ),
    probes AS (
      SELECT lo + ((hi - lo + 1) * a) // {g} AS p_tlo,
             lo + ((hi - lo + 1) * (a + 2)) // {g} - 1 AS p_thi,
             ulo + ((uhi - ulo + 1) * b) // {g} AS p_ulo,
             ulo + ((uhi - ulo + 1) * (b + 2)) // {g} - 1 AS p_uhi
      FROM pr CROSS JOIN bounds
    )
    SELECT layout,
           count(DISTINCT file_id)::BIGINT AS n_files,
           round(sum(CASE WHEN f_tmin <= p_thi AND f_tmax >= p_tlo
                           AND f_umin <= p_uhi AND f_umax >= p_ulo
                          THEN 1 ELSE 0 END) * 1.0 / {Z_N_PROBES}, 4)
             AS mean_files_hit,
           round(1.0 - sum(CASE WHEN f_tmin <= p_thi AND f_tmax >= p_tlo
                                 AND f_umin <= p_uhi AND f_umax >= p_ulo
                                THEN 1 ELSE 0 END) * 1.0
                 / ({Z_N_PROBES} * {Z_N_FILES}), 4) AS skip_rate
    FROM files CROSS JOIN probes
    GROUP BY layout
    """


@query("storage_zorder_skipping_audit", oracle=_zorder_audit_sql)
def storage_zorder_skipping_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 2-D sequel to ``storage_skipping_minmax_audit``: zone-map
    skipping under RECTANGLE predicates (a time range AND a user
    range — the dashboard/backfill query shape) for two 64-file
    layouts: a plain time sort vs a Z-ORDER layout interleaving 3
    time bits with 3 user-id bits (the curve ``operators/zorder.py``
    writes for real). A time-sorted file spans the full user range,
    so the user half of the predicate prunes nothing; Z-ordering
    bounds BOTH columns per file at the cost of coarser time bounds —
    this table measures the trade on real data, and is the number
    that justifies (or kills) a Z-order rewrite for a given query
    mix.

    Scale: file assignment is the same broadcast-bounds arithmetic as
    the 1-D audit (bit interleaving is integer div/mod — no sort, no
    window); zone maps are one map-side-combined aggregate per
    layout; everything downstream is 128 file rows x 8 probe
    rectangles."""
    g = 1 << Z_GRID_BITS
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
        F.min("user_id").alias("ulo"),
        F.max("user_id").alias("uhi"),
    )
    binned = (
        e.select(F.unix_micros("ts").alias("us"), "user_id")
        .crossJoin(F.broadcast(bounds))
        .selectExpr(
            "us",
            "user_id",
            f"((us - lo) * {g}) div (hi - lo + 1) AS tb",
            f"((user_id - ulo) * {g}) div (uhi - ulo + 1) AS ub",
            f"((us - lo) * {Z_N_FILES}) div (hi - lo + 1) AS tb64",
        )
    )
    z = F.expr(
        "(tb % 2) + 2 * (ub % 2) + 4 * ((tb div 2) % 2)"
        " + 8 * ((ub div 2) % 2) + 16 * ((tb div 4) % 2)"
        " + 32 * ((ub div 4) % 2)"
    )

    def zone_maps(layout: str, fid) -> DataFrame:
        return (
            binned.select(
                F.lit(layout).alias("layout"),
                fid.alias("file_id"),
                "us",
                "user_id",
            )
            .groupBy("layout", "file_id")
            .agg(
                F.min("us").alias("f_tmin"),
                F.max("us").alias("f_tmax"),
                F.min("user_id").alias("f_umin"),
                F.max("user_id").alias("f_umax"),
            )
        )

    files = zone_maps("time_sorted", F.col("tb64")).unionByName(
        zone_maps("zorder", z)
    )
    pr = (
        bounds.select(
            F.explode(
                F.expr(f"sequence(1, {Z_N_PROBES})")
            ).alias("i"),
            "lo",
            "hi",
            "ulo",
            "uhi",
        )
        .selectExpr(
            f"conv(substring(md5(concat(cast(i as string), 'za')), 1, 15),"
            f" 16, 10) % {g - 1} AS a",
            f"conv(substring(md5(concat(cast(i as string), 'zb')), 1, 15),"
            f" 16, 10) % {g - 1} AS b",
            "lo",
            "hi",
            "ulo",
            "uhi",
        )
        .selectExpr(
            f"lo + ((hi - lo + 1) * a) div {g} AS p_tlo",
            f"lo + ((hi - lo + 1) * (a + 2)) div {g} - 1 AS p_thi",
            f"ulo + ((uhi - ulo + 1) * b) div {g} AS p_ulo",
            f"ulo + ((uhi - ulo + 1) * (b + 2)) div {g} - 1 AS p_uhi",
        )
    )
    hit = (
        (F.col("f_tmin") <= F.col("p_thi"))
        & (F.col("f_tmax") >= F.col("p_tlo"))
        & (F.col("f_umin") <= F.col("p_uhi"))
        & (F.col("f_umax") >= F.col("p_ulo"))
    )
    return (
        files.crossJoin(F.broadcast(pr))
        .groupBy("layout")
        .agg(
            F.countDistinct("file_id").cast("long").alias("n_files"),
            stable_round(
                F.sum(F.when(hit, 1).otherwise(0)) * 1.0 / Z_N_PROBES, 4
            ).alias("mean_files_hit"),
            stable_round(
                F.lit(1.0)
                - F.sum(F.when(hit, 1).otherwise(0))
                * 1.0
                / (Z_N_PROBES * Z_N_FILES),
                4,
            ).alias("skip_rate"),
        )
    )


# ------------------------------------------------- storage_layout_chooser

#: Files per candidate layout and probes per workload shape.
LAYOUT_FILES = 64
LAYOUT_N_PROBES = 8
#: Workload mix the chooser prices: range scans dominate an analytics
#: table, point lookups come second, 2-D rectangles (dashboard
#: drill-ins) last. Integer weights so the ranking key stays integer.
LAYOUT_W_TIME = 5
LAYOUT_W_POINT = 3
LAYOUT_W_RECT = 2
LAYOUT_W_SUM = LAYOUT_W_TIME + LAYOUT_W_POINT + LAYOUT_W_RECT

_Z_EXPR_SQL = (
    "((tb % 2) + 2 * (ub % 2) + 4 * ((tb // 2) % 2)"
    " + 8 * ((ub // 2) % 2) + 16 * ((tb // 4) % 2)"
    " + 32 * ((ub // 4) % 2))"
)


def _layout_chooser_sql() -> str:
    from kafka_go_streamer_spark.plans.fidelity import _md5long_sql

    g = 1 << Z_GRID_BITS
    nf, np_, = LAYOUT_FILES, LAYOUT_N_PROBES
    n_sql = "(SELECT n FROM tot)"
    wnum = (
        f"({LAYOUT_W_TIME} * num_t + {LAYOUT_W_POINT} * num_p"
        f" + {LAYOUT_W_RECT} * num_r)"
    )
    return f"""
    WITH bounds AS (
      SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi,
             min(user_id) AS ulo, max(user_id) AS uhi
      FROM events
    ),
    binned AS (
      SELECT epoch_us(ts) AS us, user_id,
             ((epoch_us(ts) - lo) * {g}) // (hi - lo + 1) AS tb,
             ((user_id - ulo) * {g}) // (uhi - ulo + 1) AS ub,
             ((epoch_us(ts) - lo) * {nf}) // (hi - lo + 1) AS tb64,
             {_md5long_sql("user_id::VARCHAR")} % {nf} AS ubkt
      FROM events CROSS JOIN bounds
    ),
    files AS (
      SELECT layout,
             CASE layout WHEN 'time_sorted' THEN tb64
                  WHEN 'zorder' THEN {_Z_EXPR_SQL}
                  ELSE ubkt END AS file_id,
             min(us) AS f_tmin, max(us) AS f_tmax,
             min(user_id) AS f_umin, max(user_id) AS f_umax,
             count(*) AS cnt
      FROM binned CROSS JOIN (
        VALUES ('time_sorted'), ('zorder'), ('user_bucket')
      ) l(layout)
      GROUP BY 1, 2
    ),
    tot AS (SELECT count(*) AS n FROM events),
    tp AS (
      SELECT lo + ((hi - lo + 1) * a) // {g} AS p_tlo,
             lo + ((hi - lo + 1) * (a + 2)) // {g} - 1 AS p_thi
      FROM (
        SELECT ('0x' || substr(md5(i::VARCHAR || 'lt'), 1, 15))::BIGINT
                 % {g - 1} AS a
        FROM generate_series(1, {np_}) t(i)
      ) CROSS JOIN bounds
    ),
    up AS (
      SELECT p_u,
             ('0x' || substr(md5(p_u::VARCHAR), 1, 15))::BIGINT % {nf}
               AS p_bucket
      FROM (
        SELECT ulo + ((uhi - ulo + 1) * k) // {nf} AS p_u
        FROM (
          SELECT ('0x' || substr(md5(i::VARCHAR || 'lu'), 1, 15))::BIGINT
                   % {nf} AS k
          FROM generate_series(1, {np_}) t(i)
        ) CROSS JOIN bounds
      )
    ),
    rp AS (
      SELECT lo + ((hi - lo + 1) * a) // {g} AS p_tlo,
             lo + ((hi - lo + 1) * (a + 2)) // {g} - 1 AS p_thi,
             ulo + ((uhi - ulo + 1) * b) // {g} AS p_ulo,
             ulo + ((uhi - ulo + 1) * (b + 2)) // {g} - 1 AS p_uhi
      FROM (
        SELECT ('0x' || substr(md5(i::VARCHAR || 'za'), 1, 15))::BIGINT
                 % {g - 1} AS a,
               ('0x' || substr(md5(i::VARCHAR || 'zb'), 1, 15))::BIGINT
                 % {g - 1} AS b
        FROM generate_series(1, {np_}) t(i)
      ) CROSS JOIN bounds
    ),
    nt AS (
      SELECT layout, sum(CASE WHEN f_tmin <= p_thi AND f_tmax >= p_tlo
                              THEN cnt ELSE 0 END) AS num_t
      FROM files CROSS JOIN tp GROUP BY 1
    ),
    np AS (
      SELECT layout,
             sum(CASE WHEN (layout = 'user_bucket' AND file_id = p_bucket)
                        OR (layout <> 'user_bucket'
                            AND f_umin <= p_u AND f_umax >= p_u)
                 THEN cnt ELSE 0 END) AS num_p
      FROM files CROSS JOIN up GROUP BY 1
    ),
    nr AS (
      SELECT layout, sum(CASE WHEN f_tmin <= p_thi AND f_tmax >= p_tlo
                               AND f_umin <= p_uhi AND f_umax >= p_ulo
                              THEN cnt ELSE 0 END) AS num_r
      FROM files CROSS JOIN rp GROUP BY 1
    )
    SELECT nt.layout AS layout,
           round(num_t * 1.0 / ({np_} * {n_sql}), 6)
             AS scan_share_time_range,
           round(num_p * 1.0 / ({np_} * {n_sql}), 6)
             AS scan_share_user_point,
           round(num_r * 1.0 / ({np_} * {n_sql}), 6) AS scan_share_rect,
           round({wnum} * 1.0 / ({LAYOUT_W_SUM} * {np_} * {n_sql}), 6)
             AS weighted_scan_share,
           row_number() OVER (ORDER BY {wnum}, nt.layout)::INT
             AS cost_rank
    FROM nt
    JOIN np ON nt.layout = np.layout
    JOIN nr ON nt.layout = nr.layout
    """


@query("storage_layout_chooser", oracle=_layout_chooser_sql)
def storage_layout_chooser(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE layout decision table: which physical layout of the events
    fact should the writer produce? Composes the three storage audits
    (1-D min-max skipping, 2-D Z-order skipping, hash-bucket pruning —
    this module and ``fidelity.py``) into one joint layout x workload
    price sheet. Three candidate 64-file layouts — a plain time sort,
    a Z-order interleave of time and user bits (what
    ``operators/zorder.py`` writes), and a user-hash bucketing (what
    ``operators/bucketing.py`` writes) — are each priced against the
    same three-shape workload: time-range scans, user point lookups,
    and time x user rectangles (the Z-audit's exact probe
    rectangles). Pruning is layout-honest: zone-map overlap for sort
    layouts, bucket identity for the hash layout's point lookups (a
    hash file's min/max spans everything; a range probe can't prune
    buckets). Output per layout: row-weighted expected scan share per
    shape, the workload-weighted total (weights 5/3/2 = range-heavy
    analytics mix), and an integer-keyed rank — cost_rank 1 IS the
    chooser's answer, the layout the writer should produce.

    Scale: one scan of the fact fans each row to its 3 (layout, file)
    assignments — a single map-side-combined aggregate builds all 192
    zone-map rows (no per-layout rescan; the union-per-layout shape
    would scan the fact 3x); probes are broadcast grids off one
    bounds row; everything downstream is 192 x 8 arithmetic. The
    ranking window runs over 3 rows.

    Reference parity: the reference has no storage at all (its only
    sink is Kafka, main.go:544-651) — this is engine-extension
    machinery for the tables this repo materializes."""
    from kafka_go_streamer_spark.operators.iterate import pinned
    from kafka_go_streamer_spark.plans.fidelity import _md5long

    g = 1 << Z_GRID_BITS
    e = load_table(spark, sf_dir, "events")
    # pinned: bounds feeds the binning crossJoin AND the three probe
    # grids — one column-pruned min/max scan instead of two.
    bounds = pinned(
        e.agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
            F.min("user_id").alias("ulo"),
            F.max("user_id").alias("uhi"),
        )
    )
    binned = (
        e.select(F.unix_micros("ts").alias("us"), "user_id")
        .crossJoin(F.broadcast(bounds))
        .selectExpr(
            "us",
            "user_id",
            f"((us - lo) * {g}) div (hi - lo + 1) AS tb",
            f"((user_id - ulo) * {g}) div (uhi - ulo + 1) AS ub",
            f"((us - lo) * {LAYOUT_FILES}) div (hi - lo + 1) AS tb64",
        )
        .withColumn(
            "ubkt",
            (_md5long(F.col("user_id").cast("string"))
             % LAYOUT_FILES).cast("long"),
        )
    )
    z = F.expr(
        "(tb % 2) + 2 * (ub % 2) + 4 * ((tb div 2) % 2)"
        " + 8 * ((ub div 2) % 2) + 16 * ((tb div 4) % 2)"
        " + 32 * ((ub div 4) % 2)"
    )
    # ONE fact scan: fan each row to its 3 (layout, file) assignments,
    # then a single map-side-combined aggregate builds every layout's
    # zone maps together (vs. the 3-scan union-per-layout shape).
    fan = F.explode(
        F.array(
            F.struct(
                F.lit("time_sorted").alias("layout"),
                F.col("tb64").cast("long").alias("file_id"),
            ),
            F.struct(
                F.lit("zorder").alias("layout"),
                z.cast("long").alias("file_id"),
            ),
            F.struct(
                F.lit("user_bucket").alias("layout"),
                F.col("ubkt").cast("long").alias("file_id"),
            ),
        )
    ).alias("lf")
    # pinned: the <=192-row zone-map frame feeds three probe joins;
    # without the barrier Catalyst re-inlines the full fact scan into
    # each consumer (the re-inline trap, see minhash_lsh_pairs).
    files = pinned(
        binned.select(fan, "us", "user_id")
        .select("lf.layout", "lf.file_id", "us", "user_id")
        .groupBy("layout", "file_id")
        .agg(
            F.min("us").alias("f_tmin"),
            F.max("us").alias("f_tmax"),
            F.min("user_id").alias("f_umin"),
            F.max("user_id").alias("f_umax"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    seq = bounds.select(
        F.explode(F.expr(f"sequence(1, {LAYOUT_N_PROBES})")).alias("i"),
        "lo", "hi", "ulo", "uhi",
    )
    tp = seq.selectExpr(
        f"conv(substring(md5(concat(cast(i as string), 'lt')), 1, 15),"
        f" 16, 10) % {g - 1} AS a",
        "lo", "hi",
    ).selectExpr(
        f"lo + ((hi - lo + 1) * a) div {g} AS p_tlo",
        f"lo + ((hi - lo + 1) * (a + 2)) div {g} - 1 AS p_thi",
    )
    up = seq.selectExpr(
        f"conv(substring(md5(concat(cast(i as string), 'lu')), 1, 15),"
        f" 16, 10) % {LAYOUT_FILES} AS k",
        "ulo", "uhi",
    ).selectExpr(
        f"ulo + ((uhi - ulo + 1) * k) div {LAYOUT_FILES} AS p_u"
    ).selectExpr(
        "p_u",
        f"conv(substring(md5(cast(p_u as string)), 1, 15), 16, 10)"
        f" % {LAYOUT_FILES} AS p_bucket",
    )
    rp = seq.selectExpr(
        f"conv(substring(md5(concat(cast(i as string), 'za')), 1, 15),"
        f" 16, 10) % {g - 1} AS a",
        f"conv(substring(md5(concat(cast(i as string), 'zb')), 1, 15),"
        f" 16, 10) % {g - 1} AS b",
        "lo", "hi", "ulo", "uhi",
    ).selectExpr(
        f"lo + ((hi - lo + 1) * a) div {g} AS p_tlo",
        f"lo + ((hi - lo + 1) * (a + 2)) div {g} - 1 AS p_thi",
        f"ulo + ((uhi - ulo + 1) * b) div {g} AS p_ulo",
        f"ulo + ((uhi - ulo + 1) * (b + 2)) div {g} - 1 AS p_uhi",
    )
    t_hit = (F.col("f_tmin") <= F.col("p_thi")) & (
        F.col("f_tmax") >= F.col("p_tlo")
    )
    p_hit = F.when(
        F.col("layout") == "user_bucket",
        F.col("file_id") == F.col("p_bucket"),
    ).otherwise(
        (F.col("f_umin") <= F.col("p_u"))
        & (F.col("f_umax") >= F.col("p_u"))
    )
    r_hit = (
        t_hit
        & (F.col("f_umin") <= F.col("p_uhi"))
        & (F.col("f_umax") >= F.col("p_ulo"))
    )
    nt = (
        files.crossJoin(F.broadcast(tp))
        .groupBy("layout")
        .agg(F.sum(F.when(t_hit, F.col("cnt")).otherwise(0)).alias("num_t"))
    )
    np_ = (
        files.crossJoin(F.broadcast(up))
        .groupBy("layout")
        .agg(F.sum(F.when(p_hit, F.col("cnt")).otherwise(0)).alias("num_p"))
    )
    nr = (
        files.crossJoin(F.broadcast(rp))
        .groupBy("layout")
        .agg(F.sum(F.when(r_hit, F.col("cnt")).otherwise(0)).alias("num_r"))
    )
    # total rows from the PINNED zone maps (each layout's cnt sums to
    # n by construction) — not another fact scan
    tot = (
        files.filter(F.col("layout") == "time_sorted")
        .agg(F.sum("cnt").alias("n"))
    )
    wnum = (
        F.lit(LAYOUT_W_TIME) * F.col("num_t")
        + F.lit(LAYOUT_W_POINT) * F.col("num_p")
        + F.lit(LAYOUT_W_RECT) * F.col("num_r")
    )
    denom = F.lit(LAYOUT_N_PROBES) * F.col("n")
    # np_/nr are <= 3 rows (one per LAYOUT, never corpus-scaled) —
    # safe, bounded broadcast hints
    return (
        nt.join(F.broadcast(np_), "layout")
        .join(F.broadcast(nr), "layout")
        .crossJoin(F.broadcast(tot))
        .select(
            "layout",
            stable_round(F.col("num_t") * 1.0 / denom, 6).alias(
                "scan_share_time_range"
            ),
            stable_round(F.col("num_p") * 1.0 / denom, 6).alias(
                "scan_share_user_point"
            ),
            stable_round(F.col("num_r") * 1.0 / denom, 6).alias(
                "scan_share_rect"
            ),
            stable_round(
                wnum * 1.0 / (F.lit(LAYOUT_W_SUM) * denom), 6
            ).alias("weighted_scan_share"),
            F.row_number()
            .over(Window.orderBy(wnum.asc(), F.col("layout").asc()))
            .cast("int")
            .alias("cost_rank"),
        )
    )
