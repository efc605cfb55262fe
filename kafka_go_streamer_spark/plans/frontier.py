"""Round-15 frontier wave: operating-point sweeps and storage
economics the earlier families stopped short of.

Each query follows the house discipline: a Spark-first DataFrame plan
(broadcast dims, map-side-combined aggregates, no row-at-a-time UDFs,
TakeOrdered over global sorts), a DuckDB oracle twin computing the
same values by independent construction (same column aliases,
``stable_round``/``round`` before any comparison or binning), and
deterministic integer/6dp arithmetic wherever engines could drift.

Reference relation: the reference engine (a Kafka content router,
main.go:315-377) has none of this machinery; these queries price and
tune the ENGINE's own operators (IVF store, greedy packer, compaction
rewriter, temperature sampler) the way its config prices routing
rules — they are the dashboard a 100 TB operator reads before
committing a knob setting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.sources.tables import load_table

# --------------------------------------------------------------- constants

#: Simulated streaming-sink layout for the compaction costing: one file
#: per (epoch, writer task). The fixture corpus carries no file lineage,
#: so the layout is derived deterministically from doc_id — the shape a
#: 16-writer sink checkpointing every SINK_EPOCH_SPAN docs would leave.
N_SINK_WRITERS = 16
SINK_EPOCH_SPAN = 500

#: Per-row storage overhead (bytes) on top of the text payload —
#: encoding/dictionary/offset cost, the same accounting constant family
#: the multimodal container queries use.
ROW_STORE_OVERHEAD = 64

#: Compaction target file sizes (bytes) to price: 64 KB / 256 KB / 1 MB
#: (test-scale stand-ins for the 128 MB - 1 GB object-store sweet spot;
#: operators/compaction.py DEFAULT_TARGET_BYTES).
COMPACT_TARGET_BYTES = (65536, 262144, 1048576)

#: Packing-shard spans to price (docs per (source, shard) group);
#: brackets the deployed PACK_SHARD_SPAN = 1000.
SPAN_GRID = (250, 1000, 4000)

#: Sampling temperatures to sweep (alpha exponents on source mass);
#: brackets the deployed MIX_ALPHA = 0.7 with the no-flattening anchor.
ALPHA_GRID = (0.5, 0.7, 1.0)


# ------------------------------------------- storage_compaction_economics
def _compaction_sql() -> str:
    blocks = []
    for t in COMPACT_TARGET_BYTES:
        blocks.append(f"""
      SELECT {t} AS target_bytes,
             max(tot.n_files) AS n_files_before,
             max(tot.total_bytes) AS total_bytes,
             ((max(tot.total_bytes) + {t} - 1) // {t})::BIGINT
               AS n_files_after,
             sum(CASE WHEN f.file_bytes < {t} THEN 1 ELSE 0 END)::BIGINT
               AS n_small_before,
             round(max(tot.n_files) * 1.0 /
                   ((max(tot.total_bytes) + {t} - 1) // {t}), 2)
               AS scan_amplification
      FROM files f CROSS JOIN tot""")
    body = "\n      UNION ALL".join(blocks)
    return f"""
    WITH files AS (
      SELECT doc_id // {SINK_EPOCH_SPAN} AS epoch,
             doc_id % {N_SINK_WRITERS} AS writer,
             sum(octet_length(encode(text)) + {ROW_STORE_OVERHEAD})
               AS file_bytes
      FROM documents GROUP BY 1, 2
    ),
    tot AS (
      SELECT count(*)::BIGINT AS n_files,
             sum(file_bytes)::BIGINT AS total_bytes
      FROM files
    )
    {body}
    """


@query("storage_compaction_economics", oracle=_compaction_sql)
def storage_compaction_economics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pricing table for the small-file compactor
    (operators/compaction.py): reconstruct the file layout a
    N_SINK_WRITERS-way streaming sink leaves (one file per
    (epoch, writer), epoch = doc_id div SINK_EPOCH_SPAN), then for
    each candidate target size report the rewrite's before/after file
    counts, how many input files sit under the target (the
    "small-file" population), and the scan amplification the rewrite
    removes (tasks-per-scan before / after — each parquet file costs
    at least one task plus a listing/footer round-trip). This is the
    table that decides whether the rewrite (it costs one full
    read+write of total_bytes) pays for itself.

    Scale: ONE aggregate builds the per-file frame (bounded by
    epochs × writers, metadata-sized — the file-listing a real
    compactor reads from the catalog for free); each target row is an
    aggregate over that tiny frame. Window-free, join-free; nothing
    rescans text."""
    from kafka_go_streamer_spark.operators.iterate import pinned

    d = load_table(spark, sf_dir, "documents")
    # pinned: the per-file frame is epochs x writers rows (metadata-
    # sized) but costs a full corpus scan to build — every target row
    # re-aggregates it, so without the pin Catalyst would re-inline
    # the scan once per target
    files = pinned(
        d.groupBy(
            F.expr(f"doc_id div {SINK_EPOCH_SPAN}").alias("epoch"),
            (F.col("doc_id") % N_SINK_WRITERS).alias("writer"),
        ).agg(
            F.sum(F.octet_length("text") + ROW_STORE_OVERHEAD).alias(
                "file_bytes"
            )
        )
    )
    tot = files.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("file_bytes").cast("long").alias("total_bytes"),
    )
    out = None
    for t in COMPACT_TARGET_BYTES:
        after = F.expr(f"(total_bytes + {t} - 1) div {t}")
        row = (
            files.crossJoin(F.broadcast(tot))
            .agg(
                F.max("n_files").alias("n_files_before"),
                F.max("total_bytes").alias("total_bytes"),
                F.max(after).cast("long").alias("n_files_after"),
                F.sum(
                    F.when(F.col("file_bytes") < t, 1).otherwise(0)
                )
                .cast("long")
                .alias("n_small_before"),
            )
            .select(
                F.lit(t).cast("long").alias("target_bytes"),
                "n_files_before",
                "total_bytes",
                "n_files_after",
                "n_small_before",
                stable_round(
                    F.col("n_files_before")
                    * 1.0
                    / F.col("n_files_after"),
                    2,
                ).alias("scan_amplification"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------- sample_temperature_sweep
def _temperature_sweep_sql() -> str:
    from kafka_go_streamer_spark.plans.training_ops import MIX_TOTAL

    blocks = []
    for a in ALPHA_GRID:
        sw = (
            f"SELECT round(pow(sum(n_chars), {a}), 6) AS w "
            f"FROM documents GROUP BY source"
        )
        blocks.append(f"""
      SELECT {a} AS alpha,
             count(*)::BIGINT AS n_sources,
             sum(greatest(1, floor({MIX_TOTAL} * w / tw)))::BIGINT
               AS sum_quota,
             max(greatest(1, floor({MIX_TOTAL} * w / tw)))::BIGINT
               AS max_quota,
             sum(CASE WHEN floor({MIX_TOTAL} * w / tw) < 1
                      THEN 1 ELSE 0 END)::BIGINT AS n_at_floor,
             round(max(w) / max(tw), 6) AS top_share
      FROM ({sw})
      CROSS JOIN (SELECT sum(w) AS tw FROM ({sw}))""")
    body = "\n      UNION ALL".join(blocks)
    return body


@query("sample_temperature_sweep", oracle=_temperature_sweep_sql)
def sample_temperature_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The temperature knob's operating table: at alpha ∈ ALPHA_GRID
    (alpha = 1 is natural sampling, lower flattens), the per-source
    quota allocation the ``sample_temperature_mixture`` sampler would
    commit — total and max quota, how many sources only survive via
    the floor-of-1 guarantee, and the biggest source's mass share.
    Reading this row-by-row is how the canonical 0.7 gets justified
    (or overridden) for a given corpus instead of cargo-culted.

    Scale: one source-cardinality aggregate feeds every alpha (the
    weights are per-source scalars); each sweep row is arithmetic on
    that broadcast frame. Same 6dp-rounded pow() discipline as the
    deployed sampler — an unrounded weight an ulp from a quota
    boundary would flip integer quotas between engines."""
    from kafka_go_streamer_spark.operators.iterate import pinned
    from kafka_go_streamer_spark.plans.training_ops import MIX_TOTAL

    d = load_table(spark, sf_dir, "documents")
    # pinned: source-cardinality frame, one corpus scan shared by all
    # alpha rows instead of re-inlined per row
    mass = pinned(
        d.groupBy("source").agg(F.sum("n_chars").alias("n_chars"))
    )
    out = None
    for a in ALPHA_GRID:
        sw = mass.select(
            stable_round(F.pow(F.col("n_chars"), F.lit(a)), 6).alias("w")
        )
        tot = sw.agg(F.sum("w").alias("tw"))
        raw = F.floor(F.lit(MIX_TOTAL) * F.col("w") / F.col("tw"))
        quota = F.greatest(F.lit(1), raw)
        row = (
            sw.crossJoin(F.broadcast(tot))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_sources"),
                F.sum(quota).cast("long").alias("sum_quota"),
                F.max(quota).cast("long").alias("max_quota"),
                F.sum(F.when(raw < 1, 1).otherwise(0))
                .cast("long")
                .alias("n_at_floor"),
                stable_round(F.max("w") / F.max("tw"), 6).alias(
                    "top_share"
                ),
            )
            .select(
                F.lit(a).alias("alpha"),
                "n_sources",
                "sum_quota",
                "max_quota",
                "n_at_floor",
                "top_share",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# ------------------------------------------ embedding_norm_profile_by_label
@query(
    "embedding_norm_profile_by_label",
    oracle="""
    WITH n AS (
      SELECT label,
             round(sqrt(list_dot_product(
               embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS nrm,
             len(embedding) AS dims
      FROM embeddings
    )
    SELECT label,
           count(*)::BIGINT AS n_vecs,
           max(dims)::INTEGER AS dims,
           round(avg(nrm), 6) AS mean_norm,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY nrm), 6)
             AS p50_norm,
           round(min(nrm), 6) AS min_norm,
           round(max(nrm), 6) AS max_norm
    FROM n GROUP BY 1
    """,
)
def embedding_norm_profile_by_label(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-norm health profile per label: count, dimensionality,
    and the norm distribution's mean/median/extremes. The drift
    detector every embedding pipeline needs — a model swap or a
    truncated-write bug shows up as a norm-scale shift or a near-zero
    tail long before retrieval quality metrics move, and per-label
    slicing localizes which partition of the corpus went bad.

    Scale: the norm is a JVM-side higher-order fold (functions/
    vectors.py — no UDF, pipelines inside codegen with the scan); one
    map-side-combinable aggregate onto the label domain. Norms are
    rounded at 6dp BEFORE the percentile so both engines interpolate
    identical quanta."""
    from kafka_go_streamer_spark.functions.vectors import norm

    e = load_table(spark, sf_dir, "embeddings")
    n = e.select(
        "label",
        stable_round(norm(F.col("embedding")), 6).alias("nrm"),
        F.size("embedding").alias("dims"),
    )
    return n.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.max("dims").cast("int").alias("dims"),
        stable_round(F.avg("nrm"), 6).alias("mean_norm"),
        stable_round(F.percentile("nrm", F.lit(0.5)), 6).alias(
            "p50_norm"
        ),
        stable_round(F.min("nrm"), 6).alias("min_norm"),
        stable_round(F.max("nrm"), 6).alias("max_norm"),
    )


# ---------------------------------------------- ann_ivf_operating_surface

#: The joint grid: every (nlist, nprobe) with nprobe <= nlist.
#: ``ann_nlist_tradeoff`` fixes nprobe=1 and sweeps nlist;
#: ``ann_nprobe_recall_curve`` fixes the partitioning and sweeps
#: nprobe; this is their product — the actual operating surface.
def _ivf_surface_pairs() -> tuple:
    from kafka_go_streamer_spark.plans.corpus_ops import NPROBE_SWEEP
    from kafka_go_streamer_spark.plans.fidelity import NLIST_GRID

    return tuple(
        (nl, np_)
        for nl in NLIST_GRID
        for np_ in NPROBE_SWEEP
        if np_ <= nl
    )


def _ivf_surface_sql() -> str:
    from kafka_go_streamer_spark.functions.vectors import cosine_sql
    from kafka_go_streamer_spark.plans.fidelity import NLIST_GRID
    from kafka_go_streamer_spark.plans.similarity import PANEL_MAX_ID

    ctes = []
    for nl in NLIST_GRID:
        cent_ids = ", ".join(str(i) for i in range(1, nl + 1))
        ctes.append(f"""
    cents{nl} AS (
      SELECT vec_id AS cent_id, embedding AS cv
      FROM embeddings WHERE vec_id IN ({cent_ids})
    ),
    asg{nl} AS (
      SELECT vec_id, cent_id AS cell FROM (
        SELECT e.vec_id, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY round({cosine_sql('e.embedding', 'c.cv')}, 6)
                   DESC, c.cent_id ASC) AS rn
        FROM embeddings e CROSS JOIN cents{nl} c
      ) WHERE rn = 1
    ),
    cn{nl} AS (SELECT cell, count(*) AS cell_n FROM asg{nl} GROUP BY 1),
    qc{nl} AS (
      SELECT q.q_id, c.cent_id,
             row_number() OVER (PARTITION BY q.q_id
               ORDER BY round({cosine_sql('q.qv', 'c.cv')}, 6)
                 DESC, c.cent_id ASC) AS crank
      FROM qs q CROSS JOIN cents{nl} c
    )""")
    for nl, np_ in _ivf_surface_pairs():
        s = f"{nl}_{np_}"
        ctes.append(f"""
    top{s} AS (
      SELECT q_id, vec_id FROM (
        SELECT r.q_id, r.vec_id,
               row_number() OVER (PARTITION BY r.q_id
                 ORDER BY r.sim DESC, r.vec_id ASC) AS rn
        FROM scored r
        JOIN asg{nl} a ON a.vec_id = r.vec_id
        JOIN qc{nl} qc ON qc.q_id = r.q_id AND qc.cent_id = a.cell
                      AND qc.crank <= {np_}
      ) WHERE rn <= 10
    ),
    scan{s} AS (
      SELECT qc.q_id, sum(cn.cell_n) AS scanned
      FROM qc{nl} qc JOIN cn{nl} cn ON cn.cell = qc.cent_id
      WHERE qc.crank <= {np_} GROUP BY 1
    ),
    pq{s} AS (
      SELECT t.q_id,
             sum(CASE WHEN g.vec_id IS NOT NULL THEN 1 ELSE 0 END)
               / 10.0 AS recall
      FROM top{s} t
      LEFT JOIN gt g ON g.q_id = t.q_id AND g.vec_id = t.vec_id
      GROUP BY 1
    )""")
    body = "\n    UNION ALL".join(
        f"""
      SELECT {nl} AS nlist, {np_} AS nprobe,
             count(*)::BIGINT AS n_queries,
             round(avg(p.recall), 4) AS mean_recall_at_10,
             round(avg(s.scanned * 1.0 / nn.nn), 6) AS mean_scan_share
      FROM pq{nl}_{np_} p
      JOIN scan{nl}_{np_} s ON s.q_id = p.q_id
      CROSS JOIN (SELECT count(*) AS nn FROM embeddings) nn
      GROUP BY 1, 2"""
        for nl, np_ in _ivf_surface_pairs()
    )
    cte_body = ",".join(ctes)
    return f"""
    WITH qs AS (
      SELECT vec_id AS q_id, embedding AS qv
      FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < {PANEL_MAX_ID}
    ),
    scored AS (
      SELECT q.q_id, e.vec_id,
             round({cosine_sql('e.embedding', 'q.qv')}, 6) AS sim
      FROM embeddings e CROSS JOIN qs q
      WHERE e.vec_id <> q.q_id
    ),
    gt AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY sim DESC, vec_id ASC) AS rn
        FROM scored) WHERE rn <= 10
    ),{cte_body}
    {body}
    """


@query("ann_ivf_operating_surface", oracle=_ivf_surface_sql)
def ann_ivf_operating_surface(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The IVF index's full operating surface: recall@10 and scan
    share at every (nlist, nprobe) with nprobe ≤ nlist —
    ``ann_nlist_tradeoff`` (nprobe fixed at 1) ×
    ``ann_nprobe_recall_curve`` (partitioning fixed) joined into the
    one table an index build actually reads to pick its operating
    point. Probing is the real IVF rule: cells ranked by
    query-to-centroid similarity, top nprobe scanned; nprobe = nlist
    rows pin the exhaustive anchors (recall 1.0, scan share 1.0) by
    construction.

    Scale: panel ground truth and the query×corpus scores are
    computed ONCE and pinned (fixed panel, PANEL_MAX_ID hubness-cap
    discipline); per nlist the corpus-side assignment is a broadcast
    corpus × nlist cosine pass (also pinned, shared by that column's
    nprobe rows); per grid cell only the panel-sized candidate frame
    is re-ranked. The query-to-centroid rank frame is panel × nlist —
    broadcast everywhere it joins."""
    from kafka_go_streamer_spark.functions.vectors import cosine
    from kafka_go_streamer_spark.operators.iterate import pinned
    from kafka_go_streamer_spark.plans.fidelity import NLIST_GRID
    from kafka_go_streamer_spark.plans.similarity import PANEL_MAX_ID
    from kafka_go_streamer_spark.sources.tables import fan_out

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < PANEL_MAX_ID)
    ).select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    scored = pinned(
        fan_out(emb)
        .crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            stable_round(
                cosine(F.col("embedding"), F.col("qv")), 6
            ).alias("sim"),
        )
    )
    wq = Window.partitionBy("q_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    gt = (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 10)
        .select(F.col("q_id").alias("gq_id"), F.col("vec_id").alias("gt_id"))
    )
    tot = emb.agg(F.count(F.lit(1)).alias("nn"))
    out = None
    for nl in NLIST_GRID:
        cents = emb.filter(F.col("vec_id").isin(*range(1, nl + 1))).select(
            F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv")
        )
        assign = pinned(
            fan_out(emb)
            .crossJoin(F.broadcast(cents))
            .select(
                "vec_id",
                "cent_id",
                stable_round(
                    cosine(F.col("embedding"), F.col("cv")), 6
                ).alias("sim_c"),
            )
            .groupBy("vec_id")
            .agg(
                F.max_by(
                    "cent_id", F.struct(F.col("sim_c"), -F.col("cent_id"))
                ).alias("cell")
            )
        )
        cell_n = (
            assign.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("cell_n"))
            .withColumnRenamed("cell", "cn_cell")
        )
        wc = Window.partitionBy("pq_id").orderBy(
            F.col("sim_qc").desc(), F.col("pcell").asc()
        )
        # renamed keys throughout: qc shares lineage with scored/assign
        # (all descend from emb), so unaliased q_id/cell joins would
        # resolve to one attribute (the r14 KLL-curve trap)
        qc = (
            qs.crossJoin(F.broadcast(cents))
            .select(
                F.col("q_id").alias("pq_id"),
                F.col("cent_id").alias("pcell"),
                stable_round(
                    cosine(F.col("qv"), F.col("cv")), 6
                ).alias("sim_qc"),
            )
            .withColumn("crank", F.row_number().over(wc))
        )
        for np_ in [p for (n, p) in _ivf_surface_pairs() if n == nl]:
            probed = qc.filter(F.col("crank") <= np_).select(
                "pq_id", "pcell"
            )
            retrieved = (
                scored.join(assign, "vec_id")
                .join(
                    F.broadcast(probed),
                    (F.col("q_id") == F.col("pq_id"))
                    & (F.col("cell") == F.col("pcell")),
                )
                .withColumn("rn", F.row_number().over(wq))
                .filter(F.col("rn") <= 10)
            )
            perq = (
                retrieved.join(
                    gt,
                    (F.col("q_id") == F.col("gq_id"))
                    & (F.col("vec_id") == F.col("gt_id")),
                    "left",
                )
                .groupBy("q_id")
                .agg(
                    (
                        F.sum(
                            F.when(F.col("gt_id").isNotNull(), 1).otherwise(
                                0
                            )
                        )
                        / 10.0
                    ).alias("recall")
                )
            )
            scan = probed.join(
                F.broadcast(cell_n), F.col("pcell") == F.col("cn_cell")
            ).groupBy("pq_id").agg(F.sum("cell_n").alias("scanned"))
            row = (
                perq.join(scan, F.col("q_id") == F.col("pq_id"))
                .crossJoin(F.broadcast(tot))
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_queries"),
                    stable_round(F.avg("recall"), 4).alias(
                        "mean_recall_at_10"
                    ),
                    stable_round(
                        F.avg(F.col("scanned") * 1.0 / F.col("nn")), 6
                    ).alias("mean_scan_share"),
                )
                .select(
                    F.lit(nl).cast("int").alias("nlist"),
                    F.lit(np_).cast("int").alias("nprobe"),
                    "n_queries",
                    "mean_recall_at_10",
                    "mean_scan_share",
                )
            )
            out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------- pack_shard_span_sensitivity
def _span_sensitivity_sql() -> str:
    from kafka_go_streamer_spark.functions import text as X
    from kafka_go_streamer_spark.plans.training_ops import PACK_CAP

    blocks = []
    fans = []
    for span in SPAN_GRID:
        blocks.append(f"""
    toks{span} AS (
      SELECT doc_id, source, doc_id // {span} AS shard,
             {X.token_count_sql('text')} AS n_tokens,
             row_number() OVER (
               PARTITION BY source, doc_id // {span}
               ORDER BY doc_id) AS rn
      FROM documents
    ),
    packed{span} AS (
      SELECT doc_id, source, shard, n_tokens, rn,
             0 AS seq_id, n_tokens AS fill
      FROM toks{span} WHERE rn = 1
      UNION ALL
      SELECT t.doc_id, t.source, t.shard, t.n_tokens, t.rn,
             CASE WHEN p.fill + t.n_tokens <= {PACK_CAP}
                  THEN p.seq_id ELSE p.seq_id + 1 END,
             CASE WHEN p.fill + t.n_tokens <= {PACK_CAP}
                  THEN p.fill + t.n_tokens ELSE t.n_tokens END
      FROM packed{span} p
      JOIN toks{span} t ON t.source = p.source AND t.shard = p.shard
                       AND t.rn = p.rn + 1
    ),
    seqs{span} AS (
      SELECT source, shard, seq_id,
             sum(n_tokens) AS real_toks, count(*) AS n_docs
      FROM packed{span} GROUP BY 1, 2, 3
    )""")
        fans.append(f"""
      SELECT {span} AS shard_span,
             (SELECT count(*) FROM (
                SELECT DISTINCT source, shard FROM seqs{span}))::BIGINT
               AS n_groups,
             count(*)::BIGINT AS n_sequences,
             sum(real_toks)::BIGINT AS real_tokens,
             sum(CASE WHEN real_toks <= {PACK_CAP}
                      THEN {PACK_CAP} - real_toks ELSE 0 END)::BIGINT
               AS pad_tokens,
             round(sum(CASE WHEN real_toks <= {PACK_CAP}
                            THEN {PACK_CAP} - real_toks ELSE 0 END) * 1.0
                   / (count(*) * {PACK_CAP}), 6) AS pad_share,
             round(sum(n_docs) * 1.0 / count(*), 4) AS mean_docs_per_seq
      FROM seqs{span}""")
    ctes = ",".join(blocks)
    body = "\n      UNION ALL".join(fans)
    return f"""
    WITH RECURSIVE {ctes.lstrip().lstrip(',')}
    {body}
    """


@query("pack_shard_span_sensitivity", oracle=_span_sensitivity_sql)
def pack_shard_span_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """What the packing-shard span actually costs: the SAME greedy
    fold at shard spans bracketing the deployed PACK_SHARD_SPAN. The
    span is the parallelism/memory knob — smaller shards mean more,
    smaller groups (better balance, harder per-group overhead) but
    each shard boundary strands one under-filled sequence, so
    pad_share decays toward the single-shard optimum as the span
    grows. This table prices that trade alongside
    ``pack_cap_sweep``'s cap axis: together they justify (or move)
    both deployed constants.

    Scale: each span is one group-batched fold (``fold_packed`` — one
    hash exchange, groups dispatched through a per-partition pandas
    groupby) over (id, source, tokens) triples; token counting stays
    JVM-side; everything after is a seqs-frame aggregate. The oracle
    replays all three folds as recursive CTEs."""
    from kafka_go_streamer_spark.functions import text as X
    from kafka_go_streamer_spark.operators.iterate import pinned
    from kafka_go_streamer_spark.plans.training_ops import (
        PACK_CAP,
        fold_packed,
    )

    # pinned: the (id, source, tokens) triples are span-independent —
    # count tokens ONCE and share the narrow frame across all three
    # folds instead of re-running the regex scan per span
    d = pinned(
        load_table(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            X.token_count(F.col("text")).alias("n_tokens"),
        )
    )
    out = None
    for span in SPAN_GRID:
        sharded = d.withColumn("shard", F.expr(f"doc_id div {span}"))
        packed = fold_packed(sharded)
        seqs = packed.groupBy("source", "shard", "seq_id").agg(
            F.sum("n_tokens").alias("real_toks"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        pad = F.when(
            F.col("real_toks") <= PACK_CAP,
            F.lit(PACK_CAP) - F.col("real_toks"),
        ).otherwise(0)
        row = seqs.agg(
            F.countDistinct("source", "shard").cast("long").alias(
                "n_groups"
            ),
            F.count(F.lit(1)).cast("long").alias("n_sequences"),
            F.sum("real_toks").cast("long").alias("real_tokens"),
            F.sum(pad).cast("long").alias("pad_tokens"),
            stable_round(
                F.sum(pad) * 1.0 / (F.count(F.lit(1)) * PACK_CAP), 6
            ).alias("pad_share"),
            stable_round(
                F.sum("n_docs") * 1.0 / F.count(F.lit(1)), 4
            ).alias("mean_docs_per_seq"),
        ).select(
            F.lit(span).cast("long").alias("shard_span"),
            "n_groups",
            "n_sequences",
            "real_tokens",
            "pad_tokens",
            "pad_share",
            "mean_docs_per_seq",
        )
        out = row if out is None else out.unionByName(row)
    return out
