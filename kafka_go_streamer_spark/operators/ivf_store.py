"""Materialized IVF index: the offline-training / online-probe split.

``ann_ivf_search_trained`` (plans/scale_ops.py) trains its Lloyd
centroids inline so the whole path stays oracle-checkable in one
statement — but its docstring promises what production actually does:
train ONCE offline, persist the index, and serve probes against the
artifact. This module is that artifact:

* ``build_ivf_index`` — OFFLINE: k = ceil(sqrt(n)) centroids from full
  Lloyd iterations (operators/kmeans.py primitives), persisted as

  - ``{base}/centroids`` — the trained quantizer, (cid, pos, c) long
    form, k x dims rows (tiny: ~1M x 64 even at 10^12 vectors);
  - ``{base}/vectors``  — the corpus + its cell assignment, parquet
    PARTITIONED BY cell, so a probe's I/O is pruned to the probed
    cells' directories and never scans the other ~k-1/k of the data.

* ``probe_ivf_index`` — ONLINE: score the k centroids against the
  query (a k-row job — no corpus touch), take the top ``nprobe``
  cells, and join them broadcast against the partitioned store.
  The cell ids stay INSIDE the plan (no driver collect): Spark's
  dynamic partition pruning turns the broadcast join on the partition
  column into runtime partition filters, which
  tests/test_ivf_store.py asserts on the physical plan.

The reference engine has no persistent state at all (its only sink is
Kafka, SURVEY.md §2.1 #11); this is storage-level machinery for the
north-star ANN family, verified by test equality against the inline
trained-search construction rather than a DuckDB twin (writes are not
queries).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.functions.vectors import (
    cosine as vec_cosine,
    norm as vec_norm,
)
from kafka_go_streamer_spark.operators.kmeans import (
    assign_nearest,
    explode_vectors,
    seed_centroids,
    update_centroids,
)


def centroids_path(base: str) -> str:
    return os.path.join(base, "centroids")


def vectors_path(base: str) -> str:
    return os.path.join(base, "vectors")


def default_index_base(sf_dir: str) -> str:
    """Deterministic per-corpus index location: one directory per source
    sf_dir under ``$SPARK_GRAFT_IVF_DIR`` (default: a tmp-dir cache).
    This is where the registered store-probe query persists its build so
    repeated probes — the online path — never pay training again."""
    root = os.environ.get("SPARK_GRAFT_IVF_DIR") or os.path.join(
        tempfile.gettempdir(), "kgs_ivf_store"
    )
    key = os.path.abspath(sf_dir).strip(os.sep).replace(os.sep, "_")
    return os.path.join(root, key)


def _source_fingerprint(sf_dir: str) -> dict:
    """Size+mtime of the embeddings fixture — enough to notice the
    driver regenerating testdata under an unchanged path."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(path)
        return {"size": st.st_size, "mtime": int(st.st_mtime)}
    except OSError:
        return {"size": -1, "mtime": -1}


def _ensure_cached(base: str, fp: dict, build) -> str:
    """The shared build-once protocol: if both artifacts carry
    ``_SUCCESS`` and the fingerprint sidecar matches ``fp``, the call
    is a pure read; otherwise run ``build()`` (which must overwrite
    both artifacts from scratch — a crash mid-build leaves no valid
    marker, so the next call rebuilds cleanly) and stamp the marker."""
    marker = os.path.join(base, "_fingerprint.json")
    done = all(
        os.path.exists(os.path.join(p, "_SUCCESS"))
        for p in (centroids_path(base), vectors_path(base))
    )
    if done and os.path.exists(marker):
        try:
            if json.load(open(marker)) == fp:
                return base
        except (OSError, ValueError):
            pass
    build()
    os.makedirs(base, exist_ok=True)
    with open(marker, "w") as f:
        json.dump(fp, f)
    return base


def ensure_ivf_index(
    emb: DataFrame, sf_dir: str, iters: int = 2, k: int | None = None
) -> str:
    """Build the IVF index for ``sf_dir`` exactly once (offline step),
    returning its base path. A fingerprint sidecar invalidates the cache
    if the source fixture changes; otherwise every later call is a pure
    read — the offline-train / online-probe split at the API level.
    The fingerprint covers the BUILD PARAMETERS too, not just the
    source fixture — otherwise a later call with different iters/k
    silently reuses the index trained under the old parameters."""
    base = default_index_base(sf_dir)
    fp = {**_source_fingerprint(sf_dir), "iters": iters, "k": k}
    return _ensure_cached(
        base, fp, lambda: build_ivf_index(emb, base, iters=iters, k=k)
    )


def ensure_ivf_index_with_append(
    emb: DataFrame,
    new_emb: DataFrame,
    sf_dir: str,
    *,
    tag: str = "append",
    iters: int = 2,
    k: int | None = None,
) -> str:
    """Build an index from ``emb`` and fold ``new_emb`` in through the
    INCREMENTAL path (``append_to_ivf_index``) exactly once, returning
    the base path — the ledger-facing twin of the offline-build /
    online-append split, on the same ``_ensure_cached`` protocol (a
    crash between build and append leaves no valid marker, so the next
    call rebuilds from scratch and can never double-append).

    ``emb`` is usually a holdout-filtered SUBSET of the corpus, whose
    id space has holes below k; seeding the quantizer from raw
    ``vec_id < k`` there would silently yield fewer than k cells
    (operators/kmeans.py seed_centroids' documented precondition), so
    training runs on a densely RE-KEYED view (row_number over vec_id)
    while the stored vectors keep their original ids — centroid cids
    are just labels."""

    def build() -> None:
        from pyspark.sql import Window

        train = emb.withColumn(
            "vec_id",
            F.row_number().over(Window.orderBy("vec_id")) - 1,
        )
        build_ivf_index(emb, base, iters=iters, k=k, train_emb=train)
        append_to_ivf_index(new_emb.sparkSession, base, new_emb)

    base = default_index_base(sf_dir) + "_" + tag
    fp = {
        **_source_fingerprint(sf_dir),
        "iters": iters,
        "k": k,
        "tag": tag,
        "train": "rekeyed",
    }
    return _ensure_cached(base, fp, build)


def train_centroids(
    emb: DataFrame, iters: int = 2, k: int | None = None
) -> DataFrame:
    """Trained centroid table (cid, pos, c) after ``iters`` full Lloyd
    rounds; k defaults to ceil(sqrt(n)) inside the plan (no action)."""
    k_df = (
        emb.agg(F.ceil(F.sqrt(F.count(F.lit(1)))).alias("_k"))
        if k is None
        else None
    )
    ex = explode_vectors(emb).localCheckpoint(eager=True)
    cents = seed_centroids(ex, k, k_df=k_df)
    for _ in range(iters):
        cents = update_centroids(ex, assign_nearest(ex, cents))
    return cents


def build_ivf_index(
    emb: DataFrame,
    base: str,
    iters: int = 2,
    k: int | None = None,
    train_emb: DataFrame | None = None,
) -> None:
    """OFFLINE: train the quantizer and persist the two index artifacts
    (see module docstring). The vectors table is written partitioned by
    cell — the write shuffles once on the assignment, and every later
    probe prunes to its cells' files. ``train_emb`` optionally
    substitutes the TRAINING view (e.g. a densely re-keyed copy when
    ``emb``'s id space has holes below k — seeding draws from
    ``vec_id < k``); the stored vectors always come from ``emb``."""
    cents = train_centroids(
        emb if train_emb is None else train_emb, iters=iters, k=k
    )
    cents.write.mode("overwrite").parquet(centroids_path(base))
    ex = explode_vectors(emb)
    assigned = assign_nearest(ex, cents).select(
        "vec_id", F.col("cid").alias("cell")
    )
    (
        emb.join(assigned, "vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(vectors_path(base))
    )


def append_to_ivf_index(
    spark: SparkSession, base: str, new_emb: DataFrame
) -> None:
    """INCREMENTAL: fold new vectors into an existing index WITHOUT
    retraining — assign each new vector to its nearest STORED centroid
    and append into the cell-partitioned vectors table. This is the
    index-maintenance half of the offline/online split: the quantizer
    is retrained on the offline cadence (build_ivf_index), while fresh
    corpus arrivals stream in between retrains through this path, each
    append touching only the cell directories its vectors land in.

    Cost per append: |new| x k assignment work against the broadcast
    centroid table + one partitioned write of |new| rows — independent
    of the resident index size. Probes see appended vectors
    immediately (the partition listing picks up the new files); cell
    balance degrades only as far as the data drifts from the trained
    quantizer, which is the usual signal to schedule a retrain."""
    cents = spark.read.parquet(centroids_path(base))
    ex = explode_vectors(new_emb)
    assigned = assign_nearest(ex, cents).select(
        "vec_id", F.col("cid").alias("cell")
    )
    (
        new_emb.join(assigned, "vec_id")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(vectors_path(base))
    )


def _query_long(spark: SparkSession, qv: list[float]) -> DataFrame:
    """(pos, qv) long form of the query vector — a k-free tiny frame."""
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(qv)], "pos int, q double"
    )


def probe_ivf_index(
    spark: SparkSession,
    base: str,
    qv: list[float],
    nprobe: int = 2,
    topk: int = 5,
    exclude_id: int | None = None,
    min_cell_sim: float = -1.0,
) -> DataFrame:
    """ONLINE probe against a persisted index: rank the k stored
    centroids by cosine to ``qv`` (k-row work), then broadcast the top
    ``nprobe`` cell ids into the partitioned vectors table — dynamic
    partition pruning keeps the scan to those cells — and return the
    cosine top-k within them. No driver-side collect anywhere; the
    probed cell set lives inside the plan.

    ``min_cell_sim`` floors the centroid cosine a cell must clear to be
    probed (skip cells pointing away from the query even when nprobe
    would allow them). It doubles as the selective predicate Spark's
    DynamicPartitionPruning rule requires on the build side — without
    it the probe would scan every cell directory despite the join."""
    q = _query_long(spark, qv)
    q_norm = float(sum(v * v for v in qv)) ** 0.5
    if q_norm == 0.0:
        raise ValueError("probe_ivf_index: zero-norm query vector")

    cents = spark.read.parquet(centroids_path(base))
    scored = (
        cents.join(F.broadcast(q), "pos")
        .groupBy("cid")
        .agg(
            F.sum(F.col("c") * F.col("q")).alias("dot"),
            F.sum(F.col("c") * F.col("c")).alias("cc"),
        )
        .select(
            "cid",
            stable_round(
                F.col("dot") / (F.sqrt("cc") * F.lit(q_norm)), 6
            ).alias("qsim"),
        )
    )
    top_cells = (
        scored.filter(F.col("qsim") > F.lit(min_cell_sim))
        .orderBy(F.col("qsim").desc(), F.col("cid").asc())
        .limit(nprobe)
        .select(F.col("cid").alias("cell"))
    )

    vecs = spark.read.parquet(vectors_path(base))
    if exclude_id is not None:
        vecs = vecs.filter(F.col("vec_id") != exclude_id)
    qv_arr = F.array(*[F.lit(float(v)) for v in qv])
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            qv_arr,
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vnorm = F.sqrt(
        F.aggregate(
            F.col("embedding").cast("array<double>"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    # zero-norm stored vectors would score NaN (which Spark sorts above
    # every double) — drop them before the cosine instead of letting a
    # degenerate vector outrank every real match
    from pyspark.sql import Window

    cand = (
        vecs.join(F.broadcast(top_cells), "cell")
        .filter(vnorm > 0)
        .select(
            "vec_id",
            "cell",
            stable_round(dot / (vnorm * F.lit(q_norm)), 6).alias("cos_sim"),
        )
    )
    # serve-side dedup by vec_id: the streaming ingest path is
    # at-least-once, so a replayed micro-batch can leave the same
    # vector in the store twice — keep each vec_id's best-scoring row
    # so replays never surface duplicate ids in the top-k
    dw = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("cell").asc()
    )
    return (
        cand.withColumn("_dd", F.row_number().over(dw))
        .filter(F.col("_dd") == 1)
        .drop("_dd")
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(topk)
    )


def probe_ivf_store(
    spark: SparkSession,
    base: str,
    q_emb: DataFrame,
    nprobe: int = 2,
    topk: int = 5,
    exclude_id: int | None = None,
    min_cell_sim: float = -1.0,
    pool=None,
) -> DataFrame:
    """In-plan variant of :func:`probe_ivf_index`: the query vector is a
    ONE-ROW DataFrame with a single array column ``qv`` (e.g. selected
    out of the corpus, or parallelize'd from a client request), so the
    whole probe — centroid ranking, cell selection, in-cell scoring —
    stays inside one Spark plan with no driver-side collect at all.

    Same physical shape as the literal path: centroid ranking is k-row
    work against the broadcast exploded query; the top-``nprobe`` cell
    ids broadcast into the cell-PARTITIONED vectors table where dynamic
    partition pruning bounds the scan (tests/test_ivf_store.py asserts
    ``dynamicpruning`` on this plan too); top-k compiles to
    TakeOrderedAndProject. Zero-norm stored vectors are dropped before
    the cosine (NaN would sort above every real score)."""
    q_long = q_emb.select(
        F.posexplode(F.col("qv").cast("array<double>")).alias("pos", "q")
    )
    qn = q_long.agg(F.sqrt(F.sum(F.col("q") * F.col("q"))).alias("qn"))

    cents = spark.read.parquet(centroids_path(base))
    scored = (
        cents.join(F.broadcast(q_long), "pos")
        .groupBy("cid")
        .agg(
            F.sum(F.col("c") * F.col("q")).alias("dot"),
            F.sum(F.col("c") * F.col("c")).alias("cc"),
        )
        .crossJoin(F.broadcast(qn))
        .select(
            "cid",
            stable_round(
                F.col("dot") / (F.sqrt("cc") * F.col("qn")), 6
            ).alias("qsim"),
        )
    )
    top_cells = (
        scored.filter(F.col("qsim") > F.lit(min_cell_sim))
        .orderBy(F.col("qsim").desc(), F.col("cid").asc())
        .limit(nprobe)
        .select(F.col("cid").alias("cell"))
    )

    vecs = spark.read.parquet(vectors_path(base))
    if exclude_id is not None:
        vecs = vecs.filter(F.col("vec_id") != exclude_id)
    if pool is not None:
        # restrict the CANDIDATE pool (e.g. appended-only) — the cell
        # ranking above still runs over the full stored quantizer
        vecs = vecs.filter(pool)
    from pyspark.sql import Window

    cand = (
        vecs.join(F.broadcast(top_cells), "cell")
        .crossJoin(F.broadcast(q_emb.select("qv")))
        .filter(vec_norm(F.col("embedding")) > 0)
        .select(
            "vec_id",
            "cell",
            stable_round(
                vec_cosine(F.col("embedding"), F.col("qv")), 6
            ).alias("cos_sim"),
        )
    )
    # same replay-defense dedup as probe_ivf_index (see comment there)
    dw = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("cell").asc()
    )
    return (
        cand.withColumn("_dd", F.row_number().over(dw))
        .filter(F.col("_dd") == 1)
        .drop("_dd")
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(topk)
    )


def probe_ivf_index_many(
    spark: SparkSession,
    base: str,
    q_df: DataFrame,
    nprobe: int = 2,
    topk: int = 5,
    min_cell_sim: float = -1.0,
) -> DataFrame:
    """Batched multi-query probe against a persisted index: ``q_df`` is
    (q_id, qv) — a whole panel of query vectors scored in ONE plan.
    Centroid ranking is k x |Q| rows (a per-q_id window picks each
    query's top-``nprobe`` cells); the (q_id, cell) pairs broadcast
    into the cell-partitioned store; the final per-query top-k is a
    window over candidates only. This is the serving-path shape: the
    per-batch cost is |Q| x (k + nprobe cells), never the corpus.

    Zero-norm queries produce no output rows (their centroid cosine is
    NULL-division-guarded out); zero-norm stored vectors are dropped
    before scoring, as in the single-query probe."""
    from pyspark.sql import Window

    q_long = q_df.select(
        "q_id",
        F.posexplode(F.col("qv").cast("array<double>")).alias("pos", "q"),
    )
    qn = q_long.groupBy("q_id").agg(
        F.sqrt(F.sum(F.col("q") * F.col("q"))).alias("qn")
    )

    cents = spark.read.parquet(centroids_path(base))
    scored = (
        cents.join(F.broadcast(q_long), "pos")
        .groupBy("q_id", "cid")
        .agg(
            F.sum(F.col("c") * F.col("q")).alias("dot"),
            F.sum(F.col("c") * F.col("c")).alias("cc"),
        )
        .join(F.broadcast(qn.filter(F.col("qn") > 0)), "q_id")
        .select(
            "q_id",
            "cid",
            stable_round(
                F.col("dot") / (F.sqrt("cc") * F.col("qn")), 6
            ).alias("qsim"),
        )
    )
    cw = Window.partitionBy("q_id").orderBy(
        F.col("qsim").desc(), F.col("cid").asc()
    )
    top_cells = (
        scored.filter(F.col("qsim") > F.lit(min_cell_sim))
        .withColumn("_rk", F.row_number().over(cw))
        .filter(F.col("_rk") <= nprobe)
        .select("q_id", F.col("cid").alias("cell"))
    )

    vecs = spark.read.parquet(vectors_path(base))
    cand = (
        vecs.join(F.broadcast(top_cells), "cell")
        .join(F.broadcast(q_df), "q_id")
        .filter(vec_norm(F.col("embedding")) > 0)
        .select(
            "q_id",
            "vec_id",
            "cell",
            stable_round(
                vec_cosine(F.col("embedding"), F.col("qv")), 6
            ).alias("cos_sim"),
        )
    )
    # replay-defense dedup by (q_id, vec_id) before ranking (see
    # probe_ivf_index): at-least-once ingest can duplicate a vector
    ddw = Window.partitionBy("q_id", "vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("cell").asc()
    )
    cand = (
        cand.withColumn("_dd", F.row_number().over(ddw))
        .filter(F.col("_dd") == 1)
        .drop("_dd")
    )
    kw = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("_rk", F.row_number().over(kw))
        .filter(F.col("_rk") <= topk)
        .select("q_id", "vec_id", "cell", "cos_sim", F.col("_rk").alias("rk"))
    )
