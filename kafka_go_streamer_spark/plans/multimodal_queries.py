"""Multimodal pipeline queries: binary-column plumbing with a REAL
header decode (see ``multimodal.py``): payloads are structurally-valid
PNG/JPEG/GIF containers synthesized from document text, and the Spark
side parses them back — magic bytes, chunk/segment walk, CRC check,
endian-correct dimension unpack — through mapInPandas/Arrow. The oracle
predicts what the parse MUST find from the generator's arithmetic, so a
pass certifies the parser + the UDF plumbing end to end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.multimodal import (
    CONTAINER_OVERHEAD,
    decode_images,
    image_fmt_sql,
    image_height_sql,
    image_width_sql,
    synthetic_image_blobs,
    wav_channels_sql,
    wav_rate_sql,
)
from kafka_go_streamer_spark.plans.registry import query
from kafka_go_streamer_spark.sources.tables import load_table

# The synthesis arithmetic has ONE source of truth in multimodal.py
# (image_params_for + its *_sql mirrors); oracles consume the builders
# so the Python and SQL halves cannot silently diverge.
_FMT_SQL = image_fmt_sql()
_W_SQL = image_width_sql()
_H_SQL = image_height_sql()
_RATE_SQL = wav_rate_sql()
_CH_SQL = wav_channels_sql()
_OVERHEAD_SQL = (
    f"CASE {_FMT_SQL} WHEN 'png' THEN {CONTAINER_OVERHEAD['png']} "
    f"WHEN 'jpeg' THEN {CONTAINER_OVERHEAD['jpeg']} "
    f"ELSE {CONTAINER_OVERHEAD['gif']} END"
)


@query(
    "multimodal_decode_meta",
    oracle=f"""
    SELECT doc_id AS key,
           (octet_length(encode(text)) + {_OVERHEAD_SQL})::INTEGER AS byte_len,
           {_FMT_SQL} AS format,
           {_W_SQL}::INTEGER AS width,
           {_H_SQL}::INTEGER AS height,
           3 AS channels,
           sha256(text) AS content_hash
    FROM documents
    """,
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> typed metadata through the real
    mapInPandas/Arrow decode path with a REAL structural parser (the
    container headers are genuinely walked; dimensions come out of the
    binary, not out of a formula shared with the generator).

    Scale: decode is a narrow per-batch pandas transform — linear in
    input splits, no shuffle; a pixel-level decoder drops into the same
    batch loop without changing the plan."""
    from kafka_go_streamer_spark.multimodal import synthesize_and_decode
    from kafka_go_streamer_spark.sources.tables import fan_width, table_rows

    docs = load_table(spark, sf_dir, "documents")
    meta = synthesize_and_decode(
        docs, "doc_id", "text",
        width=fan_width(spark, table_rows(sf_dir, "documents")),
    )
    return meta.withColumn("channels", F.col("channels").cast("int"))


@query(
    "multimodal_binary_stats",
    oracle=f"""
    SELECT
      {_FMT_SQL} AS format,
      count(*) AS n,
      sum(octet_length(encode(text)) + {_OVERHEAD_SQL})::BIGINT AS total_bytes,
      max(octet_length(encode(text)) + {_OVERHEAD_SQL})::INTEGER AS max_bytes
    FROM documents
    GROUP BY 1
    """,
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over decoded metadata: the decode -> shuffle-light
    rollup shape of a real media-ingest pipeline."""
    from kafka_go_streamer_spark.multimodal import synthesize_and_decode
    from kafka_go_streamer_spark.sources.tables import fan_width, table_rows

    docs = load_table(spark, sf_dir, "documents")
    meta = synthesize_and_decode(
        docs, "doc_id", "text",
        width=fan_width(spark, table_rows(sf_dir, "documents")),
    )
    return meta.groupBy("format").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("byte_len").cast("bigint").alias("total_bytes"),
        F.max("byte_len").alias("max_bytes"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id AS key, text,
             octet_length(encode(text)) // 16 AS n_frames
      FROM documents
    )
    SELECT key,
           unnest(range(0, n_frames, 4))::INTEGER AS frame_idx,
           sha256(substr(text, unnest(range(0, n_frames, 4)) * 16 + 1, 16))
             AS frame_sha
    FROM f
    WHERE n_frames > 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-4th-frame sampling from a binary "video" payload through
    the real mapInPandas 1→N fan-out path (frame slicing stubbed as
    fixed 16-byte frames; payloads are ASCII so the oracle's substr
    slicing is byte-exact).

    Scale: decode+sample is a narrow per-batch pandas generator — the
    output fan-out happens inside the Arrow batch, no shuffle, and a
    real ffmpeg keyframe extractor drops into the same generator."""
    from kafka_go_streamer_spark.multimodal import sample_frames, synthetic_blobs

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(synthetic_blobs(docs, "doc_id", "text"), "key", "blob")


@query(
    "multimodal_audio_meta",
    oracle=f"""
    SELECT doc_id AS key,
           (octet_length(encode(text)) + 44)::INTEGER AS byte_len,
           {_RATE_SQL} AS sample_rate,
           {_CH_SQL}::INTEGER AS channels,
           16 AS bits_per_sample,
           (octet_length(encode(text)) // ({_CH_SQL} * 2))::INTEGER
             AS n_samples,
           (octet_length(encode(text)) // ({_CH_SQL} * 2)) * 1000.0
             / {_RATE_SQL} AS duration_ms,
           sha256(text) AS content_hash
    FROM documents
    """,
)
def multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary WAV payload -> typed audio metadata (sample rate,
    channels, sample count, duration) through the same mapInPandas
    decode path as images — the parser genuinely walks the RIFF chunk
    list and unpacks the little-endian fmt fields; the oracle predicts
    the result from the generator's arithmetic.

    Scale: narrow per-batch transform, no shuffle; a real resampler or
    feature extractor (MFCC/fbank) slots into the same batch loop."""
    from kafka_go_streamer_spark.multimodal import (
        decode_audio,
        synthetic_wav_blobs,
    )

    docs = load_table(spark, sf_dir, "documents")
    meta = decode_audio(
        synthetic_wav_blobs(docs, "doc_id", "text"), "key", "blob",
        fan=False,
    )
    return (
        meta.withColumn("byte_len", F.col("byte_len").cast("int"))
        .withColumn("sample_rate", F.col("sample_rate").cast("int"))
        .withColumn("channels", F.col("channels").cast("int"))
        .withColumn("bits_per_sample", F.col("bits_per_sample").cast("int"))
        .withColumn("n_samples", F.col("n_samples").cast("int"))
    )


@query(
    "multimodal_resize",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id AS key, text,
             {_W_SQL} AS w,
             {_H_SQL} AS h
      FROM documents
    ),
    r AS (
      SELECT key, text, w, h, greatest(w, h) AS mx FROM dims
    )
    SELECT key,
           (octet_length(encode(text)) + {_OVERHEAD_SQL})::INTEGER AS byte_len,
           {_FMT_SQL} AS format,
           (CASE WHEN mx > 256 THEN greatest(1, w * 256 // mx) ELSE w END)::INTEGER AS width,
           (CASE WHEN mx > 256 THEN greatest(1, h * 256 // mx) ELSE h END)::INTEGER AS height,
           3 AS channels,
           sha256(text) AS content_hash
    FROM r
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounding-box resize (max side 256, aspect preserved) as a
    blob -> blob mapInPandas stage, PROVEN by re-decoding its output
    with the same structural parser: the rewritten container must carry
    the new dimensions (fresh PNG CRC / JPEG SOF / GIF descriptor) and
    the untouched content body (hash unchanged). The oracle predicts
    the integer resize arithmetic from the generator's dims.

    Scale: resize and decode are chained narrow per-batch transforms in
    ONE stage — no shuffle between pipeline steps."""
    from kafka_go_streamer_spark.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents")
    blobs = synthetic_image_blobs(docs, "doc_id", "text")
    resized = resize_images(blobs, "key", "blob", max_side=256)
    meta = decode_images(resized, "key", "blob", fan=False)
    return meta.withColumn("channels", F.col("channels").cast("int"))


@query(
    "multimodal_byte_histogram",
    oracle="""
    WITH k AS (
      SELECT doc_id AS key, octet_length(encode(text)) AS t FROM documents
    ),
    bins AS (SELECT unnest(range(0, 16)) AS bin),
    cnt AS (
      SELECT doc_id AS key, ord(c) % 16 AS bin, count(*) AS n
      FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
      GROUP BY 1, 2
    )
    SELECT k.key, bins.bin::INTEGER AS bin,
           coalesce(cnt.n, 0)::INTEGER AS n,
           round(coalesce(cnt.n, 0) * 1.0 / greatest(k.t, 1), 6) AS density
    FROM k CROSS JOIN bins
    LEFT JOIN cnt ON cnt.key = k.key AND cnt.bin = bins.bin
    """,
)
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction from the decoded payload: 16-bin byte
    histogram (count + density per bin) over the content body — the
    multimodal feature stage (the same batch loop computes a color
    histogram for rasters or energy bands for audio). The 1 -> 16
    fan-out happens inside the Arrow batch.

    The oracle recomputes the histogram from the source text (the
    content body is the text's bytes; payloads are ASCII so ord(char)
    equals the byte value)."""
    from kafka_go_streamer_spark.multimodal import byte_histogram

    docs = load_table(spark, sf_dir, "documents")
    blobs = synthetic_image_blobs(docs, "doc_id", "text")
    return byte_histogram(blobs, "key", "blob", bins=16)


@query(
    "multimodal_dedup_blobs",
    oracle="""
    WITH g AS (
      SELECT md5(text) AS fp, count(*)::BIGINT AS n
      FROM documents GROUP BY 1
    )
    SELECT sum(n)::BIGINT AS n_docs,
           count(*)::BIGINT AS n_unique_blobs,
           sum(n - 1)::BIGINT AS n_dup_docs,
           max(n)::BIGINT AS largest_group
    FROM g
    """,
)
def multimodal_dedup_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT dedup on the BINARY modality: synthesize the image
    container for every document (the mapInPandas decode-path
    generator), hash the raw BLOB bytes, and report duplicate-group
    statistics. The oracle predicts the identical numbers from the
    TEXT fingerprints alone — blob synthesis is injective in the text
    (the content body IS the text bytes; format/dimensions derive from
    its sha256) — so this is a genuine cross-modality consistency
    check: the Arrow-batched binary pipeline must reproduce the group
    structure an independent engine derives without ever seeing a
    blob.

    Scale: the synthesis/hash pass is Arrow-batched Python over one
    scan (exactly the real image-dedup shape: bytes → digest inside
    the batch, only the 16-byte digest shuffles); the group count is
    map-side combinable and the report is a scalar aggregate over the
    digest-cardinality frame."""
    d = load_table(spark, sf_dir, "documents")
    blobs = synthetic_image_blobs(d, "doc_id", "text")
    groups = blobs.groupBy(F.md5(F.col("blob")).alias("fp")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return groups.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_unique_blobs"),
        F.sum(F.col("n") - 1).cast("long").alias("n_dup_docs"),
        F.max("n").cast("long").alias("largest_group"),
    )


#: Perceptual-hash banding geometry: the 60-bit signature splits into
#: four 15-bit bands; candidates share any band (capped buckets), and
#: the full-signature Hamming distance verifies.
PHASH_BANDS = 4
PHASH_BAND_BITS = 15
PHASH_BUCKET_CAP = 64
PHASH_HAMMING = 12


@query(
    "multimodal_phash_bands",
    oracle=f"""
    WITH sigs AS (
      SELECT doc_id,
             ('0x' || substr(md5(text), 1, 15))::BIGINT AS sig
      FROM documents
    ),
    bands AS (
      SELECT doc_id, sig, b.band,
             (sig >> (b.band * {PHASH_BAND_BITS}))
               & {(1 << PHASH_BAND_BITS) - 1} AS key
      FROM sigs, (SELECT unnest(range(0, {PHASH_BANDS})) AS band) b
    ),
    capped AS (
      SELECT doc_id, sig, band, key FROM (
        SELECT *, count(*) OVER (PARTITION BY band, key) AS _n
        FROM bands
      ) WHERE _n <= {PHASH_BUCKET_CAP}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.sig AS sig_a, b.sig AS sig_b
      FROM capped a JOIN capped b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT (SELECT count(*) FROM sigs)::BIGINT AS n_blobs,
           count(*)::BIGINT AS n_candidates,
           sum(CASE WHEN sig_a = sig_b THEN 1 ELSE 0 END)::BIGINT
             AS n_exact,
           sum(CASE WHEN sig_a <> sig_b
                     AND bit_count(xor(sig_a, sig_b)) <= {PHASH_HAMMING}
                    THEN 1 ELSE 0 END)::BIGINT AS n_near
    FROM cand
    """,
)
def multimodal_phash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded perceptual-hash near-duplicate blocking on the BINARY
    modality: synthesize every document's image container, DECODE it
    back to its content body (Arrow-batched mapInPandas — the real
    image-dedup data path), compress each body to a fixed 60-bit
    signature, block candidates by 15-bit signature bands with a
    bucket cap, and verify candidates by full-signature Hamming
    distance — exactly the pHash/dHash dedup pipeline image corpora
    run, with the pixel-domain hash stubbed to an md5 of the decoded
    body (see ``synthesize_and_sign``: one swappable line). The
    oracle re-derives every count from the text alone — synthesis is
    injective, so the decode→signature path must reproduce the group
    structure an engine that never saw a blob predicts.

    Scale: the signature stage is the FUSED synthesize→parse→sign
    Arrow stage (``synthesize_and_sign`` — the r12 A/B: two-stage
    chain 0.805 s, fused 0.440 s at sf0.1, min-of-3; this query was
    r11's only round-over-round regression and the fusion recovers
    it), so only 8-byte signatures ever leave Python; banding is an
    in-row explode of 4 rows per blob; the band-bucket self-join is
    capped (no bucket can go quadratic) and Hamming verification
    (xor + bit_count, codegen'd) runs on candidates only — the same
    blocking discipline as the SimHash/MinHash text family, applied
    cross-modality."""
    from kafka_go_streamer_spark.multimodal import synthesize_and_sign
    from pyspark.sql import Window

    from kafka_go_streamer_spark.operators.iterate import pinned

    d = load_table(spark, sf_dir, "documents")
    # pinned: the fused synth+sign mapInPandas is the expensive stage,
    # and the signature frame has two consumers (banding + blob count)
    # — unpinned, the scan is re-planned under each consumer; pinned,
    # blobs synthesize+sign exactly once and only the 8-byte
    # signatures materialize
    sigs = pinned(
        synthesize_and_sign(d, "doc_id", "text").select(
            F.col("key").alias("doc_id"), "sig"
        )
    )
    bands = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.sequence(F.lit(0), F.lit(PHASH_BANDS - 1))
        ).alias("band"),
    ).select(
        "doc_id",
        "sig",
        "band",
        F.expr(
            f"shiftrightunsigned(sig, band * {PHASH_BAND_BITS})"
            f" & {(1 << PHASH_BAND_BITS) - 1}"
        ).alias("key"),
    )
    wn = Window.partitionBy("band", "key")
    capped = pinned(  # both self-join sides read the capped frame
        bands.withColumn("_n", F.count(F.lit(1)).over(wn))
        .filter(F.col("_n") <= PHASH_BUCKET_CAP)
        .drop("_n")
    )
    a = capped.select(
        F.col("doc_id").alias("id_a"),
        F.col("sig").alias("sig_a"),
        "band",
        "key",
    )
    b = capped.select(
        F.col("doc_id").alias("id_b"),
        F.col("sig").alias("sig_b"),
        "band",
        "key",
    )
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    n_blobs = sigs.agg(F.count(F.lit(1)).cast("long").alias("n_blobs"))
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.crossJoin(F.broadcast(n_blobs)).groupBy("n_blobs").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum(F.when(F.col("sig_a") == F.col("sig_b"), 1).otherwise(0))
        .cast("long")
        .alias("n_exact"),
        F.sum(
            F.when(
                (F.col("sig_a") != F.col("sig_b"))
                & (ham <= PHASH_HAMMING),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_near"),
    ).select("n_blobs", "n_candidates", "n_exact", "n_near")


def _format_mix_sql() -> str:
    from kafka_go_streamer_spark.plans.registry import ORACLES

    meta = ORACLES["multimodal_decode_meta"]
    return f"""
    WITH meta AS MATERIALIZED ({meta})
    SELECT format,
           count(*)::BIGINT AS n_blobs,
           round(avg(width), 2) AS mean_width,
           round(avg(height), 2) AS mean_height,
           round(avg(byte_len), 2) AS mean_bytes,
           max(byte_len)::INTEGER AS max_bytes
    FROM meta GROUP BY 1
    """


@query("multimodal_format_mix", oracle=_format_mix_sql)
def multimodal_format_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-format mix of the binary corpus: per format, blob
    count, mean decoded dimensions, and byte sizes — the ingest
    dashboard that sizes decoder pools and flags format drift (a new
    crawl suddenly 80% GIF is a pipeline bug, not a data shift). Runs
    on the REAL fused synthesize→parse stage, so the numbers come from
    structural decode, not metadata trust.

    Scale: the decode scan is the audited one-Arrow-stage path
    (``synthesize_and_decode``); the mix is one tiny aggregate over
    its (format, dims, bytes) projection — formats are single-digit
    cardinality."""
    from kafka_go_streamer_spark.multimodal import synthesize_and_decode
    from kafka_go_streamer_spark.sources.tables import fan_width, table_rows

    d = load_table(spark, sf_dir, "documents")
    meta = synthesize_and_decode(
        d, "doc_id", "text",
        width=fan_width(spark, table_rows(sf_dir, "documents")),
    )
    return meta.groupBy("format").agg(
        F.count(F.lit(1)).cast("long").alias("n_blobs"),
        stable_round(F.avg("width"), 2).alias("mean_width"),
        stable_round(F.avg("height"), 2).alias("mean_height"),
        stable_round(F.avg("byte_len"), 2).alias("mean_bytes"),
        F.max("byte_len").cast("int").alias("max_bytes"),
    )
