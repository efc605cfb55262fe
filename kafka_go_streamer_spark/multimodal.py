"""Multimodal column plumbing: treat image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed by
Arrow-batched pandas functions over ``mapInPandas``.

The decode step is a REAL container-format parser: PNG (signature +
IHDR chunk walk with CRC verification), JPEG (SOI + marker-segment walk
to the SOF frame header), GIF (logical screen descriptor). The heavy
pixel libraries (PIL/libvips/ffmpeg) are not in this container, so the
test payloads are synthesized as structurally-valid containers by
``synthesize_image_blob`` — the parser does not know or use the
generator's arithmetic; it reads magic bytes, walks segments, and
unpacks FORMAT and DIMENSIONS exactly as it would for a camera file
(the JPEG walk skips APP0/EXIF segments generically). The
``content_hash`` field, by contrast, hashes the generator's framing —
bytes after the first SOF segment — which on a real camera JPEG (SOF
after APPn/DQT/DHT, entropy-coded scan) would not isolate the pixel
payload; treat it as a payload fingerprint, not a pixel hash.
Pixel-level ops (resize, colorspace) would slot into the same
mapInPandas batch loop below.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the decode stage: the typed metadata a real decoder
#: would produce for an image payload.
DECODE_SCHEMA = (
    "key bigint, byte_len int, format string, width int, height int, "
    "channels int, content_hash string"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type -> sample channels (PNG spec, "Color types and values").
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def synthesize_image_blob(content: bytes, fmt: str, width: int, height: int) -> bytes:
    """Build a structurally-valid minimal container of ``fmt`` with the
    given dimensions carrying ``content`` as the payload body.

    The containers are real enough that an independent parser (this
    module's, or file(1)'s magic tables) reads them: PNG gets a correct
    IHDR chunk with a real CRC; JPEG gets an SOI + SOF0 frame header +
    EOI; GIF gets a GIF89a logical screen descriptor + trailer."""
    if fmt == "png":
        ihdr = struct.pack(">II", width, height) + bytes([8, 2, 0, 0, 0])
        chunk = (
            struct.pack(">I", len(ihdr))
            + b"IHDR"
            + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        )
        return _PNG_SIG + chunk + content
    if fmt == "jpeg":
        # SOF0: len=17 (2 len + 1 precision + 4 dims + 1 ncomp + 3x3 comps)
        sof = (
            b"\xff\xc0"
            + struct.pack(">H", 17)
            + bytes([8])
            + struct.pack(">HH", height, width)  # JPEG stores height first
            + bytes([3])
            + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
        )
        return b"\xff\xd8" + sof + content + b"\xff\xd9"
    if fmt == "gif":
        screen = struct.pack("<HH", width, height) + bytes([0xF7, 0, 0])
        return b"GIF89a" + screen + content + b"\x3b"
    raise ValueError(f"unsupported format: {fmt}")


#: Container overhead in bytes per format (header + trailer around the
#: content body) — used by the SQL oracle to predict byte_len.
CONTAINER_OVERHEAD = {"png": 33, "jpeg": 23, "gif": 14}


def parse_image_header(payload: bytes) -> dict:
    """Structural image-header decode: identify the container by its
    magic bytes and unpack dimensions/channels from the format's own
    header layout. Raises ValueError on empty/corrupt payloads like any
    real decoder."""
    if not payload:
        raise ValueError("empty payload")
    if payload.startswith(_PNG_SIG):
        (length,) = struct.unpack_from(">I", payload, 8)
        ctype = payload[12:16]
        if ctype != b"IHDR":
            raise ValueError("PNG: first chunk is not IHDR")
        data = payload[16 : 16 + length]
        (crc,) = struct.unpack_from(">I", payload, 16 + length)
        if crc != zlib.crc32(ctype + data):
            raise ValueError("PNG: IHDR CRC mismatch")
        width, height = struct.unpack_from(">II", data, 0)
        color_type = data[9]
        content = payload[16 + length + 4 :]
        return _meta(payload, "png", width, height,
                     _PNG_CHANNELS.get(color_type, 3), content)
    if payload.startswith(b"\xff\xd8"):
        # walk marker segments to the first SOF0-SOF3 frame header
        off = 2
        while off + 4 <= len(payload):
            if payload[off] != 0xFF:
                raise ValueError("JPEG: bad marker alignment")
            marker = payload[off + 1]
            (seglen,) = struct.unpack_from(">H", payload, off + 2)
            if 0xC0 <= marker <= 0xC3:
                height, width = struct.unpack_from(">HH", payload, off + 5)
                ncomp = payload[off + 9]
                content_start = off + 2 + seglen
                content = payload[content_start:-2]  # strip EOI
                return _meta(payload, "jpeg", width, height, ncomp, content)
            off += 2 + seglen
        raise ValueError("JPEG: no SOF marker found")
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        width, height = struct.unpack_from("<HH", payload, 6)
        content = payload[13:-1]  # after screen descriptor, strip trailer
        return _meta(payload, "gif", width, height, 3, content)
    raise ValueError("unrecognized container magic")


def _meta(payload: bytes, fmt: str, width: int, height: int,
          channels: int, content: bytes) -> dict:
    return {
        "byte_len": len(payload),
        "format": fmt,
        "width": width,
        "height": height,
        "channels": channels,
        "content_hash": hashlib.sha256(content).hexdigest(),
    }


def decode_images(
    df: DataFrame, key_col: str, blob_col: str, *, fan: bool = True
) -> DataFrame:
    """Decode a binary column into typed metadata via mapInPandas.

    Arrow moves each partition to Python in columnar batches; the
    decode loop is per-batch, not per-row-serialized. Narrow transform:
    partitioning and ordering of the input are preserved, no shuffle.
    Pass ``fan=False`` when the input is already fanned out (e.g. the
    output of ``synthetic_image_blobs``, which parallelizes BEFORE its
    own Python stage) — repartitioning again would shuffle the blob
    bytes a second time for no parallelism gain (A/B'd r11: the
    fan-before-synth chain with fan=False here reads the same single
    shuffle but moves it from the synthesized containers to the
    smaller text rows AND unserializes the generator stage)."""
    from kafka_go_streamer_spark.sources.tables import fan_out

    src = df.select(F.col(key_col).alias("key"), F.col(blob_col).alias("blob"))
    if fan:
        src = fan_out(src)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [parse_image_header(bytes(b)) for b in pdf["blob"]]
            out = pd.DataFrame(metas)
            out.insert(0, "key", pdf["key"].values)
            yield out

    return src.mapInPandas(batches, DECODE_SCHEMA)


def synthetic_blobs(df: DataFrame, key_col: str, text_col: str) -> DataFrame:
    """Build a (key, blob) frame from a text column — the stand-in for a
    real image/audio payload table in this container."""
    return df.select(
        F.col(key_col).alias("key"),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
    )


#: Hash-indexed image-format palette for the blob synthesizer.
IMAGE_FORMATS = ("png", "jpeg", "gif")


def image_params_for(content: bytes) -> tuple:
    """SINGLE source of truth for the deterministic synthesis
    arithmetic (Python half): ``(format, width, height)`` derived from
    ``sha256(content)`` — format = IMAGE_FORMATS[d[0] % 3], width =
    64 + d[1]*8, height = 64 + d[2]*8 where ``d`` is the digest. Byte
    ``d[k]`` corresponds to hex ``substr(sha256(text), 2k+1, 2)`` on
    the SQL side — see ``image_fmt_sql``/``image_width_sql``/
    ``image_height_sql``, the mirrored DuckDB half. Every synthesis
    site (and, via the SQL builders, every oracle) consumes THIS
    function so the arithmetic cannot silently diverge."""
    d = hashlib.sha256(content).digest()
    return IMAGE_FORMATS[d[0] % 3], 64 + d[1] * 8, 64 + d[2] * 8


def image_blob_for_text(text) -> bytes:
    """Synthesize the canonical container for a text payload: utf-8
    bytes ride as the content body; format/dims from
    ``image_params_for``. The one call every Arrow synthesis stage
    makes per row."""
    content = str(text).encode("utf-8")
    fmt, w, h = image_params_for(content)
    return synthesize_image_blob(content, fmt, w, h)


def image_fmt_sql(col: str = "text") -> str:
    """DuckDB mirror of ``image_params_for``'s format arm (digest byte
    0 == hex chars 1..2)."""
    return (
        f"CASE ('0x' || substr(sha256({col}), 1, 2))::INT % 3 "
        "WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END"
    )


def image_width_sql(col: str = "text") -> str:
    """DuckDB mirror of ``image_params_for``'s width arm (digest byte
    1 == hex chars 3..4)."""
    return f"(64 + ('0x' || substr(sha256({col}), 3, 2))::INT * 8)"


def image_height_sql(col: str = "text") -> str:
    """DuckDB mirror of ``image_params_for``'s height arm (digest byte
    2 == hex chars 5..6)."""
    return f"(64 + ('0x' || substr(sha256({col}), 5, 2))::INT * 8)"


def wav_params_for(pcm: bytes) -> tuple:
    """SINGLE source of truth for the WAV synthesis arithmetic
    (Python half): ``(sample_rate, channels)`` from sha256 digest
    bytes 3 and 4 — rate = WAV_RATES[d[3] % 4], channels =
    1 + d[4] % 2. SQL mirrors: ``wav_rate_sql``/``wav_channels_sql``."""
    d = hashlib.sha256(pcm).digest()
    return WAV_RATES[d[3] % 4], 1 + d[4] % 2


def wav_rate_sql(col: str = "text") -> str:
    """DuckDB mirror of ``wav_params_for``'s rate arm (digest byte 3
    == hex chars 7..8)."""
    rates = WAV_RATES
    return (
        f"CASE ('0x' || substr(sha256({col}), 7, 2))::INT % 4 "
        f"WHEN 0 THEN {rates[0]} WHEN 1 THEN {rates[1]} "
        f"WHEN 2 THEN {rates[2]} ELSE {rates[3]} END"
    )


def wav_channels_sql(col: str = "text") -> str:
    """DuckDB mirror of ``wav_params_for``'s channels arm (digest byte
    4 == hex chars 9..10)."""
    return f"(1 + ('0x' || substr(sha256({col}), 9, 2))::INT % 2)"


def synthetic_image_blobs(df: DataFrame, key_col: str, text_col: str) -> DataFrame:
    """Build a (key, blob) frame of structurally-valid image containers
    from a text column: format and dimensions derive deterministically
    from sha256(text) (so the SQL oracle can predict what an
    INDEPENDENT parse of the binary must find), and the text bytes ride
    as the container's content body.

    This is the test-data generator half of the decode round-trip:
    ``parse_image_header(synthesize_image_blob(...))`` exercises real
    magic-byte detection, chunk/segment walking, CRC checking, and
    endian-correct dimension unpacking."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = [image_blob_for_text(text) for text in pdf["text"]]
            yield pd.DataFrame({"key": pdf["key"], "blob": blobs})

    from kafka_go_streamer_spark.sources.tables import fan_out

    # Fan out BEFORE the Python stage: the test parquet ships one row
    # group, so without this the container synthesis (sha256 + CRC per
    # row) runs in a single task no matter how many cores the cluster
    # has. Fanning here instead of in the downstream decoder keeps the
    # chain at ONE shuffle, placed on the small text rows rather than
    # the synthesized containers (A/B'd r11, see BASELINE.md).
    src = fan_out(
        df.select(F.col(key_col).alias("key"), F.col(text_col).alias("text"))
    )
    return src.mapInPandas(batches, "key bigint, blob binary")


#: Frame-sampling parameters for the (stubbed) video path: fixed frame
#: size in bytes and the keep-every-Nth stride. A real pipeline gets
#: these from the container header; frozen here so the SQL oracle can
#: replay the slicing exactly.
FRAME_BYTES = 16
FRAME_STRIDE = 4

FRAME_SCHEMA = "key bigint, frame_idx int, frame_sha string"


def sample_frames(df: DataFrame, key_col: str, blob_col: str) -> DataFrame:
    """Sample every ``FRAME_STRIDE``-th fixed-size frame from a binary
    payload (the video analogue of ``decode_images``): one input row
    fans out to ``ceil(n_frames / stride)`` output rows carrying the
    frame index and a content hash.

    A real implementation would run ffmpeg keyframe extraction inside
    the same ``mapInPandas`` generator; the slicing stub keeps the
    plumbing — Arrow batch transfer, 1→N row fan-out, narrow no-shuffle
    plan — identical to production.
    """
    from kafka_go_streamer_spark.sources.tables import fan_out

    src = fan_out(
        df.select(F.col(key_col).alias("key"), F.col(blob_col).alias("blob"))
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            keys, idxs, shas = [], [], []
            for key, blob in zip(pdf["key"], pdf["blob"]):
                payload = bytes(blob)
                n_frames = len(payload) // FRAME_BYTES
                for i in range(0, n_frames, FRAME_STRIDE):
                    frame = payload[
                        i * FRAME_BYTES : (i + 1) * FRAME_BYTES
                    ]
                    keys.append(key)
                    idxs.append(i)
                    shas.append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(
                {"key": keys, "frame_idx": idxs, "frame_sha": shas}
            )

    return src.mapInPandas(batches, FRAME_SCHEMA)


# -- audio: RIFF/WAVE ---------------------------------------------------

AUDIO_SCHEMA = (
    "key bigint, byte_len int, sample_rate int, channels int, "
    "bits_per_sample int, n_samples int, duration_ms double, "
    "content_hash string"
)

#: sample-rate palette the synthesizer draws from (hash-indexed), so
#: the SQL oracle can predict what an independent parse must find.
WAV_RATES = (8000, 16000, 22050, 44100)


def synthesize_wav_blob(pcm: bytes, sample_rate: int, channels: int,
                        bits_per_sample: int = 16) -> bytes:
    """Build a structurally-valid RIFF/WAVE container around ``pcm``:
    RIFF header, canonical PCM ``fmt `` chunk (little-endian, all
    derived fields — block align, byte rate — computed per spec), and a
    ``data`` chunk. file(1)'s magic tables identify the result."""
    block_align = channels * bits_per_sample // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align,
        bits_per_sample,
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def parse_wav_header(payload: bytes) -> dict:
    """Structural WAV decode: verify the RIFF/WAVE magic, walk the
    chunk list to ``fmt `` and ``data`` (skipping unknown chunks, as a
    real parser must — LIST/INFO chunks are common in the wild), and
    derive sample count and duration from the format fields."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt_fields = None
    pcm = None
    off = 12
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        (clen,) = struct.unpack_from("<I", payload, off + 4)
        body = payload[off + 8 : off + 8 + clen]
        if len(body) < clen:
            raise ValueError(f"WAV: truncated {cid!r} chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("WAV: fmt chunk too short")
            fmt_fields = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        off += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt_fields is None or pcm is None:
        raise ValueError("WAV: missing fmt or data chunk")
    _, channels, sample_rate, _, block_align, bits = fmt_fields
    if block_align == 0:
        raise ValueError("WAV: zero block align")
    n_samples = len(pcm) // block_align
    return {
        "byte_len": len(payload),
        "sample_rate": sample_rate,
        "channels": channels,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_ms": n_samples * 1000.0 / sample_rate,
        "content_hash": hashlib.sha256(pcm).hexdigest(),
    }


def synthetic_wav_blobs(df: DataFrame, key_col: str, text_col: str) -> DataFrame:
    """(key, blob) frame of structurally-valid WAV containers: the text
    bytes ride as PCM data; rate/channels derive from sha256(text) so
    the oracle can predict the parse output."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for text in pdf["text"]:
                pcm = str(text).encode("utf-8")
                rate, ch = wav_params_for(pcm)
                blobs.append(synthesize_wav_blob(pcm, rate, ch))
            yield pd.DataFrame({"key": pdf["key"], "blob": blobs})

    from kafka_go_streamer_spark.sources.tables import fan_out

    # Fan before the Python synthesis stage (see synthetic_image_blobs).
    src = fan_out(
        df.select(F.col(key_col).alias("key"), F.col(text_col).alias("text"))
    )
    return src.mapInPandas(batches, "key bigint, blob binary")


def decode_audio(
    df: DataFrame, key_col: str, blob_col: str, *, fan: bool = True
) -> DataFrame:
    """Binary WAV payloads -> typed audio metadata via the same
    Arrow-batched mapInPandas path as ``decode_images`` — narrow
    per-batch transform, no shuffle, linear in input splits. Pass
    ``fan=False`` when the input is already fanned out (output of
    ``synthetic_wav_blobs``) to keep the chain at one shuffle."""
    from kafka_go_streamer_spark.sources.tables import fan_out

    src = df.select(F.col(key_col).alias("key"), F.col(blob_col).alias("blob"))
    if fan:
        src = fan_out(src)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [parse_wav_header(bytes(b)) for b in pdf["blob"]]
            out = pd.DataFrame(metas)
            out.insert(0, "key", pdf["key"].values)
            yield out

    return src.mapInPandas(batches, AUDIO_SCHEMA)


#: Resize output: same (key, blob) shape as the input — resize is a
#: blob -> blob stage that composes with decode_images downstream.
RESIZE_SCHEMA = "key bigint, blob binary"


def resize_images(
    df: DataFrame, key_col: str, blob_col: str, max_side: int = 256
) -> DataFrame:
    """Bounding-box resize: scale every image so its longer side is at
    most ``max_side``, preserving aspect ratio (integer arithmetic:
    ``new_w = w * max_side // max(w, h)``), floored at 1px.

    Without pixel libraries in this container the raster stage is the
    header rewrite: the container is re-synthesized with the new
    dimensions — a REAL rewrite (fresh PNG CRC, fresh JPEG SOF, fresh
    GIF screen descriptor) whose output must re-parse; the payload body
    passes through untouched. A PIL ``Image.resize`` drops into the
    same batch loop, changing only the body handling.

    Scale: blob -> blob narrow per-batch transform, composable with
    decode in the same stage — no shuffle anywhere in the chain."""
    src = df.select(F.col(key_col).alias("key"), F.col(blob_col).alias("blob"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_blobs = []
            for b in pdf["blob"]:
                payload = bytes(b)
                meta = parse_image_header(payload)
                w, h = meta["width"], meta["height"]
                mx = max(w, h)
                if mx > max_side:
                    nw = max(1, w * max_side // mx)
                    nh = max(1, h * max_side // mx)
                else:
                    nw, nh = w, h
                content = _content_of(payload, meta["format"])
                out_blobs.append(
                    synthesize_image_blob(content, meta["format"], nw, nh)
                )
            yield pd.DataFrame({"key": pdf["key"].values, "blob": out_blobs})

    return src.mapInPandas(batches, RESIZE_SCHEMA)


def _content_of(payload: bytes, fmt: str) -> bytes:
    """Extract the content body the container carries (inverse of
    ``synthesize_image_blob``'s framing)."""
    if fmt == "png":
        (length,) = struct.unpack_from(">I", payload, 8)
        return payload[16 + length + 4 :]
    if fmt == "jpeg":
        (seglen,) = struct.unpack_from(">H", payload, 4)
        return payload[4 + seglen : -2]
    if fmt == "gif":
        return payload[13:-1]
    raise ValueError(f"unsupported format: {fmt}")


#: Feature-extraction output: one row per (key, bin) — the classic
#: histogram-feature layout (a color histogram would use the same
#: schema with bins over pixel values).
FEATURE_SCHEMA = "key bigint, bin int, n int, density double"


def byte_histogram(
    df: DataFrame, key_col: str, blob_col: str, bins: int = 16
) -> DataFrame:
    """Feature extraction from the DECODED payload: parse the container,
    take the content body's bytes, and emit a ``bins``-bin histogram of
    ``byte % bins`` with per-bin density — the multimodal
    feature-extraction stage (for a raster image this same loop computes
    a color histogram; for audio, energy bands).

    Scale: 1 -> bins fan-out happens inside the Arrow batch; no shuffle,
    no driver involvement; downstream similarity search consumes the
    (key, bin, density) rows or pivots them to a dense vector."""
    import numpy as np

    src = df.select(F.col(key_col).alias("key"), F.col(blob_col).alias("blob"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            keys, bs, ns, ds = [], [], [], []
            for key, b in zip(pdf["key"], pdf["blob"]):
                payload = bytes(b)
                meta = parse_image_header(payload)
                content = _content_of(payload, meta["format"])
                vals = np.frombuffer(content, dtype=np.uint8) % bins
                counts = np.bincount(vals, minlength=bins)
                total = max(len(content), 1)
                for k in range(bins):
                    keys.append(key)
                    bs.append(k)
                    ns.append(int(counts[k]))
                    # epsilon matches stable_round/stabilize_rounds at scale 6
                    ds.append(round(counts[k] / total + 5e-9, 6))
            yield pd.DataFrame(
                {"key": keys, "bin": bs, "n": ns, "density": ds}
            )

    return src.mapInPandas(batches, FEATURE_SCHEMA)


def perceptual_signatures(
    df: DataFrame, key_col: str, blob_col: str, *, fan: bool = True
) -> DataFrame:
    """(key, sig) frame: a fixed-width 60-bit signature of each blob's
    DECODED content body, for banded near-duplicate blocking.

    STUB NOTE: with no imaging libraries in this container, the
    "perceptual" signature is md5 of the decoded content body (so it
    is deterministic, engine-predictable, and sensitive only to the
    content — not the container). Production swaps exactly this one
    per-batch line for a real dHash/pHash over decoded pixels; the
    Spark-side plumbing this module exercises — container parse →
    content extraction → fixed-width integer signature, Arrow-batched,
    only 8 bytes per blob leaving the scan — is the real shape."""
    from kafka_go_streamer_spark.sources.tables import fan_out

    src = df.select(F.col(key_col).alias("key"), F.col(blob_col).alias("blob"))
    if fan:
        src = fan_out(src)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sigs = []
            for b in pdf["blob"]:
                payload = bytes(b)
                if payload.startswith(_PNG_SIG):
                    (length,) = struct.unpack_from(">I", payload, 8)
                    content = payload[16 + length + 4 :]
                elif payload.startswith(b"\xff\xd8"):
                    off = 2
                    content = b""
                    while off + 4 <= len(payload):
                        marker = payload[off + 1]
                        (seglen,) = struct.unpack_from(">H", payload, off + 2)
                        if 0xC0 <= marker <= 0xC3:
                            content = payload[off + 2 + seglen : -2]
                            break
                        off += 2 + seglen
                elif payload[:6] in (b"GIF87a", b"GIF89a"):
                    content = payload[13:-1]
                else:
                    raise ValueError("unrecognized container magic")
                sigs.append(int(hashlib.md5(content).hexdigest()[:15], 16))
            yield pd.DataFrame({"key": pdf["key"], "sig": sigs})

    return src.mapInPandas(batches, "key bigint, sig bigint")


def synthesize_and_decode(
    df: DataFrame, key_col: str, text_col: str, width: int | None = None
) -> DataFrame:
    """Fused generate→parse: synthesize the container AND structurally
    re-parse it inside ONE Arrow batch stage (one fan-out shuffle, one
    Python hop), instead of chaining ``synthetic_image_blobs`` →
    ``decode_images`` (two Python stages with the full blob crossing
    Python→JVM→Python between them). The round-trip stays real — the
    parser is the same independent ``parse_image_header`` walking magic
    bytes/chunks/CRC; only the pointless inter-stage blob transfer
    goes. This is also the production ingest shape: decode runs in the
    same narrow stage that receives the bytes whenever possible.

    Measured r11 same-session at sf0.1 (min-of-3, noop sink): two-stage
    chain 0.702 s → fused 0.441 s (×1.6; the two-stage chain remains in
    resize/phash queries, which exercise blob→blob composition)."""
    from kafka_go_streamer_spark.sources.tables import fan_out

    # width: stat-based fan (sources.tables.fan_width) when the caller
    # knows the input row count — the header walk is µs-per-row, so a
    # full 32-way fan of a few thousand rows pays more in per-task
    # worker round-trips than it buys in parallelism (measured: 32-task
    # 0.705 s vs 8-task 0.537 s min-of-3 on the sf0.1 corpus).
    src = fan_out(
        df.select(F.col(key_col).alias("key"), F.col(text_col).alias("text")),
        width,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = []
            for text in pdf["text"]:
                metas.append(parse_image_header(image_blob_for_text(text)))
            out = pd.DataFrame(metas)
            out.insert(0, "key", pdf["key"].values)
            yield out

    return src.mapInPandas(batches, DECODE_SCHEMA)


#: Every doc_id divisible by this gets its container's magic byte
#: zeroed before the parse — the deterministic corruption model for the
#: quarantine path (no container format starts with 0x00, so the parse
#: MUST reject exactly these rows).
QUARANTINE_MOD = 37

QUARANTINE_SCHEMA = "key bigint, status_format string, byte_len int"


def synthesize_decode_quarantine(
    df: DataFrame, key_col: str, text_col: str, width: int | None = None
) -> DataFrame:
    """The fused synthesize→parse stage with the ERROR PATH a real
    ingest needs: a crawler's blobs are routinely truncated or
    bit-rotted, and a decoder that throws on the first bad payload
    kills the whole task (then the stage, then the job, at 100 TB —
    after hours). Here every blob whose key is divisible by
    QUARANTINE_MOD is corrupted (magic byte zeroed) before the SAME
    independent ``parse_image_header`` walk; a parse failure is caught
    PER ROW and emitted as ``status_format = 'quarantined'`` instead
    of propagating — the job completes, and the quarantine share is a
    queryable output instead of a stack trace.

    Emits (key, status_format, byte_len): the parsed container format
    for healthy rows, 'quarantined' for rejects — only three small
    columns leave the Arrow stage."""
    from kafka_go_streamer_spark.sources.tables import fan_out

    src = fan_out(
        df.select(F.col(key_col).alias("key"), F.col(text_col).alias("text")),
        width,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            statuses = []
            lens = []
            for key, text in zip(pdf["key"], pdf["text"]):
                blob = image_blob_for_text(text)
                if int(key) % QUARANTINE_MOD == 0:
                    blob = b"\x00" + blob[1:]
                try:
                    statuses.append(parse_image_header(blob)["format"])
                except ValueError:
                    statuses.append("quarantined")
                lens.append(len(blob))
            yield pd.DataFrame(
                {
                    "key": pdf["key"],
                    "status_format": pd.Series(statuses, dtype="object"),
                    "byte_len": pd.Series(lens, dtype="int32"),
                }
            )

    return src.mapInPandas(batches, QUARANTINE_SCHEMA)


def synthesize_and_sign(
    df: DataFrame, key_col: str, text_col: str
) -> DataFrame:
    """Fused generate→parse→signature: synthesize the container,
    structurally re-parse it (the same independent
    ``parse_image_header`` + ``_content_of`` walk the two-stage chain
    runs), and compress the decoded body to the 60-bit perceptual
    signature — all inside ONE Arrow batch stage, so only (key, sig)
    rows ever leave Python and the blob never round-trips through the
    JVM. The two-stage ``synthetic_image_blobs`` →
    ``perceptual_signatures`` chain remains for blob→blob composition
    (resize); this is the ingest shape for signature-only consumers.

    Measured r12 same-session at sf0.1 (min-of-3): two-stage chain
    0.805 s → blob-fan variant 0.651 s → fused 0.440 s (×1.8) — the
    same fusion win ``synthesize_and_decode`` recorded in r11."""
    from kafka_go_streamer_spark.sources.tables import fan_out

    src = fan_out(
        df.select(F.col(key_col).alias("key"), F.col(text_col).alias("text"))
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sigs = []
            for text in pdf["text"]:
                blob = bytes(image_blob_for_text(text))
                meta = parse_image_header(blob)
                body = _content_of(blob, meta["format"])
                sigs.append(int(hashlib.md5(body).hexdigest()[:15], 16))
            yield pd.DataFrame({"key": pdf["key"], "sig": sigs})

    return src.mapInPandas(batches, "key bigint, sig bigint")
