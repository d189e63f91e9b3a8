"""Multimodal column plumbing (north-star layer, SURVEY.md §2.8).

Media assets are opaque `binary` columns plus typed metadata structs —
the layout a 100 TB training-data lake uses (parquet binary chunks,
partition-pruned by metadata, lazily decoded). The fixture has no real
media, so `documents.text` is encoded to bytes as a stand-in payload;
the Spark-side plumbing — binary schema, Arrow batch shape, mapInPandas
decode signature, metadata projection — is real and differentially
tested.

The pixel-level codec step is STUBBED: `decode_batches` produces
deterministic pseudo-features from the bytes (the container has no
image/audio libraries). Header-level decode is REAL: `decode_image_real`
parses PNG IHDR / JPEG SOFn / GIF logical-screen headers in pure Python
(no deps) and `multimodal_image_probe` drives it end-to-end through the
Arrow batch path against payloads synthesized column-side, with an
exact DuckDB oracle. Swapping in a full pixel decoder changes only the
function body — batch shape and schema stay identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataentrytask_spark.catalog import load_table
from bigdataentrytask_spark.operators import operator
from bigdataentrytask_spark.session import ensure_session_confs


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, payload binary, meta struct) — the
    canonical multimodal layout."""
    ensure_session_confs(spark)
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("source").alias("origin"),
            F.length("text").alias("raw_chars"),
        ).alias("meta"),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> sample channels (greyscale, RGB, palette, grey+A, RGBA)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_image_header(payload: bytes) -> dict | None:
    """Pure-Python container-header parse: PNG (IHDR), JPEG (SOFn
    frame header), GIF (logical screen descriptor). Returns
    {format, width, height, channels, bit_depth} or None when the
    payload is not a recognized image. Header-only — no pixel decode,
    no libraries, O(header) per asset."""
    if payload.startswith(_PNG_SIG):
        # signature(8) + IHDR length(4) + "IHDR"(4) + w(4) h(4) depth(1)
        # color(1) — the IHDR chunk is mandatory and always first.
        if len(payload) >= 26 and payload[12:16] == b"IHDR":
            color_type = payload[25]
            if color_type not in _PNG_CHANNELS:
                return None
            return {
                "format": "png",
                "width": int.from_bytes(payload[16:20], "big"),
                "height": int.from_bytes(payload[20:24], "big"),
                "channels": _PNG_CHANNELS[color_type],
                "bit_depth": payload[24],
            }
        return None
    if payload[:2] == b"\xff\xd8":
        # JPEG: walk marker segments to the first SOFn frame header,
        # skipping padding FFs and standalone markers (RSTn/TEM).
        i, n = 2, len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                i += 2
                continue
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                # SOFn payload: precision u8, height u16, width u16, ncomp u8
                if i + 10 <= n:
                    return {
                        "format": "jpeg",
                        "width": int.from_bytes(payload[i + 7 : i + 9], "big"),
                        "height": int.from_bytes(payload[i + 5 : i + 7], "big"),
                        "channels": payload[i + 9],
                        "bit_depth": payload[i + 4],
                    }
                return None
            i += 2 + seg_len
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        return {
            "format": "gif",
            "width": int.from_bytes(payload[6:8], "little"),
            "height": int.from_bytes(payload[8:10], "little"),
            "channels": 3,  # palette-expanded RGB
            "bit_depth": 8,
        }
    return None


def decode_image_real(payload: bytes) -> dict:
    """Real codec slot: container-header decode (dimensions, channels,
    bit depth) with no external libraries. Pixel decode would extend
    the returned dict — callers only depend on its shape."""
    meta = parse_image_header(payload)
    if meta is None:
        raise ValueError(
            "unrecognized image container (PNG/JPEG/GIF supported); "
            "plug Pillow/ffmpeg here for pixel-level decode"
        )
    return meta


def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: Arrow batches in, feature rows out. The stub
    'decode' derives deterministic pseudo-features from the payload
    (byte length, 8-byte header fingerprint, fake WxH from two header
    bytes) — every piece of which is also SQL-expressible, giving the
    plumbing an exact oracle."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": payloads.map(len),
                "header_hex": payloads.map(lambda b: b[:8].hex()),
                "fake_width": payloads.map(lambda b: 1 + b[0] if len(b) else 0),
                "fake_height": payloads.map(
                    lambda b: 1 + b[1] if len(b) > 1 else 0
                ),
            }
        )


@operator(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))               AS byte_len,
           lower(hex(encode(substr(text, 1, 8))))   AS header_hex,
           1 + ord(substr(text, 1, 1))              AS fake_width,
           1 + ord(substr(text, 2, 1))              AS fake_height
    FROM documents ORDER BY doc_id
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payloads through the Arrow decode path; metadata column
    pruned before the UDF so only (doc_id, payload) crosses into
    Python."""
    media = media_table(spark, sf_dir).select("doc_id", "payload")
    out = media.mapInPandas(
        decode_batches,
        "doc_id long, byte_len long, header_hex string, "
        "fake_width long, fake_height long",
    )
    return out


@operator(
    "multimodal_meta_stats",
    oracle="""
    SELECT 'text/plain' AS mime, source AS origin,
           COUNT(*) AS n, CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
    FROM documents GROUP BY 2 ORDER BY origin
    """,
)
def multimodal_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation: the binary payload column must be
    pruned from the scan entirely (the 100 TB point of the layout)."""
    m = media_table(spark, sf_dir)
    return (
        m.groupBy(
            F.col("meta.mime").alias("mime"), F.col("meta.origin").alias("origin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
        )
        .orderBy("origin")
    )


# --------------------------------------------------------------------------
# Frame sampling: fixed-size chunking of the binary payload (stand-in
# for video frames) + every-k-th selection + per-frame feature — the
# decode-free plumbing of a video pipeline. Pure column expressions:
# chunk indices come from `sequence`, features from byte arithmetic.
# --------------------------------------------------------------------------
FRAME_BYTES = 64
FRAME_STRIDE = 4  # sample every 4th frame


@operator(
    "multimodal_frame_sample",
    oracle=f"""
    WITH frames AS (
      SELECT doc_id,
             i AS frame_idx,
             length(substr(text, i * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_len,
             ord(substr(text, i * {FRAME_BYTES} + 1, 1)) AS first_byte
      FROM documents,
           UNNEST(range(0, CAST(ceil(length(text) / {FRAME_BYTES}.0) AS BIGINT))) t(i)
      WHERE i % {FRAME_STRIDE} = 0
    )
    SELECT doc_id,
           COUNT(*) AS n_sampled_frames,
           CAST(SUM(frame_len) AS BIGINT) AS sampled_bytes,
           CAST(SUM(first_byte) AS BIGINT) AS feature_sum
    FROM frames GROUP BY doc_id ORDER BY doc_id
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session_confs(spark)
    d = load_table(spark, sf_dir, "documents")
    frames = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(length(text) / {FRAME_BYTES}.0) AS INT) - 1),"
                f" i -> named_struct("
                f"   'frame_idx', i,"
                f"   'frame_len', length(substring(text, i * {FRAME_BYTES} + 1, {FRAME_BYTES})),"
                f"   'first_byte', ascii(substring(text, i * {FRAME_BYTES} + 1, 1))))"
            )
        ).alias("f"),
    ).filter(F.col("f.frame_idx") % FRAME_STRIDE == 0)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled_frames"),
            F.sum("f.frame_len").alias("sampled_bytes"),
            F.sum("f.first_byte").alias("feature_sum"),
        )
    )


# --------------------------------------------------------------------------
# Real header decode, end-to-end: synthesize a valid PNG header per
# document column-side (unhex of a built hex string — dims derived from
# the text, color type alternating RGB/RGBA by doc_id), then parse it
# back with the REAL pure-Python header parser inside mapInPandas. The
# oracle recomputes the expected (fmt, width, height, channels,
# bit_depth) directly from the text — the parser must invert the
# synthesis bit-for-bit. Payloads are pruned to (doc_id, payload)
# before the Arrow boundary, same policy as multimodal_decode.
# --------------------------------------------------------------------------
def _probe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [decode_image_real(bytes(b)) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "fmt": [m["format"] for m in metas],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
                "channels": [m["channels"] for m in metas],
                "bit_depth": [m["bit_depth"] for m in metas],
            }
        )


@operator(
    "multimodal_image_probe",
    oracle="""
    SELECT doc_id,
           'png' AS fmt,
           CAST(1 + ord(substr(text, 1, 1)) AS BIGINT) AS width,
           CAST(1 + ord(substr(text, 2, 1)) AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 4 END AS BIGINT)
               AS channels,
           CAST(8 AS BIGINT) AS bit_depth
    FROM documents ORDER BY doc_id
    """,
)
def multimodal_image_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session_confs(spark)
    d = load_table(spark, sf_dir, "documents")
    w = 1 + F.ascii(F.substring("text", 1, 1))
    h = 1 + F.ascii(F.substring("text", 2, 1))
    color_type = F.when(F.col("doc_id") % 2 == 0, F.lit("02")).otherwise(
        F.lit("06")
    )  # 02 = RGB (3 ch), 06 = RGBA (4 ch)
    hex_payload = F.concat(
        # PNG signature + IHDR chunk length (13) + "IHDR"
        F.lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
        F.lpad(F.hex(w.cast("bigint")), 8, "0"),
        F.lpad(F.hex(h.cast("bigint")), 8, "0"),
        F.lit("08"),  # bit depth
        color_type,
        F.lit("000000"),  # compression / filter / interlace
    )
    media = d.select("doc_id", F.unhex(hex_payload).alias("payload"))
    return media.mapInPandas(
        _probe_batches,
        "doc_id long, fmt string, width long, height long, "
        "channels long, bit_depth long",
    )


# --------------------------------------------------------------------------
# Resize planning: aspect-preserving fit into TARGET_PX, computed from
# metadata dims only — the step a 100 TB image pipeline runs BEFORE
# touching payload bytes (plan the work, skip no-op resizes, estimate
# output volume). Downscale only (scale capped at 1). The actual pixel
# resample belongs in the decode_batches codec slot.
# --------------------------------------------------------------------------
TARGET_PX = 224


@operator(
    "multimodal_resize_plan",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
             1 + ord(substr(text, 1, 1)) AS w,
             1 + ord(substr(text, 2, 1)) AS h
      FROM documents
    )
    SELECT doc_id, w, h,
           CAST(ROUND(w * LEAST(1.0, {TARGET_PX} / GREATEST(w, h))) AS BIGINT)
               AS out_w,
           CAST(ROUND(h * LEAST(1.0, {TARGET_PX} / GREATEST(w, h))) AS BIGINT)
               AS out_h,
           (GREATEST(w, h) > {TARGET_PX}) AS needs_resize
    FROM dims ORDER BY doc_id
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session_confs(spark)
    d = load_table(spark, sf_dir, "documents")
    w = (1 + F.ascii(F.substring("text", 1, 1))).cast("double")
    h = (1 + F.ascii(F.substring("text", 2, 1))).cast("double")
    scale = F.least(F.lit(1.0), F.lit(float(TARGET_PX)) / F.greatest(w, h))
    return d.select(
        "doc_id",
        w.cast("long").alias("w"),
        h.cast("long").alias("h"),
        F.round(w * scale).cast("long").alias("out_w"),
        F.round(h * scale).cast("long").alias("out_h"),
        (F.greatest(w, h) > TARGET_PX).alias("needs_resize"),
    )


# --------------------------------------------------------------------------
# Audio header decode (WAV/RIFF), same contract as the image probe:
# synthesize a VALID canonical 44-byte PCM WAV header per document
# column-side (little-endian fields built by byte-swapping hex), parse
# it back with the real pure-Python RIFF parser inside mapInPandas,
# and let the oracle recompute every field (including duration) from
# the text with integer math. Swapping in a real sample decoder
# changes only the function body — batch shape and schema hold.
# --------------------------------------------------------------------------
def parse_wav_header(payload: bytes) -> dict | None:
    """Canonical PCM WAV header parse: RIFF/WAVE + fmt(16) + data.
    Returns {format, channels, sample_rate, bits, n_samples,
    duration_ms} or None. Header-only, O(44 bytes), no libraries.
    duration_ms uses integer floor division — deterministic."""
    if len(payload) < 44 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    if payload[12:16] != b"fmt " or payload[36:40] != b"data":
        return None
    le = lambda b: int.from_bytes(b, "little")  # noqa: E731
    audio_format = le(payload[20:22])
    if audio_format != 1:  # PCM only in this probe
        return None
    channels = le(payload[22:24])
    sample_rate = le(payload[24:28])
    bits = le(payload[34:36])
    data_size = le(payload[40:44])
    block = channels * (bits // 8)
    if block == 0 or sample_rate == 0:
        return None
    n_samples = data_size // block
    return {
        "format": "wav",
        "channels": channels,
        "sample_rate": sample_rate,
        "bits": bits,
        "n_samples": n_samples,
        "duration_ms": n_samples * 1000 // sample_rate,
    }


def _le_hex(col, n_bytes: int):
    """Hex string of `col` as an n-byte LITTLE-endian integer."""
    be = F.lpad(F.hex(col.cast("bigint")), n_bytes * 2, "0")
    pairs = [
        F.substring(be, i * 2 + 1, 2) for i in reversed(range(n_bytes))
    ]
    return F.concat(*pairs)


def _wav_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [parse_wav_header(bytes(b)) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "fmt": [m["format"] for m in metas],
                "channels": [m["channels"] for m in metas],
                "sample_rate": [m["sample_rate"] for m in metas],
                "bits": [m["bits"] for m in metas],
                "n_samples": [m["n_samples"] for m in metas],
                "duration_ms": [m["duration_ms"] for m in metas],
            }
        )


@operator(
    "multimodal_audio_probe",
    oracle="""
    SELECT doc_id,
           'wav' AS fmt,
           CAST(1 + doc_id % 2 AS BIGINT)                  AS channels,
           CAST(8000 + 100 * ord(substr(text, 1, 1)) AS BIGINT)
                                                           AS sample_rate,
           CAST(16 AS BIGINT)                              AS bits,
           CAST(100 + n_chars AS BIGINT)                   AS n_samples,
           CAST((100 + n_chars) * 1000
                // (8000 + 100 * ord(substr(text, 1, 1))) AS BIGINT)
                                                           AS duration_ms
    FROM documents ORDER BY doc_id
    """,
)
def multimodal_audio_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session_confs(spark)
    d = load_table(spark, sf_dir, "documents")
    channels = (1 + F.col("doc_id") % 2).cast("int")
    rate = (8000 + 100 * F.ascii(F.substring("text", 1, 1))).cast("int")
    bits = F.lit(16)
    n_samples = (100 + F.col("n_chars")).cast("int")
    block = channels * 2
    data_size = n_samples * block
    byte_rate = rate * block
    hex_payload = F.concat(
        F.lit("52494646"),                 # "RIFF"
        _le_hex(36 + data_size, 4),        # chunk size
        F.lit("57415645"),                 # "WAVE"
        F.lit("666D7420"),                 # "fmt "
        _le_hex(F.lit(16), 4),             # fmt chunk size
        _le_hex(F.lit(1), 2),              # PCM
        _le_hex(channels, 2),
        _le_hex(rate, 4),
        _le_hex(byte_rate, 4),
        _le_hex(block, 2),
        _le_hex(bits, 2),
        F.lit("64617461"),                 # "data"
        _le_hex(data_size, 4),
    )
    media = d.select("doc_id", F.unhex(hex_payload).alias("payload"))
    return media.mapInPandas(
        _wav_batches,
        "doc_id long, fmt string, channels long, sample_rate long, "
        "bits long, n_samples long, duration_ms long",
    )


# --------------------------------------------------------------------------
# Real MP4 container walk: synthesize a minimal-but-structurally-valid
# ISO-BMFF box tree per document column-side (ftyp + moov/mvhd, sizes
# and fields hex-built from the text), then parse it back with a REAL
# pure-Python box walker inside mapInPandas — same pattern as
# `multimodal_image_probe` (PNG/JPEG/GIF) and `multimodal_audio_probe`
# (WAV/RIFF). The oracle recomputes (brand, timescale, duration_ms)
# straight from the text, so the walker must invert the synthesis
# exactly, integer division included.
# --------------------------------------------------------------------------
_MP4_TIMESCALE = 600
_MP4_UNITS_PER_CHAR = 24


def decode_video_real(payload: bytes) -> dict:
    """Walk top-level ISO-BMFF boxes (size + fourcc), read the major
    brand from `ftyp` and (timescale, duration) from `moov`/`mvhd`.
    Frame-level decode would plug ffmpeg here — callers only depend on
    the returned shape."""
    i, brand, timescale, duration = 0, None, None, None
    n = len(payload)
    while i + 8 <= n:
        size = int.from_bytes(payload[i : i + 4], "big")
        fourcc = payload[i + 4 : i + 8]
        if size < 8 or i + size > n:
            break
        body = payload[i + 8 : i + size]
        if fourcc == b"ftyp" and len(body) >= 4:
            brand = body[:4].decode("ascii", "replace")
        elif fourcc == b"moov":
            j = 0
            while j + 8 <= len(body):
                bsize = int.from_bytes(body[j : j + 4], "big")
                bcc = body[j + 4 : j + 8]
                if bsize < 8 or j + bsize > len(body):
                    break
                if bcc == b"mvhd":
                    full = body[j + 8 : j + bsize]
                    # version(1) flags(3) ctime(4) mtime(4) then
                    # timescale(4) duration(4) — v0 layout
                    if len(full) >= 20:
                        timescale = int.from_bytes(full[12:16], "big")
                        duration = int.from_bytes(full[16:20], "big")
                j += bsize
        i += size
    if brand is None or not timescale:
        raise ValueError("not an ISO-BMFF container (ftyp/moov missing)")
    return {
        "format": "mp4",
        "brand": brand,
        "timescale": timescale,
        "duration_ms": duration * 1000 // timescale,
    }


def _video_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [decode_video_real(bytes(b)) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "fmt": [m["format"] for m in metas],
                "brand": [m["brand"] for m in metas],
                "timescale": [m["timescale"] for m in metas],
                "duration_ms": [m["duration_ms"] for m in metas],
            }
        )


@operator(
    "multimodal_video_probe",
    oracle=f"""
    SELECT doc_id,
           'mp4' AS fmt,
           CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
           CAST({_MP4_TIMESCALE} AS BIGINT) AS timescale,
           CAST(n_chars * {_MP4_UNITS_PER_CHAR} * 1000
                // {_MP4_TIMESCALE} AS BIGINT) AS duration_ms
    FROM documents ORDER BY doc_id
    """,
)
def multimodal_video_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session_confs(spark)
    d = load_table(spark, sf_dir, "documents")
    brand_hex = F.when(
        F.col("doc_id") % 2 == 0, F.lit("69736F6D")  # 'isom'
    ).otherwise(F.lit("6D703432"))  # 'mp42'
    duration = F.col("n_chars") * _MP4_UNITS_PER_CHAR
    dur_hex = F.lpad(F.hex(duration.cast("bigint")), 8, "0")
    ts_hex = F.lpad(F.hex(F.lit(_MP4_TIMESCALE)), 8, "0")
    # ftyp box: size 16 = hdr(8) + brand(4) + minor(4)
    ftyp = F.concat(F.lit("00000010" + "66747970"), brand_hex, F.lit("00000000"))
    # mvhd full box, v0, truncated at duration: hdr(8) + 20 bytes body
    mvhd = F.concat(
        F.lit("0000001C" + "6D766864" + "00000000"  # version+flags
              + "00000000" + "00000000"),           # ctime, mtime
        ts_hex,
        dur_hex,
    )
    # moov box wrapping mvhd: size 8 + 28 = 36
    moov = F.concat(F.lit("00000024" + "6D6F6F76"), mvhd)
    payload = F.unhex(F.concat(ftyp, moov))
    pruned = d.select("doc_id", payload.alias("payload"))
    return (
        pruned.mapInPandas(
            _video_batches,
            schema=(
                "doc_id long, fmt string, brand string, "
                "timescale long, duration_ms long"
            ),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# ViT-style patch-grid plan: from each image's (w, h) dims (derived
# deterministically from the payload, same contract as the resize
# plan), the 16x16 patch tiling a vision encoder ingests — patch
# counts, right/bottom padding, and the transformer sequence length
# (patches + CLS). Pure column arithmetic over the metadata: at
# 100 TB this runs entirely on the pruned metadata projection; the
# payload bytes are never touched.
# --------------------------------------------------------------------------
_PATCH = 16


@operator(
    "multimodal_patch_grid",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
             1 + ord(substr(text, 1, 1)) AS w,
             1 + ord(substr(text, 2, 1)) AS h
      FROM documents
    )
    SELECT doc_id, w, h,
           CAST(ceil(w / {_PATCH}.0) AS BIGINT)  AS patches_x,
           CAST(ceil(h / {_PATCH}.0) AS BIGINT)  AS patches_y,
           CAST(ceil(w / {_PATCH}.0) * ceil(h / {_PATCH}.0) AS BIGINT)
                                                 AS n_patches,
           CAST(ceil(w / {_PATCH}.0) * {_PATCH} - w AS BIGINT) AS pad_right,
           CAST(ceil(h / {_PATCH}.0) * {_PATCH} - h AS BIGINT) AS pad_bottom,
           CAST(ceil(w / {_PATCH}.0) * ceil(h / {_PATCH}.0) + 1 AS BIGINT)
                                                 AS seq_len
    FROM dims ORDER BY doc_id
    """,
)
def multimodal_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session_confs(spark)
    d = load_table(spark, sf_dir, "documents")
    w = (1 + F.ascii(F.substring("text", 1, 1))).cast("long")
    h = (1 + F.ascii(F.substring("text", 2, 1))).cast("long")
    px = F.ceil(w / float(_PATCH)).cast("long")
    py = F.ceil(h / float(_PATCH)).cast("long")
    return (
        d.select(
            "doc_id",
            w.alias("w"),
            h.alias("h"),
            px.alias("patches_x"),
            py.alias("patches_y"),
            (px * py).alias("n_patches"),
            (px * _PATCH - w).alias("pad_right"),
            (py * _PATCH - h).alias("pad_bottom"),
            (px * py + 1).alias("seq_len"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Audio SAMPLE-DATA decode (not just the header): each document's WAV
# now carries a real PCM data chunk — int16 little-endian samples
# s_k = ((31*doc_id + 17*k) mod 65536) as unsigned bytes — and the
# Arrow kernel parses the bytes back (numpy frombuffer on the data
# chunk located by the verified header parse) to report exact
# integer waveform statistics: sample count, peak amplitude, energy
# (sum of squares) and RMS. The oracle recomputes the SAME waveform
# in closed form from the generator columns (UNNEST(range(n))), so
# byte-level decode correctness is checked end-to-end — the missing
# piece between header probes and a real codec (which this container
# cannot ship; the kernel's frombuffer slot is where soundfile/ffmpeg
# decode would drop in).
# Scale posture: payload synthesis and decode are both per-row within
# the scan stage; the kernel receives pruned (doc_id, payload)
# columns only, and stats are O(samples) per row with no shuffle.
# --------------------------------------------------------------------------
def _pcm_stats_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    out_ids, out_n, out_peak, out_ss = [], [], [], []
    for pdf in batches:
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(b)
            meta = parse_wav_header(raw)
            n = meta["n_samples"] * meta["channels"]
            data = raw[44:44 + 2 * n]
            s = np.frombuffer(data, dtype="<i2").astype(np.int64)
            out_ids.append(doc_id)
            out_n.append(int(s.size))
            out_peak.append(int(np.abs(s).max()) if s.size else 0)
            out_ss.append(int((s * s).sum()) if s.size else 0)
        yield pd.DataFrame(
            {
                "doc_id": out_ids,
                "n_samples_data": out_n,
                "peak_amplitude": out_peak,
                "energy": out_ss,
            }
        )
        out_ids, out_n, out_peak, out_ss = [], [], [], []


@operator(
    "multimodal_audio_rms",
    oracle="""
    WITH spec AS (
      SELECT doc_id,
             (100 + n_chars) * (1 + doc_id % 2) AS n
      FROM documents
    ),
    samples AS (
      SELECT doc_id, n,
             (31 * doc_id + 17 * UNNEST(range(n))) % 65536 AS v
      FROM spec
    ),
    signed AS (
      SELECT doc_id, n,
             CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
      FROM samples
    )
    SELECT doc_id,
           CAST(MAX(n) AS BIGINT)                AS n_samples_data,
           CAST(MAX(ABS(s)) AS BIGINT)           AS peak_amplitude,
           CAST(SUM(s * s) AS BIGINT)            AS energy,
           ROUND(sqrt(CAST(SUM(s * s) AS DOUBLE) / MAX(n)), 6) AS rms
    FROM signed GROUP BY doc_id ORDER BY doc_id
    """,
)
def multimodal_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session_confs(spark)
    d = load_table(spark, sf_dir, "documents")
    channels = (1 + F.col("doc_id") % 2).cast("int")
    rate = (8000 + 100 * F.ascii(F.substring("text", 1, 1))).cast("int")
    n_samples = (100 + F.col("n_chars")).cast("int")
    block = channels * 2
    data_size = n_samples * block
    byte_rate = rate * block
    # int16 LE sample stream: low byte first (hex digits 3-4, then 1-2)
    data_hex = F.expr(
        "array_join(transform(sequence(0, (100 + n_chars)"
        " * (1 + cast(doc_id % 2 as int)) - 1,"
        " 1), k -> concat("
        "substring(lpad(hex((31 * doc_id + 17 * k) % 65536), 4, '0'), 3, 2),"
        "substring(lpad(hex((31 * doc_id + 17 * k) % 65536), 4, '0'), 1, 2)"
        ")), '')"
    )
    hex_payload = F.concat(
        F.lit("52494646"),
        _le_hex(36 + data_size, 4),
        F.lit("57415645"),
        F.lit("666D7420"),
        _le_hex(F.lit(16), 4),
        _le_hex(F.lit(1), 2),
        _le_hex(channels, 2),
        _le_hex(rate, 4),
        _le_hex(byte_rate, 4),
        _le_hex(block, 2),
        _le_hex(F.lit(16), 2),
        F.lit("64617461"),
        _le_hex(data_size, 4),
        data_hex,
    )
    media = d.select("doc_id", F.unhex(hex_payload).alias("payload"))
    out = media.mapInPandas(
        _pcm_stats_batches,
        "doc_id long, n_samples_data long, peak_amplitude long, energy long",
    )
    return out.select(
        "doc_id", "n_samples_data", "peak_amplitude", "energy",
        F.round(
            F.sqrt(F.col("energy").cast("double") / F.col("n_samples_data")), 6
        ).alias("rms"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Real PIXEL-DATA decode — the PNG twin of multimodal_audio_rms: each
# document gets a fully VALID 8x8 greyscale PNG built in-JVM from
# column expressions (zlib stream as a stored-DEFLATE block, adler32
# computed as column math mod 65521, chunk CRCs via F.crc32 — the
# same ISO-HDLC polynomial PNG specifies), and the Arrow kernel
# decodes it for real: chunk walk, zlib.decompress (which VERIFIES
# the adler32), scanline unfilter, numpy pixel stats, CRC check. The
# oracle recomputes the deterministic pixel field in closed form —
# so a single wrong byte anywhere in the container fails the row.
# This closes the gap the image probes left open (headers only):
# synthesis AND byte-exact decode of a complete compressed container,
# with the zlib.decompress slot being exactly where a real libpng /
# Pillow decode drops in at production.
# Scale posture: all per-row inside the scan stage; the kernel sees
# only (doc_id, payload); no shuffle anywhere.
# --------------------------------------------------------------------------
def _png_pixel_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import binascii
    import zlib

    import numpy as np

    for pdf in batches:
        ids, ws, hs, npx, sums, mins, maxs, crcs = [], [], [], [], [], [], [], []
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(b)
            assert raw[:8] == b"\x89PNG\r\n\x1a\n"
            # chunk walk
            i = 8
            width = height = None
            idat = b""
            crc_ok = 1
            while i + 8 <= len(raw):
                ln = int.from_bytes(raw[i:i + 4], "big")
                typ = raw[i + 4:i + 8]
                data = raw[i + 8:i + 8 + ln]
                crc = int.from_bytes(raw[i + 8 + ln:i + 12 + ln], "big")
                if binascii.crc32(typ + data) != crc:
                    crc_ok = 0
                if typ == b"IHDR":
                    width = int.from_bytes(data[0:4], "big")
                    height = int.from_bytes(data[4:8], "big")
                elif typ == b"IDAT":
                    idat += data
                elif typ == b"IEND":
                    break
                i += 12 + ln
            scanlines = zlib.decompress(idat)  # verifies adler32
            px = np.frombuffer(scanlines, dtype=np.uint8).reshape(
                height, width + 1
            )
            assert (px[:, 0] == 0).all()  # filter type 0 per row
            pix = px[:, 1:].astype(np.int64)
            ids.append(doc_id)
            ws.append(width)
            hs.append(height)
            npx.append(int(pix.size))
            sums.append(int(pix.sum()))
            mins.append(int(pix.min()))
            maxs.append(int(pix.max()))
            crcs.append(crc_ok)
        yield pd.DataFrame(
            {
                "doc_id": ids, "width": ws, "height": hs,
                "n_pixels": npx, "sum_pixels": sums,
                "min_pixel": mins, "max_pixel": maxs, "crc_ok": crcs,
            }
        )


@operator(
    "multimodal_image_pixel_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id,
             (doc_id + 7 * (UNNEST(range(64)) % 8)
              + 13 * (UNNEST(range(64)) // 8)) % 256 AS v
      FROM documents
    )
    SELECT doc_id,
           CAST(8 AS BIGINT)        AS width,
           CAST(8 AS BIGINT)        AS height,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM(v) AS BIGINT)   AS sum_pixels,
           CAST(MIN(v) AS BIGINT)   AS min_pixel,
           CAST(MAX(v) AS BIGINT)   AS max_pixel,
           CAST(1 AS BIGINT)        AS crc_ok
    FROM px GROUP BY doc_id ORDER BY doc_id
    """,
)
def multimodal_image_pixel_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ensure_session_confs(spark)
    d = load_table(spark, sf_dir, "documents")
    # raw scanline stream: 8 rows of [filter 0][8 pixels]; pixel(x, y)
    # = (doc_id + 7x + 13y) % 256; positions i in 0..71, i%9==0 are
    # filter bytes
    pix_case = (
        "CASE WHEN i % 9 = 0 THEN 0 ELSE "
        "CAST((doc_id + 7 * ((i % 9) - 1) + 13 * (i div 9)) % 256 AS INT) END"
    )
    raw_hex = F.expr(
        f"array_join(transform(sequence(0, 71, 1),"
        f" i -> lpad(hex({pix_case}), 2, '0')), '')"
    )
    s1 = F.expr(
        f"(1 + aggregate(transform(sequence(0, 71, 1), i -> {pix_case}),"
        f" 0, (a, x) -> a + x)) % 65521"
    )
    s2 = F.expr(
        f"(72 + aggregate(transform(sequence(0, 71, 1),"
        f" i -> (72 - i) * ({pix_case})), 0, (a, x) -> a + x)) % 65521"
    )
    adler_hex = F.lpad(
        F.hex((s2.cast("bigint") * 65536 + s1).cast("bigint")), 8, "0"
    )
    # zlib: 7801 + stored block (01, LEN=72 LE, NLEN LE) + raw + adler
    z_hex = F.concat(F.lit("78010148 00B7FF".replace(" ", "")), raw_hex, adler_hex)
    ihdr_data_hex = F.lit("0000000800000008" + "08" + "00000000")
    ihdr_crc = F.lpad(
        F.hex(F.crc32(F.unhex(F.concat(F.lit("49484452"), ihdr_data_hex)))),
        8, "0",
    )
    idat_crc = F.lpad(
        F.hex(F.crc32(F.unhex(F.concat(F.lit("49444154"), z_hex)))), 8, "0"
    )
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A"),
        F.lit("0000000D"), F.lit("49484452"), ihdr_data_hex, ihdr_crc,
        F.lit("00000053"), F.lit("49444154"), z_hex, idat_crc,
        F.lit("00000000"), F.lit("49454E44"), F.lit("AE426082"),
    )
    media = d.select("doc_id", F.unhex(png_hex).alias("payload"))
    return media.mapInPandas(
        _png_pixel_batches,
        "doc_id long, width long, height long, n_pixels long, "
        "sum_pixels long, min_pixel long, max_pixel long, crc_ok long",
    ).orderBy("doc_id")
