"""Multimodal column plumbing (north-star layer, SURVEY.md §2.8).

Media assets are opaque `binary` columns plus typed metadata structs —
the layout a 100 TB training-data lake uses (parquet binary chunks,
partition-pruned by metadata, lazily decoded). The fixture has no real
media, so `documents.text` is encoded to bytes as a stand-in payload;
the Spark-side plumbing — binary schema, Arrow batch shape, mapInPandas
decode signature, metadata projection — is real and differentially
tested.

The actual codec step is STUBBED: `decode_image_stub` produces
deterministic pseudo-features from the bytes (the container has no
image/audio libraries). Swapping in a real decoder changes only the
function body — batch shape and schema stay identical — as marked by
NotImplementedError in `decode_image_real`.
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


def decode_image_real(payload: bytes) -> dict:
    """Real codec slot. Body intentionally unimplemented here."""
    raise NotImplementedError(
        "no media codecs in this environment; plug Pillow/ffmpeg here — "
        "callers only depend on the returned dict shape"
    )


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
