"""[EXT] Multimodal column plumbing: opaque binary payloads + typed
metadata, decoded via Arrow-batched pandas (mapInPandas).

The container has no image/audio libraries, so the *decode* is a
deterministic fake (documented below) — but every Spark-side piece is
real and tested: BinaryType columns, metadata structs, the
mapInPandas schema contract, Arrow batch shapes, and the partition
behavior (decode is per-row, embarrassingly parallel, no shuffle).
Swap `_fake_decode` for PIL/libav and nothing else changes.

Fake decode (deterministic, oracle-reproducible):
  width  = n_bytes % 640 + 1
  height = (n_bytes * 7) % 480 + 1
  content_md5 = md5(payload)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("content_md5", StringType()),
    ]
)


def as_media_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → multimodal table: payload = UTF-8 bytes of the text
    (stand-in for image bytes), plus a typed metadata struct. This is
    the storage contract: binary column + metadata, partition-prunable
    by the metadata fields."""
    payload = F.encode(F.col(text_col), "UTF-8").cast(BinaryType())
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("fake/v1").alias("format"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched fake decoder. Real decoders (PIL.Image.open on
    BytesIO, torchaudio.load, cv2.VideoCapture frame-sample) drop in
    here with the same Iterator[pd.DataFrame] -> Iterator shape."""
    import hashlib

    for pdf in batches:
        n = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n.astype("int64"),
                "width": (n % 640 + 1).astype("int64"),
                "height": (n * 7 % 480 + 1).astype("int64"),
                "content_md5": pdf["payload"].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
            }
        )


def decode_media(media: DataFrame) -> DataFrame:
    """Decode/feature-extract via mapInPandas — the Python hot path
    is Arrow-vectorized (one pandas frame per batch, never per-row
    pickling). No shuffle: decode runs where the bytes live."""
    return media.select("doc_id", "payload").mapInPandas(
        _fake_decode, schema=DECODED_SCHEMA
    )


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("frame_idx", LongType()),
    ]
)

MAX_FRAMES = 4


def _fake_sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame sampling for 'video' payloads (fake: n_frames derived
    from byte length; a real decoder would read container metadata —
    cv2.VideoCapture / PyAV drop in here, raising NotImplementedError
    until the libs exist). Emits up to MAX_FRAMES evenly spaced frame
    indices per doc — a 1→N mapInPandas, the batch shape a real
    frame sampler needs."""
    for pdf in batches:
        out_doc, out_nf, out_idx = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = len(payload) // 100 + 1
            k = min(MAX_FRAMES, n_frames)
            idxs = (
                [0]
                if k == 1
                else [(i * (n_frames - 1)) // (k - 1) for i in range(k)]
            )
            out_doc.extend([doc_id] * k)
            out_nf.extend([n_frames] * k)
            out_idx.extend(idxs)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "n_frames": pd.Series(out_nf, dtype="int64"),
                "frame_idx": pd.Series(out_idx, dtype="int64"),
            }
        )


def sample_frames(media: DataFrame) -> DataFrame:
    """Evenly-spaced frame sampling via mapInPandas (1 input row →
    k output rows). No shuffle — sampling happens where the bytes
    live."""
    return media.select("doc_id", "payload").mapInPandas(
        _fake_sample_frames, schema=FRAMES_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("src_width", LongType()),
        StructField("src_height", LongType()),
        StructField("dst_width", LongType()),
        StructField("dst_height", LongType()),
        StructField("resized_md5", StringType()),
    ]
)

#: Standard vision-model input size; the fake resize targets it.
RESIZE_TO = (224, 224)


def _fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Fake resize: source dims from the fake decode arithmetic,
    'resized bytes' checksum = md5 of the source checksum + target
    dims (deterministic, so an oracle reproduces it). A real
    implementation (PIL Image.resize / cv2.resize) drops into this
    exact Iterator[pd.DataFrame] shape, raising NotImplementedError
    until the libs exist in the image."""
    import hashlib

    w, h = RESIZE_TO
    for pdf in batches:
        n = pdf["payload"].map(len)
        src_md5 = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "src_width": (n % 640 + 1).astype("int64"),
                "src_height": (n * 7 % 480 + 1).astype("int64"),
                "dst_width": pd.Series([w] * len(pdf), dtype="int64"),
                "dst_height": pd.Series([h] * len(pdf), dtype="int64"),
                "resized_md5": src_md5.map(
                    lambda m: hashlib.md5(f"{m}:{w}x{h}".encode()).hexdigest()
                ),
            }
        )


def resize_media(media: DataFrame) -> DataFrame:
    """Resize stage of the multimodal pipeline via mapInPandas —
    Arrow-batched, no shuffle (resize runs where the bytes live)."""
    return media.select("doc_id", "payload").mapInPandas(
        _fake_resize, schema=RESIZED_SCHEMA
    )


def media_feature_summary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """End-to-end multimodal pipeline: build media table → decode via
    pandas batches → join metadata back → aggregate by origin."""
    media = as_media_table(docs, text_col)
    decoded = decode_media(media)
    joined = decoded.join(
        media.select("doc_id", F.col("meta.origin").alias("origin")), "doc_id"
    )
    return (
        joined.groupBy("origin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.round(F.avg(F.col("width").cast("double")), 6).alias("avg_width"),
            F.round(F.avg(F.col("height").cast("double")), 6).alias("avg_height"),
            F.min("content_md5").alias("md5_min"),
        )
    )
