"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus typed metadata — the
bytes never participate in a shuffle key and are column-pruned away
by Catalyst unless a stage actually touches them (mirrors the span
model's media_ref-not-bytes rule, SURVEY §1.2).

The actual codecs (PIL/ffmpeg/soundfile) are not in this container,
so decode is a **deterministic fake** behind ``DecodeStub`` — the
Spark-side contract (schemas, mapInPandas batch shapes, partitioning,
error rows) is real and tested; swapping in a real codec is a
one-function change inside the UDF.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("media_ref", StringType(), False),
    StructField("media_type", StringType(), False),   # image|audio|video
    StructField("content", BinaryType(), True),
    StructField("n_bytes", LongType(), False),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("media_ref", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_channels", IntegerType(), True),
    StructField("embedding", ArrayType(FloatType()), True),
    StructField("decode_error", StringType(), True),
])

FRAME_SAMPLE_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("media_ref", StringType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame_ts_ms", LongType(), False),
    StructField("frame", BinaryType(), True),
])

EMBED_DIM = 16


class DecodeStub:
    """Deterministic stand-in for a real image/audio decoder.

    Interprets the first 12 bytes of content as a fake header
    (width:int32, height:int32, channels:int32 little-endian); raises
    on short/absent payloads exactly like a real decoder would on a
    truncated file. Replace ``decode_image``/``iter_frames`` with
    PIL/ffmpeg calls in production — nothing outside this class
    changes.
    """

    @staticmethod
    def pack_header(width: int, height: int, channels: int,
                    payload: bytes = b"") -> bytes:
        return struct.pack("<iii", width, height, channels) + payload

    @staticmethod
    def decode_image(content: bytes) -> tuple[int, int, int]:
        if content is None or len(content) < 12:
            raise ValueError("truncated media payload")
        w, h, c = struct.unpack("<iii", content[:12])
        if w <= 0 or h <= 0 or c not in (1, 3, 4):
            raise ValueError(f"invalid header ({w}x{h}x{c})")
        return w, h, c

    @staticmethod
    def embed(content: bytes, dim: int = EMBED_DIM) -> list[float]:
        # deterministic pseudo-embedding from the payload digest
        dg = hashlib.sha256(content).digest()
        raw = [int.from_bytes(dg[2 * i:2 * i + 2], "little") / 65535.0 - 0.5
               for i in range(dim)]
        norm = max(sum(x * x for x in raw) ** 0.5, 1e-12)
        return [float(x / norm) for x in raw]

    @staticmethod
    def n_frames(content: bytes) -> int:
        w, h, c = DecodeStub.decode_image(content)
        return max(1, len(content[12:]) // max(w * c, 1))


def extract_image_features(media: DataFrame,
                           embed_dim: int = EMBED_DIM) -> DataFrame:
    """MEDIA_SCHEMA rows -> IMAGE_FEATURES_SCHEMA via mapInPandas.

    Per-row decode failures become error rows (never task failures) —
    the A4 never-throw rule applied to media.
    """
    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, ref, content in zip(pdf["doc_id"], pdf["media_ref"],
                                            pdf["content"]):
                try:
                    w, h, c = DecodeStub.decode_image(content)
                    emb = DecodeStub.embed(bytes(content), embed_dim)
                    rows.append((doc_id, ref, w, h, c, emb, None))
                except Exception as e:  # noqa: BLE001 — tallied, not raised
                    rows.append((doc_id, ref, None, None, None, None, str(e)))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_FEATURES_SCHEMA.fields])

    return media.filter(F.col("media_type") == "image").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 8) -> DataFrame:
    """Video -> sampled frame rows (fan-out generator via mapInPandas;
    one input row yields <= max_frames output rows)."""
    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, ref, content in zip(pdf["doc_id"], pdf["media_ref"],
                                            pdf["content"]):
                try:
                    n = min(DecodeStub.n_frames(bytes(content)), max_frames)
                except Exception:
                    continue
                for i in range(n):
                    rows.append((doc_id, ref, i, i * every_ms,
                                 bytes(content[12:]) or None))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              FRAME_SAMPLE_SCHEMA.fields])

    return media.filter(F.col("media_type") == "video").mapInPandas(
        run, schema=FRAME_SAMPLE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """(media_type, n_items, total_bytes, max_bytes) — pure built-ins;
    the bytes column is pruned (only n_bytes read)."""
    return (
        media.groupBy("media_type")
        .agg(F.count("*").cast("long").alias("n_items"),
             F.sum("n_bytes").cast("long").alias("total_bytes"),
             F.max("n_bytes").cast("long").alias("max_bytes"))
    )


def synthesize_media(docs: DataFrame, modulo: int = 3,
                     corrupt_every: int | None = None) -> DataFrame:
    """Derive a deterministic MEDIA_SCHEMA table from a documents
    table (for tests/bench: every doc_id % modulo == 0 gets one fake
    image whose pixels are seeded by the doc text digest).

    ``corrupt_every=k`` truncates the payload of every doc_id % k == 0
    row below the 12-byte header — a deterministic decode-error tier
    so the never-throw error path (A4 rule) is exercised and
    oracle-checkable."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if int(doc_id) % modulo != 0:
                    continue
                dg = hashlib.sha256(str(text).encode()).digest()
                w = 4 + dg[0] % 60
                h = 4 + dg[1] % 60
                payload = (dg * ((w * 3) // len(dg) + 1))[: w * 3]
                content = DecodeStub.pack_header(w, h, 3, payload)
                if corrupt_every and int(doc_id) % corrupt_every == 0:
                    content = content[:8]   # < header size -> decode error
                rows.append((str(doc_id), f"img://{doc_id}", "image",
                             content, len(content)))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              MEDIA_SCHEMA.fields])

    return docs.select("doc_id", "text").mapInPandas(gen, schema=MEDIA_SCHEMA)
