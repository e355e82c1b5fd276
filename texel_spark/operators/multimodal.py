"""Multimodal span handling: media columns as opaque binary + typed metadata.

Media spans carry ``media_ref`` URIs; at 100 TB the bytes live in object
storage and flow through Spark as ``binary`` columns with decode /
feature-extract / resize / frame-sample as Arrow-batched stages.  The
image/audio codecs are not available in this container, so the decode
step is a clearly marked deterministic STUB - the Spark-side plumbing
(schema, batch shape, partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.documents import explode_spans

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("media_ref", StringType()),
        StructField("media_kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def media_spans(docs: DataFrame) -> DataFrame:
    """Media-carrying spans with a deterministic fake payload.

    STUB: the payload is a seeded byte string derived from the media_ref
    (real deployments read the object-store bytes here); everything
    downstream treats it as opaque binary, exactly like production.
    """
    spans = explode_spans(docs).where(F.col("kind") == "media")
    payload = F.sha2(F.col("media_ref"), 256).cast("binary")
    kind = F.regexp_extract("media_ref", r"^([a-z]+)://", 1)
    return spans.select(
        "doc_id",
        "span_idx",
        "media_ref",
        kind.alias("media_kind"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract as a mapInPandas stage (Arrow batches).

    STUB decode: dimensions and a 16-d embedding are derived
    deterministically from the payload bytes.  Swap `_fake_decode` for a
    real codec (PIL/ffmpeg) without touching the Spark plumbing; raises
    NotImplementedError for media kinds a real codec stack would need.
    """

    def _fake_decode(payload: bytes, kind: str):
        if kind not in ("img", "aud", "vid"):
            raise NotImplementedError(f"no codec for media kind {kind!r}")
        import numpy as np

        b = np.frombuffer(payload[:16], dtype=np.uint8).astype(np.float32)
        w = 64 + int(payload[0]) % 192
        h = 64 + int(payload[1]) % 192
        emb = (b / 255.0).tolist()
        return w, h, emb

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, embs = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["media_kind"]):
                w, h, emb = _fake_decode(bytes(payload), kind)
                ws.append(w)
                hs.append(h)
                embs.append(emb)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_idx": pdf["span_idx"],
                    "media_ref": pdf["media_ref"],
                    "width": ws,
                    "height": hs,
                    "embedding": embs,
                }
            )

    return media.mapInPandas(stage, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("media_ref", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, fps: float = 1.0, max_frames: int = 8) -> DataFrame:
    """Frame-sampling stage for video spans: one output row per sampled
    frame, Arrow-batched (the 100 TB shape: a video span fans out to a
    bounded number of frame rows, each an opaque binary column).

    STUB decode: the "video duration" and frame bytes derive
    deterministically from the payload (real deployments run ffmpeg
    here); the fan-out bound, schema and batch shape are production-real.
    """
    vids = media.where(F.col("media_kind") == "vid")

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "span_idx", "media_ref", "frame_idx", "ts_ms", "frame")}
            for doc_id, span_idx, ref, payload in zip(
                pdf["doc_id"], pdf["span_idx"], pdf["media_ref"], pdf["payload"]
            ):
                raw = bytes(payload)
                duration_ms = 1000 + int.from_bytes(raw[:2], "big") % 30000
                n = min(max_frames, max(1, int(duration_ms / 1000.0 * fps)))
                step = duration_ms // n
                for k in range(n):
                    out["doc_id"].append(doc_id)
                    out["span_idx"].append(int(span_idx))
                    out["media_ref"].append(ref)
                    out["frame_idx"].append(k)
                    out["ts_ms"].append(k * step)
                    out["frame"].append(hashlib.sha256(raw + k.to_bytes(4, "big")).digest())
            yield pd.DataFrame(out)

    return vids.mapInPandas(stage, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("span_idx", IntegerType()),
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)


def resize_media(media: DataFrame, target: int = 224) -> DataFrame:
    """Decode + resize-to-square stage for image spans (mapInPandas).

    STUB: emits a deterministic target*target/64-byte fake pixel buffer
    per image (a real deployment decodes + resamples here); the byte
    volume scales with the target like a real resize, so the stage's
    shuffle/memory shape is honest.
    """
    imgs = media.where(F.col("media_kind") == "img")

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        n_bytes = max(1, target * target // 64)
        for pdf in batches:
            pixels = []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                buf = bytearray()
                seed = raw
                while len(buf) < n_bytes:
                    seed = hashlib.sha256(seed).digest()
                    buf.extend(seed)
                pixels.append(bytes(buf[:n_bytes]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_idx": pdf["span_idx"],
                    "media_ref": pdf["media_ref"],
                    "width": target,
                    "height": target,
                    "pixels": pixels,
                }
            )

    return imgs.mapInPandas(stage, schema=RESIZED_SCHEMA)


def media_stats(docs: DataFrame) -> DataFrame:
    """Per media kind: span count, docs touched, byte volume."""
    m = media_spans(docs)
    return m.groupBy("media_kind").agg(
        F.count("*").alias("n_spans"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
    )
