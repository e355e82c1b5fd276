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


def media_stats(docs: DataFrame) -> DataFrame:
    """Per media kind: span count, docs touched, byte volume."""
    m = media_spans(docs)
    return m.groupBy("media_kind").agg(
        F.count("*").alias("n_spans"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
    )
