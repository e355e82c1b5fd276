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

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            kinds = pdf["media_kind"].to_numpy()
            bad = ~np.isin(kinds, ("img", "aud", "vid"))
            if bad.any():
                raise NotImplementedError(f"no codec for media kind {kinds[bad][0]!r}")
            raws = [bytes(p) for p in pdf["payload"]]
            # whole-batch stub decode: one contiguous (n, 16) byte matrix,
            # all dimension/embedding math as numpy array programs.  The
            # per-row residue is only byte marshalling - a real codec
            # (PIL/ffmpeg, absent in this container) slots in where the
            # matrix is built, and the columnar emit stays as-is.
            lens = np.fromiter((len(r) for r in raws), dtype=np.int64, count=len(raws))
            # <2 bytes: the documented scalar formula reads payload[0]
            # (width) and payload[1] (height); a 1-byte payload must not
            # silently report the zero pad as height 64 (ADVICE r4)
            if len(raws) and lens.min() < 2:
                raise ValueError("media payload shorter than 2 bytes (width/height seed)")
            head = b"".join(r[:16].ljust(16, b"\x00") for r in raws)
            mat = np.frombuffer(head, dtype=np.uint8).reshape(len(raws), 16)
            emb = mat.astype(np.float32) / np.float32(255.0)
            if (lens >= 16).all():
                embs = list(emb)
            else:
                # degenerate short payloads keep their true length, same
                # as the scalar np.frombuffer(payload[:16]) did
                embs = [e[:l] for e, l in zip(emb, np.minimum(lens, 16))]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_idx": pdf["span_idx"],
                    "media_ref": pdf["media_ref"],
                    "width": 64 + (mat[:, 0].astype(np.int64) % 192),
                    "height": 64 + (mat[:, 1].astype(np.int64) % 192),
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

        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            raws = [bytes(p) for p in pdf["payload"]]
            # whole-batch fan-out math in numpy index space; only the
            # stub decode (sha256 per frame) stays per-row - that's the
            # line a real codec replaces
            # matches int.from_bytes(raw[:2], "big") for EVERY length,
            # including the degenerate 1-byte payload (== raw[0]) and
            # empty (== 0), so frame counts/timestamps are length-stable
            prefix = np.array(
                [(r[0] << 8) | r[1] if len(r) >= 2 else (r[0] if r else 0) for r in raws],
                dtype=np.int64,
            )
            dur = 1000 + prefix % 30000
            n = np.minimum(max_frames, np.maximum(1, (dur / 1000.0 * fps).astype(np.int64)))
            step = dur // n
            rep = np.repeat(np.arange(len(n)), n)
            idx = np.arange(int(n.sum())) - np.repeat(np.cumsum(n) - n, n)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[rep],
                    "span_idx": pdf["span_idx"].to_numpy()[rep].astype("int32"),
                    "media_ref": pdf["media_ref"].to_numpy()[rep],
                    "frame_idx": idx.astype("int32"),
                    "ts_ms": idx * step[rep],
                    "frame": [
                        hashlib.sha256(raws[r] + int(k).to_bytes(4, "big")).digest()
                        for r, k in zip(rep, idx)
                    ],
                }
            )

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
        n_iters = -(-n_bytes // 32)  # sha256 chain links per buffer

        def fake_pixels(raw: bytes) -> bytes:
            # stub decode+resample: the ONLY per-row work; a real codec
            # (PIL/cv2, absent in this container) slots in here and the
            # surrounding emit stays columnar
            seed, chunks = raw, []
            for _ in range(n_iters):
                seed = hashlib.sha256(seed).digest()
                chunks.append(seed)
            return b"".join(chunks)[:n_bytes]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_idx": pdf["span_idx"],
                    "media_ref": pdf["media_ref"],
                    "width": target,
                    "height": target,
                    "pixels": [fake_pixels(bytes(p)) for p in pdf["payload"]],
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


def interleaved_text(docs: DataFrame) -> DataFrame:
    """Extract each interleaved document's text channel: the text spans
    concatenated in offset order - the bridge that lets every text-side
    operator (token_counts, langid_ngram, chunk_dedup, quality_funnel,
    ...) run over the interleaved text+media corpus the north rule
    describes, without the media/geometry spans ever entering those
    plans.

    Pure per-row JVM array math (filter -> (offset, text) structs ->
    array_sort -> join): no shuffle, no Python workers, and the sort is
    per-document (span-count-sized), so it fuses into any downstream
    scan at 100 TB.  Offset order is applied defensively rather than
    assuming array order (the span-sequence invariant guarantees
    arrays arrive ordered, but a re-partitioned/re-written table keeps
    the offsets authoritative).
    """
    text_spans = F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text"))
    ordered = F.array_sort(
        F.transform(text_spans, lambda s: F.struct(s["offset"].alias("o"), s["text"].alias("t")))
    )
    return docs.select(
        "doc_id",
        F.array_join(F.transform(ordered, lambda p: p["t"]), " ").alias("text"),
        F.size(text_spans).alias("n_text_spans"),
    )


def modality_mix(docs: DataFrame) -> DataFrame:
    """Per-document modality profile of the interleaved corpus: span
    counts per kind, text length, and the text share in permille - the
    screen a multimodal curation pass runs FIRST (drop media-only shells
    or text-only pages before the expensive per-modality stages).

    Integer outputs only; per-row JVM expressions, no shuffle.
    """
    spans = F.col("spans")
    n_text = F.size(F.filter(spans, lambda s: s["kind"] == F.lit("text")))
    n_media = F.size(F.filter(spans, lambda s: s["kind"] == F.lit("media")))
    n_geom = F.size(F.filter(spans, lambda s: s["kind"] == F.lit("geom")))
    text_chars = F.aggregate(
        F.filter(spans, lambda s: s["kind"] == F.lit("text")),
        F.lit(0),
        lambda acc, s: acc + F.length(s["text"]),
    )
    return docs.select(
        "doc_id",
        F.size(spans).alias("n_spans"),
        n_text.alias("n_text_spans"),
        n_media.alias("n_media_spans"),
        n_geom.alias("n_geom_spans"),
        text_chars.alias("text_chars"),
        F.floor(F.lit(1000) * n_text / F.greatest(F.size(spans), F.lit(1)))
        .cast("long")
        .alias("text_span_permille"),
    )


_MATERIALIZED_INTERLEAVED: set[tuple[str, int]] = set()


def materialized_interleaved(spark, n_docs: int = 400):
    """Materialize the deterministic synth interleaved corpus to the
    shared oracle scratch dir (same TEXEL_SPARK_ORACLE_SCRATCH override
    + atexit cleanup as the snap bbox oracle) and re-read it, so a
    DuckDB oracle can verify the interleaved bridge hash-exactly on the
    identical rows.

    Written AT MOST ONCE per (path, n_docs) per process: six query
    lambdas share this corpus, and an overwrite between a reader's
    construction and its collect would delete the part files that
    reader already listed (fresh UUID names every write) - besides
    re-running the synth job 6x for byte-identical deterministic data.
    """
    import os

    from ..sources.documents import synth_documents
    from .snap_tiles import BBOX_ORACLE_DIR

    path = os.path.join(BBOX_ORACLE_DIR, "interleaved_docs")
    key = (path, n_docs)
    if key not in _MATERIALIZED_INTERLEAVED:
        synth_documents(spark, n_docs, partitions=8).write.mode("overwrite").parquet(path)
        _MATERIALIZED_INTERLEAVED.add(key)
    return spark.read.parquet(path)


def _interleaved_docs_ctes() -> str:
    import os

    from .snap_tiles import BBOX_ORACLE_DIR

    path = os.path.join(BBOX_ORACLE_DIR, "interleaved_docs")
    return f"""
docs AS (SELECT * FROM read_parquet('{path}/*.parquet')),
ex AS (
  SELECT doc_id, u.s.kind AS kind, u.s.text AS stext,
         u.s.media_ref AS media_ref, u.s."offset" AS off
  FROM docs, UNNEST(docs.spans) AS u(s)
)"""


def interleaved_text_sql() -> str:
    return f"""
WITH {_interleaved_docs_ctes()}
SELECT d.doc_id,
       coalesce(string_agg(e.stext, ' ' ORDER BY e.off)
                FILTER (WHERE e.kind = 'text'), '') AS text,
       CAST(count(*) FILTER (WHERE e.kind = 'text') AS INTEGER) AS n_text_spans
FROM docs d JOIN ex e USING (doc_id)
GROUP BY d.doc_id
"""


def modality_mix_sql() -> str:
    return f"""
WITH {_interleaved_docs_ctes()}
SELECT doc_id,
       CAST(count(*) AS INTEGER) AS n_spans,
       CAST(count(*) FILTER (WHERE kind = 'text') AS INTEGER) AS n_text_spans,
       CAST(count(*) FILTER (WHERE kind = 'media') AS INTEGER) AS n_media_spans,
       CAST(count(*) FILTER (WHERE kind = 'geom') AS INTEGER) AS n_geom_spans,
       CAST(coalesce(sum(len(stext)) FILTER (WHERE kind = 'text'), 0) AS INTEGER) AS text_chars,
       CAST(FLOOR(1000 * count(*) FILTER (WHERE kind = 'text') / count(*)) AS BIGINT)
           AS text_span_permille
FROM ex
GROUP BY doc_id
"""


def media_stats_sql() -> str:
    """DuckDB oracle for media_stats over the scratch-materialized
    corpus.  The payload stub is sha2-hex cast to binary, so its byte
    length is the hex-string length - replicated as len(sha256(ref))."""
    return f"""
WITH {_interleaved_docs_ctes()}
SELECT regexp_extract(media_ref, '^([a-z]+)://', 1) AS media_kind,
       count(*) AS n_spans,
       count(DISTINCT doc_id) AS n_docs,
       CAST(SUM(len(sha256(media_ref))) AS BIGINT) AS total_bytes
FROM ex
WHERE kind = 'media'
GROUP BY 1
"""


def _media_ex_sql() -> str:
    """Shared media-span CTE tail: the stub payload is the UTF-8 bytes
    of the sha256 hex string, so payload byte k == ascii(hex char k+1) -
    which lets DuckDB replicate the Arrow stages' byte math exactly."""
    return f"""
{_interleaved_docs_ctes()},
med AS (
  SELECT doc_id, CAST(off AS INTEGER) AS span_idx, media_ref,
         regexp_extract(media_ref, '^([a-z]+)://', 1) AS media_kind,
         ascii(substr(sha256(media_ref), 1, 1)) AS b0,
         ascii(substr(sha256(media_ref), 2, 1)) AS b1
  FROM ex WHERE kind = 'media'
)"""


def media_features_sql() -> str:
    """Oracle for extract_media_features minus the float embedding (the
    registered query drops it): width/height are payload bytes 0/1 -
    i.e. the first two sha256 hex chars' ASCII codes - mod 192 + 64."""
    return f"""
WITH {_media_ex_sql()}
SELECT doc_id, span_idx, media_ref,
       CAST(64 + b0 % 192 AS INTEGER) AS width,
       CAST(64 + b1 % 192 AS INTEGER) AS height
FROM med
"""


def media_frame_sample_sql(fps: float = 1.0, max_frames: int = 8) -> str:
    """Oracle for sample_frames minus the binary frame column: duration
    = 1000 + (payload 2-byte big-endian prefix) % 30000, frame count =
    clamp(duration*fps/1000) to [1, max_frames], timestamps = idx *
    (duration // n)."""
    return f"""
WITH {_media_ex_sql()},
vid AS (
  SELECT doc_id, span_idx, media_ref,
         1000 + (b0 * 256 + b1) % 30000 AS dur
  FROM med WHERE media_kind = 'vid'
), nf AS (
  SELECT *, LEAST({max_frames}, GREATEST(1, CAST(FLOOR(dur / 1000.0 * {fps}) AS BIGINT))) AS n
  FROM vid
)
SELECT doc_id, span_idx, media_ref,
       CAST(i AS INTEGER) AS frame_idx,
       CAST(i * (dur // n) AS BIGINT) AS ts_ms
FROM nf, UNNEST(range(n)) AS u(i)
"""


def media_resize_sql(target: int = 64) -> str:
    """Oracle for resize_media minus the pixel buffer: image spans only,
    constant target dimensions."""
    return f"""
WITH {_media_ex_sql()}
SELECT doc_id, span_idx, media_ref,
       CAST({target} AS INTEGER) AS width,
       CAST({target} AS INTEGER) AS height
FROM med WHERE media_kind = 'img'
"""
