"""Structured Streaming forms of the engine's operators.

The reference's "streaming" is Go channels (bounded pipeline,
processing/processing.go:136-154) - no event time, no late data.  These
jobs are the engine's extension to real streams: a document stream is
snapped incrementally with exactly-once sinks, and event streams get
watermarked windowed aggregation.  The batch and streaming paths share
the same operators (the kernel stage is a narrow map either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grid.tms import TileMatrixSet
from ..kernel.snap import SnapConfig
from ..operators.snap_tiles import assign_tiles, snap_documents


def document_rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic interleaved-document stream from the rate source;
    deterministic per doc index (same generator as the batch table)."""
    from ..sources.documents import DOCUMENTS_SCHEMA, build_document

    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = [build_document(int(v)) for v in pdf["value"]]
            yield pd.DataFrame({"doc_id": [r[0] for r in rows], "spans": [r[1] for r in rows]})

    return rate.select("value").mapInPandas(gen, schema=DOCUMENTS_SCHEMA)


def document_file_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Micro-batch ingest of the interleaved-document table from a
    parquet directory (the production shape: landed files become
    micro-batches; the checkpoint tracks consumed files for exactly-once
    across restarts)."""
    from ..sources.documents import DOCUMENTS_SCHEMA

    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def streaming_snap_tiles(
    docs_stream: DataFrame, tms: TileMatrixSet, tm_ids: list[int], config: SnapConfig | None = None
) -> DataFrame:
    """Incremental snap->tile assignment over a document stream.

    The kernel stage is stateless per document, so it runs unchanged
    under Structured Streaming; the result is append-mode tile rows.
    """
    geoms = (
        docs_stream.select("doc_id", F.posexplode("spans").alias("span_idx", "span"))
        .where(F.col("span.kind") == "geom")
        .select("doc_id", "span_idx", F.col("span.text").alias("wkt"))
    )
    snapped = snap_documents(geoms, tms, tm_ids, config)
    return assign_tiles(snapped, tms, tm_ids)


def streaming_hourly_rollup(events_stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup (late data beyond the watermark
    dropped); the batch twin is operators.events.hourly_rollup."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_cents")
    )


def run_stream_to_memory(
    stream_df: DataFrame, name: str, timeout_s: float = 30.0, output_mode: str = "append"
):
    """Drive a stream into an in-memory sink until timeout; returns query."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(processingTime="1 second")
        .start()
    )
    q.awaitTermination(timeout_s)
    return q


def events_file_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Micro-batch ingest of the events table from a parquet directory
    (same file-source semantics as :func:`document_file_stream`)."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def streaming_token_counts(docs_stream: DataFrame) -> DataFrame:
    """Streaming twin of operators.text.token_counts.

    The batch operator is a stateless whole-stage-codegen projection
    (no aggregation, no state), so it applies to a micro-batched stream
    UNCHANGED - each landed file of documents emits its token counts in
    append mode.  Parity with the batch path is asserted set-exactly in
    tests/test_plans_streaming.py.
    """
    from ..operators.text import token_counts

    return token_counts(docs_stream)


def streaming_hilbert_tiles(events_stream: DataFrame, zoom: int = 8) -> DataFrame:
    """Streaming twin of the `hilbert_tile_assign` query: incremental
    point->tile counts keyed by Hilbert d-index.

    tile_assign's groupBy becomes a streaming aggregation (complete /
    update mode); the Hilbert key is a stateless post-agg column, so the
    Arrow-batched kernel runs unchanged per micro-batch.  At scale the
    update-mode stream maintains one state row per live tile - bounded
    by the tile universe (4^zoom), not the event count.
    """
    from ..functions.udfs import hilbert_udf
    from ..operators import spatial_queries as sq

    base = sq.tile_assign(events_stream, zoom=zoom)
    return base.withColumn("cell_id", hilbert_udf(zoom)(F.col("tx"), F.col("ty")))


def rate_events_stream(spark: SparkSession, rows_per_second: int = 200, n_users: int = 20) -> DataFrame:
    """Synthetic event stream: rate source -> (user_id, ts, value)."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return rate.select(
        (F.col("value") % n_users).alias("user_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 100).cast("double").alias("value"),
    )


def streaming_sessionize(events_stream: DataFrame, gap_seconds: int = 30) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running session count with a gap rule - the streaming twin of
    operators.events.sessionize.

    State per user: (last_epoch, n_sessions, n_events).  Arbitrary
    stateful processing is the Structured Streaming escape hatch the
    reference has no analog for (its 'streams' are Go channels).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_sessions long, n_events long, last_epoch long"
    state_schema = "last_epoch long, n_sessions long, n_events long"

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            last_epoch, n_sessions, n_events = state.get
        else:
            last_epoch, n_sessions, n_events = None, 0, 0
        for pdf in pdfs:
            for ts in sorted(pdf["ts"]):
                epoch = int(pd.Timestamp(ts).timestamp())
                if last_epoch is None or epoch - last_epoch > gap_seconds:
                    n_sessions += 1
                n_events += 1
                last_epoch = epoch
        state.update((last_epoch if last_epoch is not None else 0, n_sessions, n_events))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
                "last_epoch": [last_epoch or 0],
            }
        )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_repetition_stats(docs_stream: DataFrame) -> DataFrame:
    """Streaming twin of operators.text.repetition_stats.

    The batch operator is per-row JVM array math with zero shuffle, so
    it applies to a micro-batched document stream UNCHANGED in append
    mode - the quality-filter front of an ingest pipeline.  Parity with
    the batch path is set-exact (tests/test_plans_streaming.py).
    """
    from ..operators.text import repetition_stats

    return repetition_stats(docs_stream)


def streaming_decontaminate(
    docs_stream: DataFrame, eval_ngrams: DataFrame, n: int = 3
) -> DataFrame:
    """Streaming contamination check: incoming documents against a
    STATIC eval n-gram set (a stream-static broadcast join - the shape
    real ingest uses, where the benchmark suite is a fixed side input).

    Differs from the batch `dedup.decontaminate` only in where the eval
    set comes from: batch derives it from a hash band of the same
    corpus; here it is a parameter (build it once with
    `eval_ngram_set`).  ONE streaming aggregation (joining two
    streaming aggregates is unsupported): each exploded n-gram is
    tagged by a broadcast left join against the eval set, then a single
    per-doc groupBy counts total and tagged together.  Run in update
    mode; each doc arrives in exactly one file, so every doc's row
    finalizes in its own micro-batch.
    """
    from pyspark.sql import functions as F

    from ..operators.dedup import _shingles

    tagged = _shingles(docs_stream, n).join(
        F.broadcast(eval_ngrams.withColumn("__hit", F.lit(1))), "shingle", "left"
    )
    n_shared = F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
    return tagged.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        n_shared.cast("long").alias("n_shared"),
        F.floor(F.lit(1000) * n_shared / F.count("*")).cast("long").alias("contam_x1000"),
    )


def eval_ngram_set(documents: DataFrame, n: int = 3, eval_mod: int = 50) -> DataFrame:
    """The static eval-band n-gram set used by streaming_decontaminate:
    identical band rule to the batch operator (id-hash % eval_mod == 0)."""
    from pyspark.sql import functions as F

    from ..operators.dedup import _shingles

    hv = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
    return _shingles(documents, n).where(hv % eval_mod == 0).select("shingle").distinct()


def streaming_asof_join(
    events_stream: DataFrame, left_type: str = "error", right_type: str = "click"
) -> DataFrame:
    """Streaming twin of operators.temporal.asof_join via
    applyInPandasWithState: per-user state is ONE row - the (epoch_us,
    event_id) of the latest ``right_type`` event seen - and every
    ``left_type`` row appends its match immediately.  O(1) state per
    user regardless of history length (the batch form's running-last
    window, made incremental).

    Exactly the batch tie rule: rows are processed sorted by (epoch_us,
    is-left, event_id), so an equal-time right event IS visible to the
    left event and the largest event_id wins among equal-time rights.
    Correct under event-time-ordered micro-batches (a time-partitioned
    log replayed file-by-file, as in the parity test); out-of-order
    arrival would need a watermark + reorder buffer in front.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "event_id long, user_id long, epoch_us long, match_event_id long, lag_us long"
    state_schema = "r_epoch long, r_id long"

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        r_epoch, r_id = state.get if state.exists else (None, None)
        out = {k: [] for k in ("event_id", "epoch_us", "match_event_id", "lag_us")}
        rows = []
        for pdf in pdfs:
            for ts, etype, eid in zip(pdf["ts"], pdf["event_type"], pdf["event_id"]):
                if etype == left_type or etype == right_type:
                    epoch = pd.Timestamp(ts).value // 1000
                    rows.append((epoch, 1 if etype == left_type else 0, int(eid)))
        for epoch, is_left, eid in sorted(rows):
            if is_left:
                out["event_id"].append(eid)
                out["epoch_us"].append(epoch)
                out["match_event_id"].append(r_id)
                out["lag_us"].append(None if r_epoch is None else epoch - r_epoch)
            else:
                r_epoch, r_id = epoch, eid
        if r_id is not None:
            state.update((r_epoch, r_id))
        if out["event_id"]:
            yield pd.DataFrame(
                {
                    "event_id": out["event_id"],
                    "user_id": [user_id] * len(out["event_id"]),
                    "epoch_us": out["epoch_us"],
                    "match_event_id": pd.array(out["match_event_id"], dtype="Int64"),
                    "lag_us": pd.array(out["lag_us"], dtype="Int64"),
                }
            )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_view_click_join(
    views_stream: DataFrame,
    clicks_stream: DataFrame,
    watermark: str = "30 seconds",
    max_span_seconds: int = 60,
) -> DataFrame:
    """Watermarked stream-stream interval join: each click matches the
    views of the same user within the preceding ``max_span_seconds``.

    Both sides carry a watermark and the join condition bounds event time
    in both directions, so Spark can size the join state and EVICT rows
    older than the watermark - a click arriving later than the watermark
    allows finds no retained view state and is dropped (asserted in
    tests/test_plans_streaming.py).  The batch twin is a plain interval
    join; this is the streaming surface the reference (Go channels) has
    no analog for.
    """
    v = views_stream.select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts"), F.col("page").alias("page")
    ).withWatermark("view_ts", watermark)
    c = clicks_stream.select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"), F.col("target").alias("target")
    ).withWatermark("click_ts", watermark)
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {max_span_seconds} SECONDS"))
    )
    return v.join(c, cond, "inner").select(
        F.col("v_user").alias("user_id"), "view_ts", "click_ts", "page", "target"
    )


def streaming_unigram_quality(docs_stream: DataFrame, unigram_counts: DataFrame) -> DataFrame:
    """Streaming LM-quality scoring: incoming documents scored against a
    STATIC unigram frequency table (stream-static broadcast join - the
    production shape: the unigram LM is trained offline on the corpus,
    then ingest scores each new document as it arrives).

    Differs from the batch `text.unigram_quality` only in where the
    counts come from: batch derives them from the same corpus; here
    they are a parameter (build once with `unigram_count_table`, which
    also carries the corpus total on every row so the stream side needs
    NO second aggregate or collect).  One streaming aggregation per doc
    (update mode; each doc arrives in one file, so its row finalizes in
    its own micro-batch).  Unknown tokens count 0 - a doc of
    never-seen tokens scores 0 ppm, same as batch gives cnt-1 gibberish
    ~0.
    """
    from pyspark.sql import functions as F

    toks = F.split(F.col("text"), " ")
    dt = docs_stream.select("doc_id", F.explode(toks).alias("term"))
    tagged = dt.join(F.broadcast(unigram_counts), "term", "left")
    sum_cnt = F.sum(F.coalesce(F.col("cnt"), F.lit(0)))
    return tagged.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        sum_cnt.cast("long").alias("sum_cnt"),
        # all-unknown doc: max(total_tokens) is NULL (no joined row) ->
        # div yields NULL -> coalesce to the 0 the docstring promises
        F.coalesce(
            F.expr(
                "CAST((1000000 * sum(coalesce(cnt, 0)))"
                " div (count(*) * max(total_tokens)) AS LONG)"
            ),
            F.lit(0).cast("long"),
        ).alias("score_ppm"),
    )


def unigram_count_table(documents: DataFrame) -> DataFrame:
    """The static (term, cnt, total_tokens) table streaming_unigram_quality
    scores against: identical counts to the batch operator's corpus pass,
    with the corpus total denormalized onto every row (a scalar join now
    so the stream side never needs one)."""
    from pyspark.sql import functions as F

    dt = documents.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
    cnt = dt.groupBy("term").agg(F.count("*").alias("cnt"))
    tot = dt.agg(F.count("*").alias("total_tokens"))
    return cnt.join(F.broadcast(tot))


def streaming_quality_funnel(docs_stream: DataFrame) -> DataFrame:
    """Streaming twin of operators.curation.quality_funnel: the running
    retention funnel over a document stream.

    The batch operator is one global aggregate of five cumulative
    conditional sums plus a stateless stack() to stage rows, so it runs
    on a micro-batched stream UNCHANGED in complete mode: Spark keeps a
    single 6-value state row (O(1) state regardless of stream length)
    and the funnel re-emits after every landed file - the live
    monitoring view of a filter chain during a multi-day 100 TB ingest.
    Parity with the batch operator is asserted in
    tests/test_plans_streaming.py with the corpus split across
    micro-batch files, so partial sums MUST merge across batches.
    """
    from ..operators.curation import quality_funnel

    return quality_funnel(docs_stream)


def streaming_sliding_chunks(docs_stream: DataFrame) -> DataFrame:
    """Streaming twin of operators.text.sliding_chunks: stateless
    per-row chunk fan-out (transform + slice + posexplode, no state, no
    shuffle), so it applies to a micro-batched document stream UNCHANGED
    in append mode - the shape of a live RAG-ingest chunker.  Parity
    with the batch operator is asserted set-exactly in
    tests/test_plans_streaming.py.
    """
    from ..operators.text import sliding_chunks

    return sliding_chunks(docs_stream)


def streaming_snapshot_dedup(docs_stream: DataFrame, old_docs: DataFrame) -> DataFrame:
    """Streaming twin of operators.dedup.snapshot_dedup: a LIVE crawl
    deduplicates against the previous snapshot as documents land.

    Stream-static LEFT ANTI join on the content hash (append mode, no
    state beyond the static side): each micro-batch of new documents is
    probed against the static old-snapshot hash table and only unseen
    content is emitted - the continuously-ingesting form of the batch
    anti-join, with the same output schema.  The static side carries
    hashes only (text never enters the join), so at 10^12 docs the probe
    side is a hash-keyed lookup, not a corpus scan per batch.  Parity
    with the batch operator is asserted in tests/test_plans_streaming.py
    with the new crawl split across micro-batch files.
    """
    old = old_docs.select(F.md5("text").alias("h"))
    new = docs_stream.select("doc_id", F.md5("text").alias("h"))
    return new.join(old, "h", "left_anti").select("doc_id", F.col("h").alias("text_hash"))


def streaming_validate_documents(docs_stream: DataFrame) -> DataFrame:
    """Streaming twin of operators.curation.validate_documents: the
    ingest validation gate as a LIVE health monitor - one global
    conditional-sum aggregate (complete mode, a single 6-value state
    row) re-emitting the violation report after every landed file, so a
    malformed crawl drop is visible the micro-batch it arrives instead
    of after a 100 TB batch pass.  The duplicate_doc_id check is
    batch-only by design: it is a global DISTINCT (state linear in
    ids), which streaming aggregation rightly refuses - the six
    remaining checks are per-row conditional sums with O(1) state.
    Parity asserted with the corpus split across micro-batch files
    (partial sums must merge).
    """
    from ..operators.curation import validate_documents

    return validate_documents(docs_stream, include_duplicates=False)


def streaming_tile_pyramid(events_stream: DataFrame, max_zoom: int = 8, min_zoom: int = 0) -> DataFrame:
    """Streaming twin of operators.spatial_queries.tile_pyramid_rollup:
    incremental overview-tile counts at EVERY zoom level from one
    update-mode aggregation (state bounded by the tile universe,
    sum of 4^z over the pyramid, not by event count) - the live form of
    overview building, where each micro-batch of points bumps its
    ancestors at all levels in the same shuffle.  Uses the single-
    aggregation form (per-point ancestor explode): the batch rollup's
    base pre-aggregation would be a SECOND stateful operator, which
    streaming rejects as a watermark-correctness hazard.
    """
    from ..operators import spatial_queries as sq

    return sq.tile_pyramid_rollup_single_agg(
        events_stream, max_zoom=max_zoom, min_zoom=min_zoom
    )
