"""Physical-plan guarantees + Structured Streaming smoke tests.

The plan assertions are the codified version of the scale review: filters
and pruning reach the scan, small sides broadcast, the flagship pipeline
stays single-shuffle.
"""

import time

import pytest

pyspark = pytest.importorskip("pyspark")

from texel_spark.plans.checks import (
    assert_broadcast_join,
    assert_max_shuffles,
    assert_no_python_stage,
    assert_pushed_read_schema,
    assert_whole_stage_codegen,
    count_exchanges,
)


@pytest.fixture(scope="module")
def spark():
    from texel_spark.session import get_spark

    return get_spark(app_name="texel-plan-tests", master="local[4]", shuffle_partitions=4)


SF = "/root/testdata/sf0.001"


def test_text_stats_prunes_scan(spark):
    from texel_spark.operators.text import text_stats

    df = text_stats(spark.read.parquet(f"{SF}/documents.parquet"))
    # only the used columns reach the parquet reader
    assert_pushed_read_schema(df, ["text", "lang", "doc_id"], ["source", "n_chars"])
    assert_whole_stage_codegen(df)


def test_pip_join_broadcasts_and_is_shuffle_free(spark):
    from texel_spark.operators.spatial_queries import pip_join

    df = pip_join(
        spark.read.parquet(f"{SF}/events.parquet"), spark.read.parquet(f"{SF}/nation.parquet")
    )
    assert_broadcast_join(df)
    # equi-join on tile key with a broadcast small side: zero shuffles
    assert_max_shuffles(df, 0)


def test_snap_pipeline_is_narrow(spark):
    """The flagship plan has NO shuffle before the sink repartition."""
    from texel_spark.grid.tms import load_embedded
    from texel_spark.operators.snap_tiles import snap_pipeline_df
    from texel_spark.sources.documents import synth_documents

    docs = synth_documents(spark, 50, partitions=2)
    df = snap_pipeline_df(docs, load_embedded("NetherlandsRDNewQuad"), [5, 9])
    assert count_exchanges(df) == 0
    assert_broadcast_join(df)  # grid constants join is broadcast


def test_tile_assign_pushes_column_pruning(spark):
    from texel_spark.operators.spatial_queries import tile_assign

    df = tile_assign(spark.read.parquet(f"{SF}/events.parquet"))
    assert_pushed_read_schema(df, ["event_id"], ["props", "value", "user_id"])


def test_streaming_snap_tiles(spark):
    from texel_spark.grid.tms import load_embedded
    from texel_spark.kernel.snap import SnapConfig
    from texel_spark.streaming.jobs import document_rate_stream, streaming_snap_tiles

    stream = document_rate_stream(spark, rows_per_second=200)
    tiles = streaming_snap_tiles(
        stream, load_embedded("NetherlandsRDNewQuad"), [5, 9], SnapConfig(ignore_outside_grid=True)
    )
    assert tiles.isStreaming
    q = (
        tiles.writeStream.format("memory")
        .queryName("stream_tiles")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM stream_tiles").collect()[0]["c"]
            if n > 0:
                break
            time.sleep(1)
        assert n > 0, "stream produced no tile rows within 60s"
        sample = spark.sql("SELECT * FROM stream_tiles LIMIT 5").collect()
        assert {r["zoom"] for r in sample} <= {5, 9}
    finally:
        q.stop()


def test_streaming_stateful_sessionize(spark):
    import time as _time

    from texel_spark.streaming.jobs import rate_events_stream, streaming_sessionize

    stream = rate_events_stream(spark, rows_per_second=100, n_users=5)
    sess = streaming_sessionize(stream, gap_seconds=3600)
    assert sess.isStreaming
    q = (
        sess.writeStream.format("memory")
        .queryName("stream_sessions")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = _time.time() + 60
        rows = []
        while _time.time() < deadline:
            rows = spark.sql(
                "SELECT user_id, max(n_events) n FROM stream_sessions GROUP BY user_id"
            ).collect()
            if len(rows) == 5 and all(r["n"] > 2 for r in rows):
                break
            _time.sleep(1)
        assert len(rows) == 5, f"expected 5 users, got {rows}"
        # rate events arrive within one gap -> exactly one session per user
        max_sess = spark.sql("SELECT max(n_sessions) m FROM stream_sessions").collect()[0]["m"]
        assert max_sess == 1
    finally:
        q.stop()


def test_file_stream_checkpoint_recovery(spark, tmp_path):
    """Kill-and-restart exactly-once: a file-source document stream with a
    checkpoint processes batch 1, stops, new files land, a NEW query
    restarted from the same checkpoint processes ONLY the new files - no
    row from batch 1 is re-emitted (the resume contract of the north
    rule, file-source edition)."""
    from pyspark.sql import functions as F

    from texel_spark.grid.tms import load_embedded
    from texel_spark.sources.documents import DOCUMENTS_SCHEMA, build_document
    from texel_spark.streaming.jobs import document_file_stream, streaming_snap_tiles

    indir, outdir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")

    def land(lo, hi, fname):
        rows = [build_document(i) for i in range(lo, hi)]
        spark.createDataFrame(rows, DOCUMENTS_SCHEMA).coalesce(1).write.mode("append").parquet(indir)

    rd = load_embedded("NetherlandsRDNewQuad")

    def run_once():
        stream = streaming_snap_tiles(document_file_stream(spark, indir), rd, [5, 9])
        q = (
            stream.writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    land(0, 25, "b1")
    run_once()
    out1 = spark.read.parquet(outdir)
    n1 = out1.count()
    assert n1 > 0
    docs1 = {r["doc_id"] for r in out1.select("doc_id").distinct().collect()}

    land(25, 50, "b2")
    run_once()  # restart from the same checkpoint
    out2 = spark.read.parquet(outdir).cache()
    # batch-1 rows appear EXACTLY once (counts unchanged for those docs)
    n1_after = out2.where(F.col("doc_id").isin(*docs1)).count()
    assert n1_after == n1, f"batch 1 reprocessed: {n1} -> {n1_after}"
    # batch-2 docs arrived
    new_docs = {r["doc_id"] for r in out2.select("doc_id").distinct().collect()} - docs1
    assert new_docs, "restart processed no new files"


def test_dedup_and_text_operators_are_pure_jvm(spark):
    """MinHash signatures, SimHash votes and k-gram fingerprints claim
    'no Python worker in the hot path' - pin it on the physical plan."""
    from texel_spark.operators.dedup import minhash_lsh_candidates, simhash_buckets
    from texel_spark.operators.text import doc_fingerprints
    from texel_spark.plans.checks import assert_no_python_stage

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert_no_python_stage(minhash_lsh_candidates(docs))
    assert_no_python_stage(simhash_buckets(docs))
    assert_no_python_stage(doc_fingerprints(docs))


def test_minhash_shuffles_are_signature_sized(spark):
    """The signature stage shuffles one aggregated row per doc (map-side
    combine), never the exploded shingles: groupBy(doc_id) + the band
    self-join are the only exchanges.  Runs on an in-memory frame so the
    unsplittable-input guard (operators.spread) stays out of the plan -
    its round-robin exchange is exercised by test_spread_input_guard."""
    from texel_spark.operators.dedup import minhash_lsh_candidates
    from texel_spark.plans.checks import assert_max_shuffles, formatted_plan

    raw = spark.read.parquet(f"{SF}/documents.parquet")
    docs = raw.repartition(8)  # pre-spread: the guard no-ops (idempotence)
    df = minhash_lsh_candidates(docs)
    # 7 exchange nodes (count_exchanges sees each twice in the formatted
    # plan): input repartition / signature groupBy(doc_id) / band-bucket
    # shuffled-hash join side, each printed once per self-join side
    # pre-AQE but computed ONCE at runtime (ReusedExchange), plus the
    # final pair distinct - i.e. 4 runtime shuffles, none carrying text
    assert_max_shuffles(df, 14)
    # the narrowness claim itself: no hash exchange ever carries shingles
    # or raw text - only doc ids, band keys and signature columns (the
    # formatted plan prints each exchange's Input [...] on the next line)
    lines = formatted_plan(df).splitlines()
    for i, ln in enumerate(lines):
        if ln.startswith("(") and ") Exchange" in ln and "hashpartitioning" in lines[i + 2]:
            inp = lines[i + 1]
            assert "shingle" not in inp and "text#" not in inp, f"{ln}\n{inp}"


def test_spread_input_guard(spark):
    """The unsplittable-input guard fires exactly once on a single-row-
    group parquet scan (the testdata layout) and never on an input that
    already repartitions or has no files."""
    from pyspark.sql import functions as F

    from texel_spark.operators.spread import spread_input

    raw = spark.read.parquet(f"{SF}/documents.parquet")
    plan = spread_input(raw)._jdf.queryExecution().analyzed().toString()
    assert "Repartition" in plan, f"guard did not fire on 1-row-group parquet:\n{plan}"
    # idempotent: composing operators that each call spread_input must
    # not stack round-robin exchanges
    twice = spread_input(spread_input(raw).where(F.col("doc_id") >= 0))
    plan2 = twice._jdf.queryExecution().analyzed().toString()
    assert plan2.count("Repartition") == 1, plan2
    # in-memory input: nothing to spread
    mem = spark.createDataFrame(raw.limit(10).collect(), raw.schema)
    assert "Repartition" not in spread_input(mem)._jdf.queryExecution().analyzed().toString()


def test_streaming_view_click_join_drops_late_clicks(spark, tmp_path):
    """Watermarked stream-stream interval join (VERDICT r2 item 8):
    in-window clicks match their views; a click arriving AFTER the
    watermark has advanced past its event time is dropped (state for its
    view was evicted), so the output gains no row for it."""
    import time as _time

    from pyspark.sql import functions as F

    from texel_spark.streaming.jobs import streaming_view_click_join

    vdir, cdir, ckpt = str(tmp_path / "views"), str(tmp_path / "clicks"), str(tmp_path / "ck")
    base = 1_700_000_000  # fixed epoch, deterministic

    def land(path, rows, schema):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)

    vs = "user_id long, ts timestamp, page string"
    cs = "user_id long, ts timestamp, target string"

    def ts(off):
        import datetime

        return datetime.datetime.fromtimestamp(base + off, datetime.timezone.utc).replace(tzinfo=None)

    # batch 1: view at t=0 for users 1,2; click at t=10 for user 1 (in window)
    land(vdir, [(1, ts(0), "home"), (2, ts(0), "home")], vs)
    land(cdir, [(1, ts(10), "buy")], cs)

    views = spark.readStream.schema(vs).parquet(vdir)
    clicks = spark.readStream.schema(cs).parquet(cdir)
    joined = streaming_view_click_join(views, clicks, watermark="30 seconds", max_span_seconds=60)
    q = (
        joined.writeStream.format("memory")
        .queryName("vcj")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = spark.sql("SELECT * FROM vcj").collect()
        assert {(r["user_id"], r["target"]) for r in got1} == {(1, "buy")}

        # advance both watermarks far past t=0: fresh rows at t=+600
        land(vdir, [(9, ts(600), "later")], vs)
        land(cdir, [(9, ts(601), "later-click")], cs)
        q.processAllAvailable()
        # watermark updates take effect at the NEXT batch
        land(vdir, [(8, ts(602), "later2")], vs)
        land(cdir, [(8, ts(603), "later2-click")], cs)
        q.processAllAvailable()

        # LATE click for user 2's t=0 view: event time t=20, far behind
        # the ~t=570 watermark -> view state evicted, click dropped
        land(cdir, [(2, ts(20), "too-late")], cs)
        q.processAllAvailable()
        got2 = spark.sql("SELECT * FROM vcj").collect()
        pairs = {(r["user_id"], r["target"]) for r in got2}
        assert (2, "too-late") not in pairs, f"late click joined: {pairs}"
        assert (1, "buy") in pairs
        assert (9, "later-click") in pairs and (8, "later2-click") in pairs
    finally:
        q.stop()


def test_streaming_token_counts_parity(spark, tmp_path):
    """Batch/streaming twin parity: the stateless token_counts projection
    produces the IDENTICAL row set when the same documents arrive as
    micro-batched files instead of one batch scan."""
    import shutil

    from texel_spark.operators.text import token_counts
    from texel_spark.streaming.jobs import streaming_token_counts

    indir = tmp_path / "docs_in"
    indir.mkdir()
    shutil.copy(f"{SF}/documents.parquet", str(indir / "part-0.parquet"))

    batch = spark.read.parquet(f"{SF}/documents.parquet")
    expected = {tuple(r) for r in token_counts(batch).collect()}

    stream = spark.readStream.schema(batch.schema).parquet(str(indir))
    out = streaming_token_counts(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("tok_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql("SELECT * FROM tok_stream").collect()}
        assert got == expected
    finally:
        q.stop()


def test_streaming_hilbert_tiles_parity(spark, tmp_path):
    """Batch/streaming twin parity for the Hilbert-keyed tile counts:
    streaming aggregation in complete mode converges to exactly the
    batch result once all files are consumed; state is one row per live
    tile (bounded by 4^zoom, not event count)."""
    import shutil

    import pyspark.sql.functions as F

    from texel_spark.functions.udfs import hilbert_udf
    from texel_spark.operators import spatial_queries as sq
    from texel_spark.streaming.jobs import events_file_stream, streaming_hilbert_tiles

    indir = tmp_path / "events_in"
    indir.mkdir()
    shutil.copy(f"{SF}/events.parquet", str(indir / "part-0.parquet"))

    zoom = 8
    batch = sq.tile_assign(spark.read.parquet(f"{SF}/events.parquet"), zoom=zoom).withColumn(
        "cell_id", hilbert_udf(zoom)(F.col("tx"), F.col("ty"))
    )
    expected = {tuple(r) for r in batch.collect()}

    out = streaming_hilbert_tiles(events_file_stream(spark, str(indir)), zoom=zoom)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("hilbert_stream")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql("SELECT * FROM hilbert_stream").collect()}
        assert got == expected
    finally:
        q.stop()


def test_per_source_cap_broadcasts_and_prunes(spark):
    """The oversized-source membership join is a BROADCAST (the heavy-
    source list is tiny by construction), and only (doc_id, source)
    reach the parquet reader - the corpus never shuffles for the
    under-cap long tail."""
    from texel_spark.operators.curation import per_source_cap

    df = per_source_cap(spark.read.parquet(f"{SF}/documents.parquet"), cap=10)
    assert_broadcast_join(df)
    assert_pushed_read_schema(df, ["doc_id", "source"], ["text", "lang", "n_chars"])


def test_streaming_asof_join_parity(spark, tmp_path):
    """Batch/streaming twin parity for the as-of join: the same events
    replayed as three time-ordered micro-batch files produce EXACTLY the
    batch asof_join rows - including matches that span a batch boundary
    (the O(1) per-user state carries the latest click across files)."""
    from texel_spark.operators.temporal import asof_join
    from texel_spark.streaming.jobs import events_file_stream, streaming_asof_join

    batch = spark.read.parquet(f"{SF}/events.parquet")
    expected = {tuple(r) for r in asof_join(batch).collect()}
    assert expected  # fixture sanity: some errors exist

    # split into 3 strictly time-ordered files so state MUST cross
    # micro-batch boundaries for parity to hold
    indir = tmp_path / "events_in"
    indir.mkdir()
    rows = batch.orderBy("ts", "event_id").collect()
    third = (len(rows) + 2) // 3
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third]
        spark.createDataFrame(chunk, batch.schema).coalesce(1).write.parquet(
            str(indir / f"chunk{i}"), mode="overwrite"
        )
    import glob
    import shutil
    import time

    for i in range(3):
        (src,) = glob.glob(str(indir / f"chunk{i}" / "part-*.parquet"))
        shutil.move(src, str(indir / f"part-{i}.parquet"))
        shutil.rmtree(str(indir / f"chunk{i}"))
        time.sleep(0.05)  # distinct mtimes: file source replays in order

    out = streaming_asof_join(events_file_stream(spark, str(indir), max_files_per_trigger=1))
    assert out.isStreaming
    q = out.writeStream.format("memory").queryName("asof_stream").outputMode("append").start()
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql("SELECT * FROM asof_stream").collect()}
        assert got == expected
    finally:
        q.stop()


def test_repetition_stats_is_shuffle_free_codegen(spark):
    """Per-row array math: zero exchanges, no Python stage, pruned scan."""
    from texel_spark.operators.text import repetition_stats

    df = repetition_stats(spark.read.parquet(f"{SF}/documents.parquet"))
    assert_max_shuffles(df, 0)
    assert_no_python_stage(df)
    assert_pushed_read_schema(df, ["doc_id", "text"], ["source", "lang", "n_chars"])


def test_decontaminate_broadcasts_eval_ngrams(spark):
    """The eval n-gram set broadcasts; the corpus side never shuffles its
    exploded shingles into the join."""
    from texel_spark.operators.dedup import decontaminate

    df = decontaminate(spark.read.parquet(f"{SF}/documents.parquet"), n=3)
    assert_broadcast_join(df)
    assert_no_python_stage(df)
    assert_pushed_read_schema(df, ["doc_id", "text"], ["source", "lang", "n_chars"])


def test_sequence_pack_windows_per_shard(spark):
    """Packing is per-shard (no global single-partition window) and the
    shard count bounds every window partition."""
    from texel_spark.operators.curation import sequence_pack

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = sequence_pack(docs, budget=64, n_salt=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # partitionBy shard, not a global empty partition spec
    assert "hashpartitioning(shard" in plan
    rows = df.collect()
    assert {r.shard for r in rows} == set(range(8))
    # offsets within a shard are gapless: sum of tokens == max start+last
    import collections

    by_shard = collections.defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r)
    for rs in by_shard.values():
        rs.sort(key=lambda r: r.start_offset)
        acc = 0
        for r in rs:
            assert r.start_offset == acc
            assert r.chunk_id == acc // 64
            assert r.offset_in_chunk == acc % 64
            acc += r.n_tokens


def test_deterministic_shuffle_is_permutation_and_stable(spark):
    from texel_spark.operators.curation import deterministic_shuffle

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = deterministic_shuffle(docs, n_shards=16).collect()
    b = deterministic_shuffle(docs.repartition(13), n_shards=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # layout-independent
    # (shard, pos) is a dense permutation
    seen = {(r.shard, r.pos) for r in a}
    assert len(seen) == len(a) == docs.count()
    import collections

    per = collections.Counter(r.shard for r in a)
    for shard, n in per.items():
        assert {p for s, p in seen if s == shard} == set(range(n))


def test_tfidf_top_terms_plan_and_values(spark):
    """No Python stage; the N-docs scalar joins as a broadcast row; a
    hand-checked doc's top term is its most-distinctive one."""
    from pyspark.sql import functions as F

    from texel_spark.operators.text import tfidf_top_terms

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = tfidf_top_terms(docs, k=3)
    assert_no_python_stage(df)
    assert_broadcast_join(df)
    rows = df.where(F.col("doc_id") == 0).orderBy("rnk").collect()
    assert len(rows) == 3
    assert rows[0].score >= rows[1].score >= rows[2].score
    # rank-1 must beat every other term of the doc on (score, term) order
    assert rows[0].score == rows[0].tf * (1000 * docs.count() // rows[0].df)


def test_streaming_repetition_stats_parity(spark, tmp_path):
    """Stateless repetition filter emits the identical row set when the
    corpus arrives as micro-batched files."""
    import shutil

    from texel_spark.operators.text import repetition_stats
    from texel_spark.streaming.jobs import streaming_repetition_stats

    indir = tmp_path / "docs_in"
    indir.mkdir()
    shutil.copy(f"{SF}/documents.parquet", str(indir / "part-0.parquet"))

    batch = spark.read.parquet(f"{SF}/documents.parquet")
    expected = {tuple(r) for r in repetition_stats(batch).collect()}

    stream = spark.readStream.schema(batch.schema).parquet(str(indir))
    out = streaming_repetition_stats(stream)
    assert out.isStreaming
    q = out.writeStream.format("memory").queryName("rep_stream").outputMode("append").start()
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql("SELECT * FROM rep_stream").collect()}
        assert got == expected
    finally:
        q.stop()


def test_streaming_decontaminate_parity(spark, tmp_path):
    """Stream-static contamination check: train-band docs replayed as TWO
    micro-batch files against the static broadcast eval n-gram set match
    the batch decontaminate operator row-for-row."""
    from pyspark.sql import functions as F

    from texel_spark.operators.dedup import decontaminate
    from texel_spark.streaming.jobs import eval_ngram_set, streaming_decontaminate

    batch = spark.read.parquet(f"{SF}/documents.parquet")
    expected = {tuple(r) for r in decontaminate(batch, n=3).collect()}
    assert any(r[2] > 0 for r in expected)  # fixture carries signal

    hv = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
    train = batch.where(hv % 50 != 0)
    indir = tmp_path / "docs_in"
    train.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(str(indir / "a"))
    train.where(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(str(indir / "b"))
    import glob
    import shutil

    for i, part in enumerate(sorted(glob.glob(str(indir / "*" / "part-*.parquet")))):
        shutil.move(part, str(indir / f"part-{i}.parquet"))
    shutil.rmtree(str(indir / "a"))
    shutil.rmtree(str(indir / "b"))

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(indir))
    )
    out = streaming_decontaminate(stream, eval_ngram_set(batch, n=3))
    assert out.isStreaming
    q = out.writeStream.format("memory").queryName("decon_stream").outputMode("update").start()
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql("SELECT * FROM decon_stream").collect()}
        assert got == expected
    finally:
        q.stop()


def test_streaming_unigram_quality_parity(spark, tmp_path):
    """Stream-static LM-quality scoring: the corpus replayed as TWO
    micro-batch files against the static broadcast unigram table matches
    the batch unigram_quality operator row-for-row."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from texel_spark.operators.text import unigram_quality
    from texel_spark.streaming.jobs import streaming_unigram_quality, unigram_count_table

    batch = spark.read.parquet(f"{SF}/documents.parquet")
    expected = {tuple(r) for r in unigram_quality(batch).collect()}

    indir = tmp_path / "docs_in"
    batch.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(str(indir / "a"))
    batch.where(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(str(indir / "b"))
    for i, part in enumerate(sorted(glob.glob(str(indir / "*" / "part-*.parquet")))):
        shutil.move(part, str(indir / f"part-{i}.parquet"))
    shutil.rmtree(str(indir / "a"))
    shutil.rmtree(str(indir / "b"))

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(indir))
    )
    out = streaming_unigram_quality(stream, unigram_count_table(batch))
    assert out.isStreaming
    q = out.writeStream.format("memory").queryName("uq_stream").outputMode("update").start()
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql("SELECT * FROM uq_stream").collect()}
        assert got == expected
    finally:
        q.stop()


def test_streaming_quality_funnel_parity(spark, tmp_path):
    """Batch/streaming twin parity for the retention funnel: the corpus
    arrives as TWO micro-batch files, so the single global state row
    must merge partial conditional sums across batches; the converged
    complete-mode output equals the batch funnel exactly."""
    from texel_spark.operators.curation import quality_funnel
    from texel_spark.streaming.jobs import streaming_quality_funnel

    batch = spark.read.parquet(f"{SF}/documents.parquet")
    half_a = batch.where("doc_id % 2 = 0")
    half_b = batch.where("doc_id % 2 = 1")
    indir = tmp_path / "docs_in"
    half_a.coalesce(1).write.parquet(str(indir / "a"))
    half_b.coalesce(1).write.parquet(str(indir / "b"))

    expected = {tuple(r) for r in quality_funnel(batch).collect()}

    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(indir / "*"))
    out = streaming_quality_funnel(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_stream")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql("SELECT * FROM funnel_stream").collect()}
        assert got == expected
    finally:
        q.stop()


def test_streaming_sliding_chunks_parity(spark, tmp_path):
    """Batch/streaming twin parity for the RAG chunker: identical row
    set when the same documents arrive as micro-batched files."""
    import shutil

    from texel_spark.operators.text import sliding_chunks
    from texel_spark.streaming.jobs import streaming_sliding_chunks

    indir = tmp_path / "docs_in"
    indir.mkdir()
    shutil.copy(f"{SF}/documents.parquet", str(indir / "part-0.parquet"))

    batch = spark.read.parquet(f"{SF}/documents.parquet")
    expected = {tuple(r) for r in sliding_chunks(batch).collect()}

    stream = spark.readStream.schema(batch.schema).parquet(str(indir))
    out = streaming_sliding_chunks(stream)
    assert out.isStreaming
    q = out.writeStream.format("memory").queryName("chunk_stream").outputMode("append").start()
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql("SELECT * FROM chunk_stream").collect()}
        assert got == expected
    finally:
        q.stop()


def test_streaming_snapshot_dedup_parity(spark, tmp_path):
    """Batch/streaming twin parity for cross-snapshot dedup: the new
    crawl arrives as TWO micro-batch files and is anti-joined per batch
    against the static previous snapshot; the union of appended batches
    equals the batch operator exactly."""
    from texel_spark.operators.dedup import snapshot_dedup
    from texel_spark.streaming.jobs import streaming_snapshot_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    expected = {tuple(r) for r in snapshot_dedup(docs, old_mod=3).collect()}
    assert expected

    old = docs.where("doc_id % 3 = 0")
    new = docs.where("doc_id % 3 <> 0")
    indir = tmp_path / "new_in"
    new.where("doc_id % 2 = 0").coalesce(1).write.parquet(str(indir / "a"))
    new.where("doc_id % 2 = 1").coalesce(1).write.parquet(str(indir / "b"))

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(indir / "*"))
    out = streaming_snapshot_dedup(stream, old)
    assert out.isStreaming
    q = out.writeStream.format("memory").queryName("snapdedup_stream").outputMode("append").start()
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql("SELECT * FROM snapdedup_stream").collect()}
        assert got == expected
    finally:
        q.stop()


def test_streaming_validate_documents_parity(spark, tmp_path):
    """The validation gate converges to the batch report with the
    corpus split across two micro-batch files (single state row must
    merge partial conditional sums)."""
    from texel_spark.operators.curation import validate_documents
    from texel_spark.streaming.jobs import streaming_validate_documents

    batch = spark.read.parquet(f"{SF}/documents.parquet")
    # the streaming gate covers the six O(1)-state checks; the global
    # DISTINCT duplicate check is batch-only by design
    expected = {
        tuple(r)
        for r in validate_documents(batch, include_duplicates=False).collect()
    }

    indir = tmp_path / "docs_in"
    batch.where("doc_id % 2 = 0").coalesce(1).write.parquet(str(indir / "a"))
    batch.where("doc_id % 2 = 1").coalesce(1).write.parquet(str(indir / "b"))
    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(indir / "*"))
    out = streaming_validate_documents(stream)
    assert out.isStreaming
    q = out.writeStream.format("memory").queryName("vdoc_stream").outputMode("complete").start()
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql("SELECT * FROM vdoc_stream").collect()}
        assert got == expected
    finally:
        q.stop()


def test_streaming_tile_pyramid_parity(spark, tmp_path):
    """Incremental pyramid counts converge to the batch rollup at every
    zoom level, with events split across two micro-batch files."""
    from texel_spark.operators import spatial_queries as sq
    from texel_spark.streaming.jobs import streaming_tile_pyramid

    batch = spark.read.parquet(f"{SF}/events.parquet")
    expected = {tuple(r) for r in sq.tile_pyramid_rollup(batch, max_zoom=6).collect()}

    indir = tmp_path / "ev_in"
    batch.where("event_id % 2 = 0").coalesce(1).write.parquet(str(indir / "a"))
    batch.where("event_id % 2 = 1").coalesce(1).write.parquet(str(indir / "b"))
    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(indir / "*"))
    out = streaming_tile_pyramid(stream, max_zoom=6)
    assert out.isStreaming
    q = out.writeStream.format("memory").queryName("pyr_stream").outputMode("complete").start()
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in spark.sql("SELECT * FROM pyr_stream").collect()}
        assert got == expected
    finally:
        q.stop()
