"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship snap->tile pipeline on a synthetic
interleaved-document table (the engine's input model, BASELINE.json
input_hint) plus the sf0.001 parquet tables for the relational operators.

``queries()``/``oracle_sql()`` cover the operator inventory from
SURVEY.md section 2: tile assignment (T1/T3), extent aggregation (S7),
PIP join / kNN (K16 engine-level), raster<->vector (T2), dedup /
similarity / text-analysis training-data operators, and windowed event
aggregation.  SQL-expressible operators carry a DuckDB oracle; kernel
and LSH operators are rows-only by nature (the snap kernel's oracle is
the reference's own golden tests, run bit-for-bit in tests/test_snap.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _synth_docs(spark: SparkSession, n: int = 400) -> DataFrame:
    from texel_spark.sources.documents import synth_documents

    return synth_documents(spark, n, partitions=8)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents -> snap kernel -> (zoom, tile_id) assignment."""
    from texel_spark.grid.tms import load_embedded
    from texel_spark.operators.snap_tiles import snap_pipeline_df

    docs = _synth_docs(spark, 400)
    rd = load_embedded("NetherlandsRDNewQuad")
    return snap_pipeline_df(docs, rd, [5, 9, 12])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from texel_spark.grid.tms import load_embedded
    from texel_spark.operators import curation, dedup, events, multimodal, similarity, temporal, text
    from texel_spark.operators import spatial_queries as sq
    from texel_spark.operators.snap_tiles import snap_pipeline_df
    from texel_spark.sources.documents import (
        explode_spans,
        reassemble_spans,
    )

    def snap_pipeline(spark, sf_dir):
        rd = load_embedded("NetherlandsRDNewQuad")
        return snap_pipeline_df(_synth_docs(spark, 400), rd, [5, 9, 12])

    def snap_tile_fanout(spark, sf_dir):
        # the JVM tile-assignment half with a hash-exact DuckDB oracle:
        # kernel bboxes materialize to parquet, both engines fan them out
        from texel_spark.operators.snap_tiles import snap_tile_fanout_df

        rd = load_embedded("NetherlandsRDNewQuad")
        return snap_tile_fanout_df(_synth_docs(spark, 400), rd, [5, 9, 12])

    def snap_tile_fanout_webmercator(spark, sf_dir):
        # the WebMercatorQuad pipeline's JVM fan-out half, hash-oracled
        # like the RD one (VERDICT r4 item 5)
        from texel_spark.kernel.snap import SnapConfig
        from texel_spark.operators.snap_tiles import snap_tile_fanout_df

        wm = load_embedded("WebMercatorQuad")
        return snap_tile_fanout_df(
            _synth_docs(spark, 200), wm, [11, 15], SnapConfig(ignore_outside_grid=True), tag="wm"
        )

    def snap_tile_fanout_nztm(spark, sf_dir):
        # the NZTM2000Quad (swapped-axes) pipeline's JVM fan-out half
        from texel_spark.operators.snap_tiles import snap_tile_fanout_df
        from texel_spark.sources.documents import synth_documents

        nz = load_embedded("NZTM2000Quad")
        (bl, tr) = nz.matrix_bounding_box(0)
        docs = synth_documents(spark, 200, partitions=8, extent=(bl[0], bl[1], tr[0], tr[1]))
        return snap_tile_fanout_df(docs, nz, [4, 8], tag="nz")

    def snap_pipeline_webmercator(spark, sf_dir):
        # same documents, WebMercatorQuad grid (EPSG:3857): RD-extent
        # coordinates are valid WebMercator metres, so the whole pipeline
        # exercises a second embedded TMS end to end
        wm = load_embedded("WebMercatorQuad")
        from texel_spark.kernel.snap import SnapConfig

        return snap_pipeline_df(
            _synth_docs(spark, 200), wm, [11, 15], SnapConfig(ignore_outside_grid=True)
        )

    def snap_pipeline_nztm(spark, sf_dir):
        # lat/lon-ordered-axes grid (EPSG:2193), loaded from its OGC TMS
        # 2.0 registry JSON: exercises the axis-swap + JSON-loader paths
        # through the full pipeline
        nz = load_embedded("NZTM2000Quad")
        from texel_spark.sources.documents import synth_documents

        (bl, tr) = nz.matrix_bounding_box(0)
        docs = synth_documents(spark, 200, partitions=8, extent=(bl[0], bl[1], tr[0], tr[1]))
        return snap_pipeline_df(docs, nz, [4, 8])

    def _hilbert_tile_assign(spark, sf_dir):
        # pluggable cell keyer: same tile grid, Hilbert key instead of
        # Morton (better range locality); oracled by the unrolled
        # bit-loop SQL (sq.hilbert_tile_assign_sql) + published-value
        # goldens in tests/test_cellkeys.py
        import pyspark.sql.functions as F

        from texel_spark.functions.udfs import hilbert_udf

        zoom = 8
        base = sq.tile_assign(_t(spark, sf_dir, "events"), zoom=zoom)
        return base.withColumn("cell_id", hilbert_udf(zoom)(F.col("tx"), F.col("ty")))

    def span_roundtrip(spark, sf_dir):
        docs = _synth_docs(spark, 400)
        rt = reassemble_spans(explode_spans(docs))
        import pyspark.sql.functions as F

        a = docs.select("doc_id", F.md5(F.to_json("spans")).alias("sig"))
        b = rt.select("doc_id", F.md5(F.to_json("spans")).alias("sig_rt"))
        return (
            a.join(b, "doc_id", "left")
            .select(
                F.count("*").alias("n_docs"),
                F.sum((F.col("sig") != F.col("sig_rt")).cast("int")).alias("n_violations"),
            )
        )

    return {
        # spatial core
        "tile_assign": lambda s, d: sq.tile_assign(_t(s, d, "events")),
        "tile_extent_agg": lambda s, d: sq.tile_extent_agg(_t(s, d, "events")),
        "pip_join": lambda s, d: sq.pip_join(_t(s, d, "events"), _t(s, d, "nation")),
        "knn_join": lambda s, d: sq.knn_join(_t(s, d, "events"), _t(s, d, "nation")),
        "rasterize": lambda s, d: sq.rasterize(_t(s, d, "nation")),
        "vectorize_raster": lambda s, d: sq.vectorize_raster(_t(s, d, "nation")),
        "topk_per_tile": lambda s, d: sq.topk_per_tile(_t(s, d, "events")),
        "tile_pyramid_rollup": lambda s, d: sq.tile_pyramid_rollup(_t(s, d, "events")),
        "tile_pyramid_single_agg": lambda s, d: sq.tile_pyramid_rollup_single_agg(
            _t(s, d, "events")
        ),
        "tile_diff": lambda s, d: sq.tile_diff(
            _t(s, d, "events").where("event_id % 10 <> 0"), _t(s, d, "events")
        ),
        "hilbert_tile_assign": _hilbert_tile_assign,
        # oracled JVM fan-out halves of the kernel pipelines
        "snap_tile_fanout": snap_tile_fanout,
        "snap_tile_fanout_webmercator": snap_tile_fanout_webmercator,
        "snap_tile_fanout_nztm": snap_tile_fanout_nztm,
        # dedup family
        "dedup_exact": lambda s, d: dedup.exact_duplicates(_t(s, d, "documents")),
        "dedup_fingerprint": lambda s, d: dedup.fingerprint_duplicates(_t(s, d, "documents")),
        "ngram_jaccard": lambda s, d: dedup.ngram_jaccard_pairs(_t(s, d, "documents")),
        "minhash_lsh": lambda s, d: dedup.minhash_lsh_candidates(_t(s, d, "documents")),
        "minhash_verify": lambda s, d: dedup.minhash_verify(_t(s, d, "documents")),
        "simhash_buckets": lambda s, d: dedup.simhash_buckets(_t(s, d, "documents")),
        "near_dup_components": lambda s, d: dedup.near_dup_components(_t(s, d, "documents")),
        "chunk_dedup": lambda s, d: dedup.chunk_dedup(_t(s, d, "documents")),
        "snapshot_dedup": lambda s, d: dedup.snapshot_dedup(_t(s, d, "documents")),
        "hash_split": lambda s, d: curation.hash_split(_t(s, d, "documents")),
        "per_source_cap": lambda s, d: curation.per_source_cap(_t(s, d, "documents"), cap=10),
        "quality_funnel": lambda s, d: curation.quality_funnel(_t(s, d, "documents")),
        "validate_documents": lambda s, d: curation.validate_documents(_t(s, d, "documents")),
        "curation_pipeline": lambda s, d: curation.curation_pipeline(
            _t(s, d, "documents"), cap=10
        ),
        # text analysis
        "text_stats": lambda s, d: text.text_stats(_t(s, d, "documents")),
        "token_counts": lambda s, d: text.token_counts(_t(s, d, "documents")),
        "lang_stopword_score": lambda s, d: text.lang_stopword_score(_t(s, d, "documents")),
        "doc_fingerprints": lambda s, d: text.doc_fingerprints(_t(s, d, "documents")),
        # similarity search
        "cosine_topk": lambda s, d: similarity.cosine_topk(_t(s, d, "embeddings")),
        # threshold 0.3 here: the synthetic embeddings are random (max
        # same-cell cosine ~0.43), so the oracle compares NONZERO rows;
        # the operator default stays 0.95 (real near-dup), pinned by the
        # planted-pair pytest
        "embedding_near_dup": lambda s, d: similarity.embedding_near_dup(
            _t(s, d, "embeddings"), threshold=0.3
        ),
        "embedding_dup_components": lambda s, d: similarity.embedding_dup_components(
            _t(s, d, "embeddings"), threshold=0.3
        ),
        # events / windows
        "hourly_rollup": lambda s, d: events.hourly_rollup(_t(s, d, "events")),
        "sessionize": lambda s, d: events.sessionize(_t(s, d, "events")),
        "asof_join": lambda s, d: temporal.asof_join(_t(s, d, "events")),
        # 4h window: sf0.01 events are sparse per user (~300 rows with a
        # match); the operator default stays 600s
        "range_pair_join": lambda s, d: temporal.range_pair_join(
            _t(s, d, "events"), window_s=14400
        ),
        # curation extras
        "pii_scrub": lambda s, d: text.pii_scrub(_t(s, d, "documents")),
        "length_quantiles": lambda s, d: text.length_quantiles(_t(s, d, "documents")),
        "source_mixture": lambda s, d: curation.source_mixture(_t(s, d, "documents")),
        "repetition_stats": lambda s, d: text.repetition_stats(_t(s, d, "documents")),
        "tfidf_top_terms": lambda s, d: text.tfidf_top_terms(_t(s, d, "documents")),
        "unigram_quality": lambda s, d: text.unigram_quality(_t(s, d, "documents")),
        "bm25_topk": lambda s, d: text.bm25_topk(_t(s, d, "documents")),
        "vocab_coverage": lambda s, d: text.vocab_coverage(_t(s, d, "documents")),
        "sliding_chunks": lambda s, d: text.sliding_chunks(_t(s, d, "documents")),
        "langid_ngram": lambda s, d: text.langid_ngram(_t(s, d, "documents")),
        # n=3 here: at n=5 the synthetic corpus shares zero cross-band
        # shingles and the oracle would compare an all-zero column
        "decontaminate": lambda s, d: dedup.decontaminate(_t(s, d, "documents"), n=3),
        "sequence_pack": lambda s, d: curation.sequence_pack(_t(s, d, "documents")),
        "deterministic_shuffle": lambda s, d: curation.deterministic_shuffle(
            _t(s, d, "documents")
        ),
        # multimodal plumbing (decode stubbed, schema/batch shape real)
        "media_stats": lambda s, d: multimodal.media_stats(
            multimodal.materialized_interleaved(s, 400)
        ),
        # materialized to the shared oracle scratch parquet so DuckDB
        # verifies the interleaved bridge hash-exactly on identical rows
        "interleaved_text": lambda s, d: multimodal.interleaved_text(
            multimodal.materialized_interleaved(s, 400)
        ),
        "modality_mix": lambda s, d: multimodal.modality_mix(
            multimodal.materialized_interleaved(s, 400)
        ),
        "media_features": lambda s, d: multimodal.extract_media_features(
            multimodal.media_spans(multimodal.materialized_interleaved(s, 400))
        ).drop("embedding"),
        "media_frame_sample": lambda s, d: multimodal.sample_frames(
            multimodal.media_spans(multimodal.materialized_interleaved(s, 400))
        ).drop("frame"),
        "media_resize": lambda s, d: multimodal.resize_media(
            multimodal.media_spans(multimodal.materialized_interleaved(s, 400)), target=64
        ).drop("pixels"),
        # -- no_oracle entries LAST (VERDICT r5 item 1): every query above
        # this marker carries a DuckDB oracle, so a driver correctness
        # window of any size >= 58 sees only oracle-bearing rows first.
        # full kernel pipelines (oracle = reference golden tests + the
        # snap_tile_fanout* twins above)
        "snap_pipeline": snap_pipeline,
        "snap_pipeline_webmercator": snap_pipeline_webmercator,
        "snap_pipeline_nztm": snap_pipeline_nztm,
        "span_roundtrip": span_roundtrip,
        # ANN paths (recall floors pinned in pytest; no SQL twin by nature)
        "ivf_cosine_topk": lambda s, d: similarity.ivf_cosine_topk(_t(s, d, "embeddings")),
        "ivf_kmeans_topk": lambda s, d: similarity.ivf_kmeans_topk(_t(s, d, "embeddings")),
        # n_codes=64: the sf0.01 embeddings table is 500 rows; the
        # training sample must cover the codebook
        "pq_topk": lambda s, d: similarity.pq_topk(_t(s, d, "embeddings"), n_codes=64),
        "ivf_pq_topk": lambda s, d: similarity.ivf_pq_topk(
            _t(s, d, "embeddings"), n_codes=64, nprobe=4
        ),
    }


def _snap_tile_fanout_oracle() -> str:
    from texel_spark.grid.tms import load_embedded
    from texel_spark.operators.snap_tiles import tile_fanout_oracle_sql

    return tile_fanout_oracle_sql(load_embedded("NetherlandsRDNewQuad"), [5, 9, 12])


def _snap_tile_fanout_oracle_wm() -> str:
    from texel_spark.grid.tms import load_embedded
    from texel_spark.operators.snap_tiles import tile_fanout_oracle_sql

    return tile_fanout_oracle_sql(load_embedded("WebMercatorQuad"), [11, 15], tag="wm")


def _snap_tile_fanout_oracle_nz() -> str:
    from texel_spark.grid.tms import load_embedded
    from texel_spark.operators.snap_tiles import tile_fanout_oracle_sql

    return tile_fanout_oracle_sql(load_embedded("NZTM2000Quad"), [4, 8], tag="nz")


def oracle_sql() -> dict[str, str]:
    from texel_spark.operators import curation, dedup, events, multimodal, temporal, text
    from texel_spark.operators import spatial_queries as sq
    from texel_spark.operators.similarity import (
        cosine_topk_sql,
        embedding_dup_components_sql,
        embedding_near_dup_sql,
    )

    return {
        "tile_assign": sq.tile_assign_sql(),
        "hilbert_tile_assign": sq.hilbert_tile_assign_sql(),
        "snap_tile_fanout": _snap_tile_fanout_oracle(),
        "interleaved_text": multimodal.interleaved_text_sql(),
        "modality_mix": multimodal.modality_mix_sql(),
        "media_stats": multimodal.media_stats_sql(),
        "media_features": multimodal.media_features_sql(),
        "media_frame_sample": multimodal.media_frame_sample_sql(),
        "media_resize": multimodal.media_resize_sql(target=64),
        "snap_tile_fanout_webmercator": _snap_tile_fanout_oracle_wm(),
        "snap_tile_fanout_nztm": _snap_tile_fanout_oracle_nz(),
        "tile_extent_agg": sq.tile_extent_agg_sql(),
        "pip_join": sq.pip_join_sql(),
        "knn_join": sq.knn_join_sql(),
        "rasterize": sq.rasterize_sql(),
        "vectorize_raster": sq.vectorize_raster_sql(),
        "topk_per_tile": sq.topk_per_tile_sql(),
        "tile_pyramid_rollup": sq.tile_pyramid_rollup_sql(),
        # identical output to tile_pyramid_rollup (proven by sharing its oracle):
        # the single-stateful-operator form the streaming twin uses
        "tile_pyramid_single_agg": sq.tile_pyramid_rollup_sql(),
        "tile_diff": sq.tile_diff_sql(),
        "dedup_exact": dedup.EXACT_DUPLICATES_SQL,
        "dedup_fingerprint": dedup.FINGERPRINT_DUPLICATES_SQL,
        "ngram_jaccard": dedup.ngram_jaccard_pairs_sql(),
        "minhash_lsh": dedup.minhash_lsh_sql(),
        "minhash_verify": dedup.minhash_verify_sql(),
        "simhash_buckets": dedup.simhash_buckets_sql(),
        "near_dup_components": dedup.near_dup_components_sql(),
        "chunk_dedup": dedup.chunk_dedup_sql(),
        "snapshot_dedup": dedup.snapshot_dedup_sql(),
        "hash_split": curation.hash_split_sql(),
        "per_source_cap": curation.per_source_cap_sql(cap=10),
        "quality_funnel": curation.quality_funnel_sql(),
        "validate_documents": curation.validate_documents_sql(),
        "curation_pipeline": curation.curation_pipeline_sql(cap=10),
        "text_stats": text.text_stats_sql(),
        "token_counts": text.token_counts_sql(),
        "lang_stopword_score": text.lang_stopword_score_sql(),
        "doc_fingerprints": text.doc_fingerprints_sql(),
        "cosine_topk": cosine_topk_sql(),
        "embedding_near_dup": embedding_near_dup_sql(threshold=0.3),
        "embedding_dup_components": embedding_dup_components_sql(threshold=0.3),
        "hourly_rollup": events.HOURLY_ROLLUP_SQL,
        "sessionize": events.sessionize_sql(),
        "asof_join": temporal.asof_join_sql(),
        "range_pair_join": temporal.range_pair_join_sql(window_s=14400),
        "pii_scrub": text.pii_scrub_sql(),
        "length_quantiles": text.length_quantiles_sql(),
        "source_mixture": curation.source_mixture_sql(),
        "repetition_stats": text.repetition_stats_sql(),
        "tfidf_top_terms": text.tfidf_top_terms_sql(),
        "unigram_quality": text.unigram_quality_sql(),
        "bm25_topk": text.bm25_topk_sql(),
        "vocab_coverage": text.vocab_coverage_sql(),
        "sliding_chunks": text.sliding_chunks_sql(),
        "langid_ngram": text.langid_ngram_sql(),
        "decontaminate": dedup.decontaminate_sql(n=3),
        "sequence_pack": curation.sequence_pack_sql(),
        "deterministic_shuffle": curation.deterministic_shuffle_sql(),
        # snap_pipeline* / span_roundtrip / ivf_cosine_topk /
        # ivf_kmeans_topk / pq_topk / media_* are non-SQL-expressible
        # (custom kernels / iterative training / ANN) -> rows-only; each
        # pipeline's JVM fan-out half IS oracled via its
        # snap_tile_fanout* twin above.
    }
