"""Dataset-curation operators: deterministic splits and per-source caps.

Training-data pipelines need REPRODUCIBLE curation at 100 TB: the same
document must land in the same train/val/test split on every run, on any
cluster, with no RNG state - so both operators key on a content-stable
md5 of the document id (the same first-8-hex-chars base hash the dedup
family uses), and both are pure JVM column expressions reproducible in
ANSI SQL (DuckDB oracles in __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_DEFAULT_WEIGHTS: list[tuple[str, int]] = [("train", 90), ("val", 5), ("test", 5)]


def _id_hash(col: str = "doc_id"):
    """Stable non-negative 32-bit hash of the id's string form (first 8
    md5 hex chars) - identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10).cast("long")


def hash_split(documents: DataFrame, weights: list[tuple[str, int]] | None = None) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = id-hash modulo
    the weight total, split = the bucket's cumulative-weight band.

    Stateless per row (no shuffle, no RNG): adding documents never moves
    an existing document's split, and re-running on a different cluster
    layout yields byte-identical assignments - the property random
    splits lose at scale.  Integer weights keep the band edges exact.
    """
    weights = weights or _DEFAULT_WEIGHTS
    denom = sum(w for _, w in weights)
    bucket = _id_hash() % denom
    acc = 0
    split = None
    for name, w in weights:
        acc += w
        split = F.when(bucket < acc, name) if split is None else split.when(bucket < acc, name)
    return documents.select("doc_id", bucket.alias("bucket"), split.alias("split"))


def hash_split_sql(weights: list[tuple[str, int]] | None = None) -> str:
    weights = weights or _DEFAULT_WEIGHTS
    denom = sum(w for _, w in weights)
    hv = "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    acc = 0
    whens = []
    for name, w in weights:
        acc += w
        whens.append(f"WHEN ({hv} % {denom}) < {acc} THEN '{name}'")
    return f"""
SELECT doc_id,
       {hv} % {denom} AS bucket,
       CASE {' '.join(whens)} END AS split
FROM documents
"""


def per_source_cap(documents: DataFrame, cap: int = 100) -> DataFrame:
    """Deterministic per-source downsampling: keep at most ``cap``
    documents per source, chosen as the cap smallest (id-hash, doc_id)
    pairs - a stable uniform sample that never moves with partitioning.

    Scale shape: sources under the cap (the long tail) pass through with
    NO sort - only documents of oversized sources (found by a map-side-
    combined count, broadcast back) enter the row_number window, so the
    per-source sort is bounded by the few heavy sources rather than the
    corpus.  The result is identical to a plain window-over-everything
    (the oracle's form).
    """
    counts = documents.groupBy("source").agg(F.count("*").alias("n_src"))
    big = counts.where(F.col("n_src") > cap).select("source", F.lit(True).alias("oversized"))
    d = documents.select("doc_id", "source").join(F.broadcast(big), "source", "left")
    small_keep = d.where(F.col("oversized").isNull()).select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(_id_hash().asc(), F.col("doc_id").asc())
    big_keep = (
        d.where(F.col("oversized").isNotNull())
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= cap)
        .select("doc_id", "source")
    )
    return small_keep.union(big_keep)


def per_source_cap_sql(cap: int = 100) -> str:
    hv = "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    return f"""
WITH r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY {hv}, doc_id) AS rk
  FROM documents
)
SELECT doc_id, source FROM r WHERE rk <= {cap}
"""
