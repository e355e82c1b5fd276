"""Deduplication operators for large-scale training-data pipelines.

Exact (hash groupBy), canonical-fingerprint near-dup, n-gram Jaccard
pairs (shingle explode + equi-join, never a cross join), MinHash+LSH
(banded candidate generation, the 100 TB scale path) and SimHash.

All shuffles key on content hashes - uniformly distributed, so no skew;
the shingle join caps shingle frequency to bound worst-case fan-out
(stop-shingle removal), the standard trick at corpus scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Exact dedup survivor table: one row per content hash with the kept
    doc and the multiplicity (n_dups > 1 = the duplicate groups)."""
    return documents.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_doc_id")
    )


EXACT_DUPLICATES_SQL = """
SELECT md5(text) AS text_hash, COUNT(*) AS n_dups, MIN(doc_id) AS keep_doc_id
FROM documents GROUP BY 1
"""


def fingerprint_duplicates(documents: DataFrame) -> DataFrame:
    """Near-dup via canonical fingerprint: sorted-token bag hash catches
    reordered/shuffled copies."""
    fp = F.md5(F.array_join(F.array_sort(F.split(F.col("text"), " ")), " "))
    return documents.groupBy(fp.alias("fingerprint")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id")
    )


FINGERPRINT_DUPLICATES_SQL = """
SELECT md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS fingerprint,
       COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id
FROM documents GROUP BY 1
"""


def _shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """Distinct n-gram token shingles per doc (JVM-side array ops)."""
    toks = F.split(F.col("text"), " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return (
        documents.where(F.size(toks) >= n)
        .select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = 3, threshold_num: int = 4, threshold_den: int = 5, max_shingle_freq: int = 50
) -> DataFrame:
    """Document pairs with n-gram Jaccard >= threshold (integer-exact).

    Shingle-inverted-index equi-join: |A intersect B| from the join,
    |A union B| = |A|+|B|-|A intersect B|; threshold compared as
    den*inter >= num*union so no float appears.  Shingles above
    max_shingle_freq are dropped on BOTH docs (stop-shingles) - bounds
    the join fan-out at corpus scale.
    """
    # inverted index as ONE groupBy (posting list per shingle), pairs
    # generated JVM-side inside each bounded posting list - cheaper than
    # a self-join shuffle, and the stop-shingle cap bounds the fan-out
    sh = _shingles(documents, n)
    grouped = sh.groupBy("shingle").agg(F.collect_list("doc_id").alias("ds"), F.count("*").alias("df"))
    kept = grouped.where(F.col("df") <= max_shingle_freq).cache()
    sizes = kept.select(F.explode("ds").alias("doc_id")).groupBy("doc_id").agg(F.count("*").alias("sz"))
    pair_expr = """
        explode(flatten(transform(ds, (a, i) ->
            filter(transform(ds, (b, j) ->
                IF(j > i AND a < b, struct(a AS doc_a, b AS doc_b),
                   IF(j > i AND b < a, struct(b AS doc_a, a AS doc_b), null))),
                x -> x IS NOT NULL))))
    """
    inter = (
        kept.select(F.expr(pair_expr).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
    )
    union = F.col("sz_a") + F.col("sz_b") - F.col("inter")
    return j.where(F.lit(threshold_den) * F.col("inter") >= F.lit(threshold_num) * union).select(
        "doc_a", "doc_b", "inter", (union).alias("union_sz")
    )


def ngram_jaccard_pairs_sql(
    n: int = 3, threshold_num: int = 4, threshold_den: int = 5, max_shingle_freq: int = 50
) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= {n}
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(t[i.i + 1 : i.i + {n}], ' ') AS shingle
  FROM toks, LATERAL (SELECT UNNEST(range(0, len(t) - {n} + 1)) AS i) i
),
kept AS (
  SELECT * FROM sh WHERE shingle IN (
    SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {max_shingle_freq}
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM kept GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM kept a JOIN kept b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter, sa.sz + sb.sz - inter AS union_sz
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE {threshold_den} * inter >= {threshold_num} * (sa.sz + sb.sz - inter)
"""


_MASK64 = (1 << 64) - 1


def _hash64_np(arr):
    """Deterministic 64-bit string hash, vectorized (pandas siphash with a
    fixed key); identical across executors, processes and runs."""
    import numpy as np
    import pandas as pd

    return pd.util.hash_array(np.asarray(arr, dtype=object), hash_key="texel-spark-hash").astype(np.uint64)


@pandas_udf(ArrayType(LongType()))
def minhash_signature(shingles: pd.Series) -> pd.Series:
    """128-perm MinHash signature per doc from its shingle array.

    Permutations are (a*h + b) over a single base hash - the standard
    composable construction.  The whole Arrow batch is processed with
    three numpy ops (hash all shingles once, broadcast the perms in
    chunks, segment-min via minimum.reduceat) - no per-document loop.
    """
    import numpy as np

    n_perm = 128
    rng = np.random.default_rng(42)
    a = rng.integers(1, (1 << 61) - 1, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=n_perm, dtype=np.int64).astype(np.uint64)

    lengths = np.array([0 if sh is None else len(sh) for sh in shingles], dtype=np.int64)
    flat: list = []
    for sh in shingles:
        if sh is not None and len(sh):
            flat.extend(sh)
    if not flat:
        return pd.Series([[0] * n_perm for _ in range(len(shingles))])
    base = _hash64_np(flat)  # (S,)

    nonempty = lengths > 0
    offsets = np.zeros(int(nonempty.sum()), dtype=np.int64)
    np.cumsum(lengths[nonempty][:-1], out=offsets[1:])
    sigs = np.empty((n_perm, len(offsets)), dtype=np.uint64)
    chunk = 16  # perms per pass: bounds the (chunk x S) temp matrix
    for i in range(0, n_perm, chunk):
        perm = a[i : i + chunk, None] * base[None, :] + b[i : i + chunk, None]
        sigs[i : i + chunk] = np.minimum.reduceat(perm, offsets, axis=1)

    out = []
    j = 0
    zero = [0] * n_perm
    for ln in lengths:
        if ln == 0:
            out.append(zero)
        else:
            out.append(sigs[:, j].astype(np.int64).tolist())
            j += 1
    return pd.Series(out)


def minhash_lsh_candidates(
    documents: DataFrame, n: int = 3, bands: int = 32, rows_per_band: int = 4
) -> DataFrame:
    """MinHash+LSH near-dup candidates - the 10^12-doc scale path.

    shingle -> 128-perm signature (Arrow-vectorized) -> band buckets ->
    bucket equi-join.  Cost is linear in corpus size + bucket collisions;
    verify candidates with ngram_jaccard on the candidate set only.
    """
    # the signature stage is Python-CPU-bound: fan the input out to the
    # cluster's parallelism regardless of how few files the scan produced
    par = documents.sparkSession.sparkContext.defaultParallelism
    documents = documents.repartition(par)
    toks = F.split(F.col("text"), " ")
    sh = F.array_distinct(
        F.transform(F.sequence(F.lit(0), F.size(toks) - n), lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    )
    sigs = documents.where(F.size(toks) >= n).select(
        "doc_id", minhash_signature(sh).alias("sig")
    )
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.struct(
                    bnd.alias("band"),
                    F.md5(F.to_json(F.slice("sig", bnd * rows_per_band + 1, rows_per_band))).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@pandas_udf(LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens.

    The whole Arrow batch is processed with flat numpy passes (mirroring
    minhash_signature): all tokens of all documents are hashed once, the
    +-1 bit votes are summed per document with add.reduceat - no
    per-document Python loop.
    """
    import numpy as np

    n_docs = len(text)
    tok_lists = [(t or "").split() for t in text]
    lengths = np.array([len(ts) for ts in tok_lists], dtype=np.int64)
    flat: list = []
    for ts in tok_lists:
        flat.extend(ts)
    out = np.zeros(n_docs, dtype=np.int64)
    if not flat:
        return pd.Series(out)
    hs = _hash64_np(flat)  # (S,)
    bits = np.arange(64, dtype=np.uint64)
    bitmat = ((hs[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)  # (S, 64)
    votes = 2 * bitmat - 1
    nonempty = lengths > 0
    offsets = np.zeros(int(nonempty.sum()), dtype=np.int64)
    np.cumsum(lengths[nonempty][:-1], out=offsets[1:])
    sums = np.add.reduceat(votes, offsets, axis=0)  # (D_nonempty, 64)
    sims = ((sums > 0).astype(np.uint64) << bits[None, :]).sum(axis=1, dtype=np.uint64)
    out[nonempty] = sims.astype(np.int64)  # two's complement wrap == Go/Java long
    return pd.Series(out)


def simhash_buckets(documents: DataFrame) -> DataFrame:
    """SimHash per doc + 16-bit band buckets for near-dup candidate scan."""
    df = documents.select("doc_id", simhash64("text").alias("simhash"))
    return df.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[F.shiftrightunsigned("simhash", s).bitwiseAND(F.lit(0xFFFF).cast("long")).alias(f"b{s}") for s in (0, 16, 32, 48)])
        ).alias("band_bucket"),
    )
