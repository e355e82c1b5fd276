"""Distributed graph operators: connected components.

The engine's near-dup stack (ngram_jaccard_pairs / minhash_lsh_candidates
/ embedding_near_dup) emits candidate PAIRS; turning pairs into duplicate
CLUSTERS (so one canonical doc per cluster survives) is a connected-
components problem.  The reference has no graph operator - this is part
of the training-data-pipeline extension surface.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce and
Beyond", SoCC 2014) - converges in O(log^2 n) rounds (O(log n) in
practice), each round two key-hashed shuffles.  Each star step is
expressed as groupBy-min + equi-join rather than collect_set, so a
celebrity node with 10^8 neighbours costs a wide join, never a single
in-memory neighbour array - the skew-safe form at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star: for each node u, connect every strictly-larger
    neighbour v to m = min(N(u) + {u}).  Input/output: (src, dst)."""
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.select("src", F.least("mn", F.col("src")).alias("m"))
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star: orient each edge (max, min); for each node u, connect
    every smaller neighbour and u itself to m = min(N(u) + {u})."""
    o = e.select(F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst"))
    mins = o.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.select("src", F.least("mn", F.col("src")).alias("m"))
    nbr = o.join(mins, "src").select(F.col("dst").alias("v"), "m")
    self_ = mins.select(F.col("src").alias("v"), "m")
    return (
        nbr.union(self_)
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
    )


def connected_components(edges: DataFrame, max_iters: int = 50) -> DataFrame:
    """Connected components of an undirected graph given as (src, dst)
    pairs; returns (node, component_id) for every node that appears in
    an edge, component_id = the component's minimum node id.

    Driver loop with per-round localCheckpoint (truncates the iterative
    lineage - on a cluster point spark.checkpoint.dir at durable storage
    and swap in .checkpoint()).  Convergence is detected by an O(1)-row
    aggregate signature (count + bit_xor of xxhash64 over the canonical
    oriented edge set): star steps only ever move edges toward smaller
    roots, so an unchanged set signature means fixpoint - one cheap
    action per round instead of a subtract() shuffle.
    """
    # node ids need only a total order (min/least/comparisons): long ids
    # and string ids both work; component_id keeps the input id type.
    # Checkpoint the INPUT edge set too: each star step references its
    # edges twice (e union e-reversed), so an unmaterialized upstream -
    # e.g. the whole MinHash-LSH candidate generation - would be
    # evaluated twice in round 1
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sig = None
    for _ in range(max_iters):
        e2 = _small_star(_large_star(e)).distinct().localCheckpoint(eager=True)
        # bit_xor: order-independent and cannot overflow (ANSI-safe where
        # sum(hash) is not); edges are distinct, so no XOR cancellation
        row = e2.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
        ).first()
        sig2 = (row["n"], row["h"])
        e = e2
        if sig2 == sig:
            break
        sig = sig2
    else:
        raise RuntimeError(f"connected_components: no fixpoint after {max_iters} rounds")
    # fixpoint edge set is a union of stars (leaf, root), root = min id
    return (
        e.select(F.col("src").alias("node"), F.col("dst").alias("component_id"))
        .union(e.select(F.col("dst").alias("node"), F.col("dst").alias("component_id")))
        .distinct()
    )
