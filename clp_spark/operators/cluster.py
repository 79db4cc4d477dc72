"""Graph clustering: connected components + near-duplicate cluster assignment.

The missing last step of every dedup pipeline: pair emitters (exact,
MinHash-LSH, SimHash, n-gram Jaccard — `operators/dedup.py`) produce EDGES;
training-data curation needs CLUSTERS — "these 17 documents are all the same
article; keep doc 42, drop the rest". That requires connected components over
the pair graph, because near-dup similarity is not transitive and pairs
alone over-retain (A~B, B~C but no A~C pair still must collapse to one
cluster to avoid keeping two copies of the B-bridge family).

Scale notes (100 TB / 10^12 nodes):
  * `connected_components` is the alternating large-star / small-star
    algorithm (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — O(log^2 n) rounds, each round two hash-shuffles on
    8-byte node ids, no driver-side graph state, no vertex-program
    framework. This is the same algorithm family GraphFrames/GraphX use for
    CC, re-expressed as plain DataFrame groupBy/join so Catalyst/AQE handle
    skew (a mega-component's hub node is a hot groupBy key; AQE skew
    handling + the star contraction itself bound it: each round strictly
    shrinks eccentricity).
  * Per-round `localCheckpoint` truncates the iterative lineage so the plan
    does not grow exponentially with rounds; on a real cluster point
    `spark.sparkContext.setCheckpointDir` at durable storage and flip
    `reliable=True` for executor-loss tolerance.
  * Convergence is detected by an aggregate fingerprint (count +
    bit-XOR of per-edge xxhash64) — one tiny job per round instead of a
    full self-subtract; XOR of 64-bit hashes makes a false "converged"
    astronomically unlikely and order-independent.

No counterpart in the reference repo: CLP stops at search/aggregation
(components/core/src/clp/Grep.cpp); clustering is part of this repo's
training-data-pipeline extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "neardup_clusters"]


def _symmetric(e: DataFrame) -> DataFrame:
    return e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to u's min neighborhood
    element (including u itself). Output is again an undirected edge set."""
    nb = _symmetric(e)
    mins = (
        nb.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
    )
    return (
        nb.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges large->small, connect every smaller neighbor (and u) to
    the minimum of the small neighborhood."""
    o = (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (
        o.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    pointers = mins.select("u", F.col("m").alias("v"))
    return rewired.unionByName(pointers).distinct()


def _fingerprint(e: DataFrame) -> tuple[int, int]:
    """(edge_count, order-independent xor of per-edge hashes) in one job."""
    row = e.agg(
        F.count("*").alias("n"),
        F.coalesce(
            # bit_xor of a canonical per-edge hash: order-independent
            F.expr("bit_xor(xxhash64(least(u, v), greatest(u, v)))"),
            F.lit(0),
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    node_col: str = "node",
    component_col: str = "component",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components of an undirected graph given as an edge list.

    Returns one row per node that appears in `edges`: (node, component),
    where component is the smallest node id in that node's component —
    deterministic canonical labels, so `min` doubles as the "keeper" rule.

    Alternating large-star/small-star contraction; converges in
    O(log^2 n) rounds (each round two shuffles). Isolated nodes never
    appear in an edge list — callers that need singletons union them in
    (see `neardup_clusters`).
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = _symmetric(e).select(F.col("u").alias(node_col)).distinct()

    prev_fp = _fingerprint(e)
    for _ in range(max_iters):
        nxt = _small_star(_large_star(e)).localCheckpoint(eager=True)
        fp = _fingerprint(nxt)
        e = nxt
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(raise max_iters; rounds needed grow ~log^2 of graph size)"
        )

    # Converged state is a star forest oriented child>root: child -> min root.
    child = (
        e.select(F.greatest("u", "v").alias("c"), F.least("u", "v").alias("r"))
        .groupBy("c")
        .agg(F.min("r").alias(component_col))
        .select(F.col("c").alias(node_col), component_col)
    )
    roots = nodes.join(child, node_col, "left_anti").select(
        F.col(node_col), F.col(node_col).alias(component_col)
    )
    return child.unionByName(roots)


def neardup_clusters(
    df: DataFrame,
    threshold: float = 0.6,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    pairs: DataFrame | None = None,
    include_singletons: bool = False,
) -> DataFrame:
    """Near-duplicate cluster assignment: (doc_id, cluster_id) with
    cluster_id = min doc_id of the cluster (the canonical "keeper").

    `pairs` defaults to the exact n-gram Jaccard pair emitter (oracle-able);
    at scale pass `minhash_lsh_pairs(...)` output instead — any DataFrame
    with (id_a, id_b) works, so the pair emitter and the cluster step
    compose freely. With `include_singletons` every document gets a row
    (docs in no pair form their own cluster), which is the shape a
    keep/drop curation filter wants.
    """
    if pairs is None:
        from .dedup import ngram_jaccard_pairs

        pairs = ngram_jaccard_pairs(df, threshold=threshold, k=k, text_col=text_col, id_col=id_col)
    cc = connected_components(
        pairs, src="id_a", dst="id_b", node_col=id_col, component_col="cluster_id"
    )
    if include_singletons:
        singles = df.select(id_col).join(cc, id_col, "left_anti").select(
            F.col(id_col), F.col(id_col).alias("cluster_id")
        )
        cc = cc.unionByName(singles)
    return cc
