"""Transitive clustering: connected components over DataFrame self-joins.

Implements the alternating large-star / small-star algorithm (R. Kiveris,
S. Lattanzi, V. Mirrokni, V. Rastogi, S. Vassilvitskii, "Connected
Components in MapReduce and Beyond", ACM SoCC 2014 — public algorithm,
re-derived here for the DataFrame API). Not present in the reference
(which resolves only per-y competition, matcher.py:408-447); required by
the north star to extend resolved match pairs into entity clusters.

Why this algorithm at 10^12-edge scale: each round is two groupBy/join
rounds over the edge list (no vertex-centric state), converges in
O(log^2 n) rounds on pathological graphs and 2-4 rounds on the
near-transitive match graphs ER produces; per-iteration
``localCheckpoint`` truncates lineage so plans stay flat.

Node ids are hashed to longs internally (min-comparison needs a total
order that matches the oracle: we order by the ORIGINAL id string, not the
hash, by carrying ids as (sortable) strings when requested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) bidirectional → for each u: connect strictly-larger neighbors
    to m(u) = min(N(u) ∪ {u})."""
    bidir = edges.select("u", "v").union(edges.select(F.col("v").alias("u"),
                                                      F.col("u").alias("v")))
    m = bidir.groupBy("u").agg(F.min("v").alias("mn"))
    m = m.select("u", F.least("mn", "u").alias("mn"))
    return (
        bidir.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Canonicalize to u >= v, then connect all small neighbors (and u) to
    m(u) = min(N_<=(u) ∪ {u})."""
    canon = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    m = canon.groupBy("u").agg(F.min("v").alias("mn"))
    neighbors = canon.join(m, "u").select(F.col("v").alias("u"),
                                          F.col("mn").alias("v"))
    self_edges = m.select("u", F.col("mn").alias("v"))
    return neighbors.union(self_edges).where(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    encode_ids: bool | None = None,
) -> DataFrame:
    """→ DataFrame[node, component] with component = min node id (by the
    natural ordering of the id column's type).

    Convergence: iterate large-star/small-star until the canonical edge
    set's (count, xxhash64-sum) signature is stable, then emit each node's
    component. Each iteration is localCheckpoint-ed: lineage stays O(1)
    instead of O(iterations).

    ``encode_ids`` (default: auto — on for string ids): dictionary-encode
    node ids to order-preserving dense longs (operators.ids) before
    iterating and decode after. Iterating on 8-byte keys instead of
    strings cuts shuffle bytes ~10x and, measured on this pipeline,
    removes a 4x CPU-inflation at 32 threads caused by string-pair
    allocation churn. Order preservation keeps ``component = min id``
    semantics identical.
    """
    if encode_ids is None:
        encode_ids = dict(edges.dtypes)[src] == "string"
    if encode_ids:
        # Inline hash encoding: node -> xxhash64(node) needs NO dictionary
        # join and NO driver action (an order-preserving dense-id scheme
        # via operators.ids was measured at ~7 serial AQE mini-jobs of
        # pure fixed overhead). Hash ids don't preserve order, so the
        # canonical ``component = min original id`` label is restored
        # afterwards with one groupBy over the component members.
        # Collision risk (two conv ids colliding at 64 bits merges two
        # clusters): ~n^2/2^65 — negligible below ~10^8 nodes; above
        # that, partition the CC by a corpus shard key or use
        # operators.ids.dense_ids explicitly.
        enc = edges.select(
            F.xxhash64(F.col(src)).alias("src"),
            F.xxhash64(F.col(dst)).alias("dst"),
        )
        labeled = connected_components(
            enc, "src", "dst", max_iterations, encode_ids=False
        )
        mapping = (
            edges.select(F.col(src).alias("_orig"))
            .union(edges.select(F.col(dst).alias("_orig")))
            .distinct()
            .select("_orig", F.xxhash64(F.col("_orig")).alias("node"))
        )
        with_str = labeled.join(mapping, "node")
        comp_min = with_str.groupBy("component").agg(
            F.min("_orig").alias("_cluster")
        )
        return with_str.join(comp_min, "component").select(
            F.col("_orig").alias("node"),
            F.col("_cluster").alias("component"),
        )

    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col(src) != F.col(dst)
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )

    def signature(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-independent, no ANSI overflow (vs sum of hashes)
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).first()
        return row["n"], row["h"]

    prev_sig = None
    for _ in range(max_iterations):
        # ONE star round per lazy localCheckpoint: the round's input is
        # consumed 3-4x by the star operators, so it MUST be materialized
        # every round (batching two rounds per checkpoint was measured
        # 2.2x slower — the unmaterialized intermediate re-executes per
        # consumer). The checkpoint is lazy so the signature aggregate
        # below is the single action per round — it materializes the
        # checkpoint as a side effect instead of running a separate job.
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        sig = signature(e)
        if sig == prev_sig:
            break
        prev_sig = sig

    # after convergence edges form stars rooted at component minima
    comp = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    labeled = comp.union(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )
    # isolated nodes (no surviving edges) are their own component
    return (
        nodes.join(labeled, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )
