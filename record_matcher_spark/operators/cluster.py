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
        from record_matcher_spark.operators.ids import dense_ids

        nodes_raw = (
            edges.select(F.col(src).alias("node"))
            .union(edges.select(F.col(dst).alias("node")))
            .distinct()
        )
        mapping = dense_ids(nodes_raw, "node", out="_nid").persist()
        enc = (
            edges.select(F.col(src).alias("node"), F.col(dst).alias("_d"))
            .join(mapping, "node")
            .select(F.col("_nid").alias("src"), F.col("_d").alias("node"))
            .join(mapping, "node")
            .select("src", F.col("_nid").alias("dst"))
        )
        labeled = connected_components(
            enc, "src", "dst", max_iterations, encode_ids=False
        )
        back = mapping.select(
            F.col("_nid").alias("node"), F.col("node").alias("_orig")
        )
        comp_back = mapping.select(
            F.col("_nid").alias("component"), F.col("node").alias("_comp_orig")
        )
        return (
            labeled.join(back, "node")
            .join(comp_back, "component")
            .select(
                F.col("_orig").alias("node"),
                F.col("_comp_orig").alias("component"),
            )
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
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
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
