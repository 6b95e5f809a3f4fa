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

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

#: Edge-count gate below which CC is solved in ONE executor task (the
#: "filtering to a single machine" endgame the MapReduce-CC literature
#: pairs with star rounds once the graph is small). 4M edges ≈ 64 MB as
#: long pairs / a few hundred MB as strings — comfortable for one task.
LOCAL_CC_MAX_EDGES = 4_000_000


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


def _cc_label_kernel(a: np.ndarray, b: np.ndarray, m: int) -> np.ndarray:
    """Vectorized min-label propagation with pointer jumping.

    ``a``/``b``: edge endpoints as int codes in [0, m). Returns per-node
    labels where ``label[v]`` = the smallest code in v's component.

    Each round: (1) per-edge candidate label = min of the endpoints'
    labels, (2) per-node min over incident edges via one ``reduceat``
    over a precomputed incidence ordering (no per-edge Python, no slow
    ``ufunc.at``), (3) one pointer-jump ``label[label]`` halves chain
    depth, so rounds are O(log diameter). Labels are monotone
    non-increasing and bounded by the component minimum, so the fixpoint
    is exact (every edge then has equal endpoint labels and the label
    map is idempotent).
    """
    label = np.arange(m, dtype=np.int64)
    if a.size == 0:
        return label
    ends = np.concatenate([a, b])
    order = np.argsort(ends, kind="stable")
    sorted_nodes = ends[order]
    starts = np.flatnonzero(
        np.r_[True, sorted_nodes[1:] != sorted_nodes[:-1]]
    )
    run_nodes = sorted_nodes[starts]
    while True:
        mn = np.minimum(label[a], label[b])
        per_node = np.minimum.reduceat(
            np.concatenate([mn, mn])[order], starts
        )
        new = label.copy()
        new[run_nodes] = np.minimum(new[run_nodes], per_node)
        new = new[new]
        if np.array_equal(new, label):
            return label
        label = new


def _min_id_per_component(uniques: np.ndarray, label: np.ndarray) -> np.ndarray:
    """Per-node representative = MIN ORIGINAL id in the node's component.

    ``uniques``: node ids (any orderable dtype), ``label``: per-node
    component labels (min-code ints from :func:`_cc_label_kernel`).
    Entirely sort + ``reduceat`` based: a pandas string
    ``groupby(label).min()`` here measured 12s single-task at 2.4M nodes
    (the dominant serial cost of the whole local-CC path); the rank
    vector + per-component ``minimum.reduceat`` below does the same in
    <1s. Object (string) ids are compared via numpy's fixed-width
    unicode dtype when it round-trips (code-point order == Python str
    order); ids with embedded NULs fall back to object argsort.
    """
    u = np.asarray(uniques)
    if len(u) == 0:
        return u
    sort_key = u
    if u.dtype == object:
        uu = u.astype("U")
        # numpy U-storage truncates at embedded NULs; verify round-trip
        # lengths before trusting its ordering
        lens = np.fromiter((len(s) for s in u), dtype=np.int64, count=len(u))
        if np.array_equal(np.char.str_len(uu), lens):
            sort_key = uu
    order = np.argsort(sort_key, kind="stable")
    rank = np.empty(len(u), dtype=np.int64)
    rank[order] = np.arange(len(u), dtype=np.int64)
    by_label = np.argsort(label, kind="stable")
    lab_sorted = label[by_label]
    starts = np.flatnonzero(np.r_[True, lab_sorted[1:] != lab_sorted[:-1]])
    min_rank = np.minimum.reduceat(rank[by_label], starts)
    lut = np.empty(len(u), dtype=np.int64)
    lut[lab_sorted[starts]] = min_rank
    return u[order[lut[label]]]


def _local_cc(ec: DataFrame) -> DataFrame:
    """CC on one executor task: repartition(1) + a numpy kernel batch.

    ``ec``: DataFrame[u, v], null-free. Ids of any orderable type; the
    component label is the MIN ORIGINAL id (ids are factorized hash-wise,
    then the representative is restored rank-wise, see
    :func:`_min_id_per_component` — no per-group Python). Self-loop
    endpoints count as nodes (own component), like the distributed
    path's node set.
    """
    id_type = ec.schema["u"].dataType
    out_schema = StructType(
        [
            StructField("node", id_type, True),
            StructField("component", id_type, True),
        ]
    )

    def solve(batches):
        import pandas as pd

        a_parts: list = []
        b_parts: list = []
        for pdf in batches:
            a_parts.append(pdf["u"].to_numpy())
            b_parts.append(pdf["v"].to_numpy())
        if not a_parts:
            return
        av = np.concatenate(a_parts)
        bv = np.concatenate(b_parts)
        codes, uniques = pd.factorize(np.concatenate([av, bv]))
        m = len(uniques)
        a = codes[: len(av)].astype(np.int64)
        b = codes[len(av):].astype(np.int64)
        keep = a != b
        label = _cc_label_kernel(a[keep], b[keep], m)
        nodes = np.asarray(uniques)
        yield pd.DataFrame(
            {
                "node": nodes,
                "component": _min_id_per_component(nodes, label),
            }
        )

    return ec.repartition(1).mapInPandas(solve, out_schema)


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


#: Estimated-node-count threshold above which hash id encoding (64-bit,
#: collision risk ~n^2/2^65) is automatically escalated to exact
#: order-preserving dense ids (operators/ids.dense_ids). At 10^8 nodes the
#: collision probability is ~3e-4 and grows quadratically — past this
#: point the dictionary join is the correct trade.
DENSE_ID_NODE_THRESHOLD = 100_000_000


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    encode_ids: bool | None = None,
    local_max_edges: int | None = LOCAL_CC_MAX_EDGES,
    dense_id_threshold: int | None = DENSE_ID_NODE_THRESHOLD,
) -> DataFrame:
    """→ DataFrame[node, component] with component = min node id (by the
    natural ordering of the id column's type). Edges with a NULL endpoint
    are ignored entirely (a NULL id is not a node).

    Two physical strategies, size-gated like AQE's join choices:

    - ``count(edges) <= local_max_edges``: ONE executor task solves the
      whole graph with a vectorized numpy kernel (min-label propagation +
      pointer jumping, O(E log d) vectorized ops) via ``mapInPandas`` —
      below this size the star rounds' per-round shuffle/stage overhead
      dominates wall-clock (measured ~0.9 s/round at 10^4 edges on
      local[32], all fixed cost), while one Arrow batch solves it in
      milliseconds. Still an executor task, NOT a driver collect. String
      ids are hash-encoded BEFORE the single task (see ``encode_ids``) so
      it consumes 16-byte long pairs; the min-original-id labels are
      restored by parallel joins afterwards. The gate costs one count job
      over the edge projection — cheap when the upstream (scored pairs)
      is persisted, as in pipeline/match stages; pass
      ``local_max_edges=0`` to skip both the count and the local path
      (e.g. when edges is an expensive unmaterialized DAG).
    - otherwise: alternating large-star/small-star rounds until the
      canonical edge set's (count, xxhash64-xor) signature is stable,
      then emit each node's component. Each round is localCheckpoint-ed:
      lineage stays O(1) instead of O(rounds). This is the 10^12-turn
      path — a corpus-scale match graph exceeds any single-task gate.

    ``encode_ids`` (default: auto — on for string ids): hash-encode node
    ids to longs before iterating and decode after (distributed path
    only; the local kernel factorizes ids itself). Iterating on 8-byte
    keys instead of strings cuts shuffle bytes ~10x and, measured on this
    pipeline, removes a 4x CPU-inflation at 32 threads caused by
    string-pair allocation churn.

    ``dense_id_threshold``: when the encode path engages, one
    ``approx_count_distinct`` probe estimates the node count; at or above
    the threshold the 64-bit hash scheme (collision ~n^2/2^65) is
    escalated automatically to exact order-preserving dense ids
    (operators/ids.dense_ids — min over dense ids == min over original
    ids, so labels are identical and no post-hoc min-restore groupBy is
    needed). The probe is one scan of the edge projection — noise next to
    the star rounds at that scale, and it never runs on graphs small
    enough for the local kernel (they return before this branch). Pass
    ``None`` to pin the hash scheme (e.g. when the input DAG is expensive
    and unmaterialized and the node count is known small).
    """
    if encode_ids is None:
        encode_ids = dict(edges.dtypes)[src] == "string"
    if not encode_ids and local_max_edges:
        # Canonicalize to unordered-distinct first: match edges arrive
        # DIRECTED (a->b and b->a both present for most matched pairs),
        # so one cheap skinny-row distinct halves the graph — often the
        # difference between the star rounds and the single-task kernel.
        # Self-loops survive (least==greatest) so their nodes still label.
        # Lazy localCheckpoint BEFORE the gate count: the count is the
        # single action that materializes it, and whichever path wins —
        # the local kernel or the star rounds below — consumes the
        # materialized halved edge set instead of re-running the distinct
        # (the pre-round-4 code paid the distinct once for the gate and
        # then fed the star rounds the RAW directed list; flagged in
        # round-4 review).
        ec = (
            edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
            .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
            .select(
                F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        if ec.count() <= local_max_edges:
            return _local_cc(ec)
        # Over the gate: the star rounds consume the canonical edge set
        # (their first iteration starts on half the rows). Recurse with
        # the gate disabled — the distinct/count are already paid.
        return connected_components(
            ec.select(F.col("u").alias(src), F.col("v").alias(dst)),
            src, dst, max_iterations, encode_ids=False, local_max_edges=0,
        )
    if encode_ids:
        # Inline hash encoding: node -> xxhash64(node) needs NO dictionary
        # join and NO driver action (an order-preserving dense-id scheme
        # via operators.ids was measured at ~7 serial AQE mini-jobs of
        # pure fixed overhead). Hash ids don't preserve order, so the
        # canonical ``component = min original id`` label is restored
        # afterwards with one groupBy over the component members.
        # Collision risk (two conv ids colliding at 64 bits merges two
        # clusters): ~n^2/2^65 — negligible below ~10^8 nodes; above the
        # dense_id_threshold probe the exact dense-id path takes over.
        # This is the one correctness-critical hash-equality reliance in
        # the repo (README, "64-bit hash-equality risk register").
        # null endpoints dropped BEFORE hashing: xxhash64(NULL) is a real
        # long (null input hashes to the seed), which would fabricate a node
        nonnull = edges.where(
            F.col(src).isNotNull() & F.col(dst).isNotNull()
        )
        # Canonical unordered-distinct over the HASHED ids (cheap long
        # comparisons): directed match edges carry each unordered pair
        # twice, so this halves every downstream consumer — the local
        # kernel's Arrow transfer, or the star rounds' first iteration.
        canon = (
            nonnull.select(
                F.xxhash64(F.col(src)).alias("_s"),
                F.xxhash64(F.col(dst)).alias("_d"),
            )
            .select(
                F.least("_s", "_d").alias("src"),
                F.greatest("_s", "_d").alias("dst"),
            )
            .distinct()
            # lazy checkpoint: the gate count / node probe materializes
            # it once; the local kernel or star rounds then read the
            # halved edges instead of re-running the distinct
            .localCheckpoint(eager=False)
        )
        # Local gate runs BEFORE the probe/star machinery, but on the
        # HASH-ENCODED canonical edges: the single task then reads
        # 16-byte long pairs instead of id strings (measured: the
        # string-fed task was ~9s serial at 3M edges — mostly
        # Arrow/pandas object decode — vs ~2s on longs), and the
        # min-original-id restore below runs as ordinary parallel joins.
        # Under the gate n <= 2 * local_max_edges nodes, so 64-bit
        # collisions are negligible and the dense-id probe is skipped.
        under_gate = False
        if local_max_edges:
            under_gate = canon.count() <= local_max_edges
        if not under_gate and dense_id_threshold:
            n_est = (
                canon.select(
                    F.explode(F.array(F.col("src"), F.col("dst"))).alias("_n")
                )
                .agg(F.approx_count_distinct("_n").alias("n"))
                .first()["n"]
            )
            if n_est >= dense_id_threshold:
                from record_matcher_spark.operators.ids import dense_ids

                nodes_all = (
                    nonnull.select(F.col(src).alias("_orig"))
                    .union(nonnull.select(F.col(dst).alias("_orig")))
                    .distinct()
                )
                mapping = dense_ids(nodes_all, "_orig", out="_id")
                enc = (
                    nonnull.join(
                        mapping.select(
                            F.col("_orig").alias("__s"),
                            F.col("_id").alias("_sid"),
                        ),
                        F.col(src) == F.col("__s"),
                    )
                    .join(
                        mapping.select(
                            F.col("_orig").alias("__d"),
                            F.col("_id").alias("_did"),
                        ),
                        F.col(dst) == F.col("__d"),
                    )
                    .select(
                        F.col("_sid").alias("src"), F.col("_did").alias("dst")
                    )
                )
                labeled = connected_components(
                    enc, "src", "dst", max_iterations, encode_ids=False,
                    local_max_edges=0,
                )
                # dense ids are order-preserving: the min dense id IS the
                # min original id — decode with two dictionary joins, no
                # min-restore aggregation
                dec_n = mapping.select(
                    F.col("_id").alias("node"), F.col("_orig").alias("_no")
                )
                dec_c = mapping.select(
                    F.col("_id").alias("component"),
                    F.col("_orig").alias("_co"),
                )
                return (
                    labeled.join(dec_n, "node")
                    .join(dec_c, "component")
                    .select(
                        F.col("_no").alias("node"),
                        F.col("_co").alias("component"),
                    )
                )
        if under_gate:
            labeled = _local_cc(
                canon.select(F.col("src").alias("u"), F.col("dst").alias("v"))
            )
        else:
            labeled = connected_components(
                canon, "src", "dst", max_iterations, encode_ids=False,
                local_max_edges=0,
            )
        mapping = (
            nonnull.select(F.col(src).alias("_orig"))
            .union(nonnull.select(F.col(dst).alias("_orig")))
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

    nn = edges.where(F.col(src).isNotNull() & F.col(dst).isNotNull())
    e = nn.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col(src) != F.col(dst)
    )
    nodes = (
        nn.select(F.col(src).alias("node"))
        .union(nn.select(F.col(dst).alias("node")))
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
