"""Transcript pipeline tests: datagen determinism, rollup invariant,
connected components vs union-find oracle, end-to-end cluster agreement
with the reference-semantics oracle, pairwise F1."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from record_matcher_spark.datagen import generate_transcripts
from record_matcher_spark.operators.blocking import (
    DEFAULT_TRANSCRIPT_KEYS,
    candidate_pairs,
)
from record_matcher_spark.operators.cluster import connected_components
from record_matcher_spark.operators.rollup import (
    explode_turns,
    rollup_conversations,
)
from record_matcher_spark.oracle import oracle_clusters, oracle_union_find
from record_matcher_spark.pipeline import (
    default_transcript_match_config,
    match_transcripts,
    pairwise_f1,
)

N_ENTITIES = 60
SEED = 7


def _corpus(spark):
    t, truth = generate_transcripts(spark, N_ENTITIES, seed=SEED, num_partitions=4)
    return t.cache(), truth.cache()


def test_datagen_deterministic(spark):
    t1, _ = generate_transcripts(spark, 20, seed=3, num_partitions=2)
    t2, _ = generate_transcripts(spark, 20, seed=3, num_partitions=5)
    r1 = sorted(map(tuple, t1.collect()))
    r2 = sorted(map(tuple, t2.collect()))
    assert r1 == r2  # partitioning-independent
    assert len(r1) > 100
    t3, _ = generate_transcripts(spark, 20, seed=4, num_partitions=2)
    assert sorted(map(tuple, t3.collect())) != r1


def test_rollup_roundtrip_invariant(spark):
    """Per-turn text equality under stable turn ordering (input_hint)."""
    t, _ = _corpus(spark)
    conv = rollup_conversations(t)
    back = explode_turns(conv)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    a = sorted(map(tuple, t.select(*cols).collect()))
    b = sorted(map(tuple, back.select(*cols).collect()))
    assert a == b


def test_rollup_derived_columns(spark):
    t, _ = _corpus(spark)
    conv = rollup_conversations(t)
    row = conv.where(F.col("n_turns") >= 3).first()
    assert row["full_text"].count("\n") == row["n_turns"] - 1
    assert row["role_seq"].split(">")[0] in ("user", "assistant", "tool", "bot")
    first_user = [
        tr["text"] for tr in sorted(row["turns"], key=lambda r: r["turn_idx"])
        if tr["role"] == "user"
    ]
    assert row["first_user_text"] == (first_user[0] if first_user else "")


def test_connected_components_vs_union_find(spark):
    rng = random.Random(99)
    for trial in range(3):
        n = 60
        nodes = [f"n{i:03d}" for i in range(n)]
        edges = [
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(rng.randint(10, 80))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        edf = spark.createDataFrame(edges or [("n000", "n001")], "src string, dst string")
        got = {
            r["node"]: r["component"]
            for r in connected_components(edf, "src", "dst").collect()
        }
        edge_nodes = {a for a, _ in edges} | {b for _, b in edges} or {"n000", "n001"}
        exp = oracle_union_find(sorted(edge_nodes), edges or [("n000", "n001")])
        assert got == exp, f"trial {trial}"


def test_connected_components_local_equals_distributed(spark):
    """The size-gated single-task kernel and the star-round path label
    identically (incl. self-loops, isolated-by-self-loop nodes, and a
    long chain that stresses the kernel's pointer jumping)."""
    rng = random.Random(41)
    nodes = [f"n{i:03d}" for i in range(80)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(90)]
    # a 40-node chain: diameter >> 1 forces several kernel rounds
    chain = [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(40)]
    edges += chain + [("loop", "loop")]
    edf = spark.createDataFrame(edges, "src string, dst string")
    local = {
        r["node"]: r["component"]
        for r in connected_components(edf, "src", "dst").collect()
    }
    dist = {
        r["node"]: r["component"]
        for r in connected_components(
            edf, "src", "dst", local_max_edges=0
        ).collect()
    }
    assert local == dist
    assert local["loop"] == "loop"  # self-loop node = own component
    assert {local[f"c{i:03d}"] for i in range(41)} == {"c000"}


def test_min_id_per_component_kernel():
    """Sort/reduceat representative restore == per-group Python min,
    for string ids (U-dtype fast path), ids with embedded NULs (object
    fallback — numpy U storage truncates at NUL, so 'a\\x00z' must still
    order as Python compares it), and integer ids."""
    import numpy as np

    from record_matcher_spark.operators.cluster import _min_id_per_component

    cases = [
        np.array(["b", "a", "c", "z", "m"], dtype=object),
        np.array(["a\x00z", "a", "a\x00a", "b"], dtype=object),
        np.array([7, 3, 9, 1, 5], dtype=np.int64),
    ]
    rng = random.Random(5)
    for u in cases:
        label = np.array([rng.randrange(2) for _ in u], dtype=np.int64)
        got = _min_id_per_component(u, label)
        exp = [min(u[j] for j in range(len(u)) if label[j] == label[i])
               for i in range(len(u))]
        assert list(got) == exp, u
    assert len(_min_id_per_component(np.array([], dtype=object),
                                     np.array([], dtype=np.int64))) == 0


def test_connected_components_dense_id_escalation(spark):
    """Above dense_id_threshold the encode path switches from 64-bit
    hashes to exact order-preserving dense ids automatically; labels must
    be identical to the hash path (threshold forced low to drive the
    escalated branch through a real graph: random edges + a chain)."""
    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(70)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)]
    edges += [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(30)]
    edges = [(a, b) for a, b in edges if a != b]
    edf = spark.createDataFrame(edges, "src string, dst string")
    dense = {
        r["node"]: r["component"]
        for r in connected_components(
            edf, "src", "dst", local_max_edges=0, dense_id_threshold=10
        ).collect()
    }
    hashed = {
        r["node"]: r["component"]
        for r in connected_components(
            edf, "src", "dst", local_max_edges=0, dense_id_threshold=None
        ).collect()
    }
    assert dense == hashed
    edge_nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    assert dense == oracle_union_find(edge_nodes, edges)


def test_connected_components_null_endpoints_ignored(spark):
    edges = [("a", "b"), (None, "b"), ("c", None)]
    edf = spark.createDataFrame(edges, "src string, dst string")
    for kw in ({}, {"local_max_edges": 0}):
        got = {
            r["node"]: r["component"]
            for r in connected_components(edf, "src", "dst", **kw).collect()
        }
        # edges with a NULL endpoint vanish entirely (c had only one)
        assert got == {"a": "a", "b": "a"}


def test_blocking_recall_and_determinism(spark):
    t, truth = _corpus(spark)
    conv = rollup_conversations(t)
    cand = candidate_pairs(conv, conv, DEFAULT_TRANSCRIPT_KEYS)
    c1 = set(map(tuple, cand.collect()))
    c2 = set(map(tuple, candidate_pairs(conv, conv, DEFAULT_TRANSCRIPT_KEYS).collect()))
    assert c1 == c2  # deterministic keys
    # blocking recall over same-entity unordered pairs
    tr = {r["conv_id"]: r["entity_id"] for r in truth.collect()}
    ents: dict[str, list[str]] = {}
    for c, e in tr.items():
        ents.setdefault(e, []).append(c)
    pos = {
        (min(a, b), max(a, b))
        for convs in ents.values()
        for i, a in enumerate(convs)
        for b in convs[i + 1 :]
    }
    cand_unordered = {(min(a, b), max(a, b)) for a, b in c1 if a != b}
    if pos:
        recall = len(pos & cand_unordered) / len(pos)
        assert recall > 0.8, f"blocking recall {recall}"


def test_pipeline_matches_oracle_clusters(spark):
    """Engine clusters must equal the reference-semantics oracle clusters
    exactly (pairwise F1 = 1.0 vs oracle >= the 0.99 bar); and F1 vs
    entity truth under identical blocking keys stays high."""
    t, truth = _corpus(spark)
    cfg = default_transcript_match_config()
    res = match_transcripts(t, cfg)

    got_clusters = {
        r["conv_id"]: r["cluster_id"] for r in res.clusters.collect()
    }

    # oracle on the same conversation records + same candidate set
    conv_rows = res.conversations.drop("turns", "ts_min", "n_turns").collect()
    records = {
        r["conv_id"]: {k: v for k, v in r.asDict().items() if k != "conv_id"}
        for r in conv_rows
    }
    cand_map: dict[str, set] = {}
    for r in res.candidates.collect():
        cand_map.setdefault(r["x_id"], set()).add(r["y_id"])
    exp_clusters = oracle_clusters(records, cfg, cand_map)

    # compare as partitions (label = min member both sides)
    assert got_clusters == exp_clusters


def test_pipeline_threshold_mode_f1(spark):
    """Threshold edge mode: engine clusters equal the threshold-mode oracle
    AND recover the planted entities (F1 vs truth under identical blocking
    keys)."""
    from record_matcher_spark.oracle import oracle_threshold_clusters

    t, truth = _corpus(spark)
    cfg = default_transcript_match_config()
    res = match_transcripts(t, cfg, edge_mode="threshold")

    got_clusters = {
        r["conv_id"]: r["cluster_id"] for r in res.clusters.collect()
    }
    conv_rows = res.conversations.drop("turns", "ts_min", "n_turns").collect()
    records = {
        r["conv_id"]: {k: v for k, v in r.asDict().items() if k != "conv_id"}
        for r in conv_rows
    }
    cand_map: dict[str, set] = {}
    for r in res.candidates.collect():
        cand_map.setdefault(r["x_id"], set()).add(r["y_id"])
    exp_clusters = oracle_threshold_clusters(records, cfg, cand_map)
    assert got_clusters == exp_clusters

    metrics = pairwise_f1(res.clusters, truth, res.candidates)
    assert metrics["f1"] >= 0.95, metrics
    assert metrics["precision"] >= 0.95, metrics


def test_block_cap_bounds_hot_block(spark):
    """Skew smoke (SURVEY §5.3): one hot blocking key >> all others must be
    dropped by the family cap, so candidate counts (max per-key join input)
    stay bounded instead of going O(hot^2); recall for the hot-shaped rows
    comes from other key families by design."""
    from record_matcher_spark.operators.blocking import BlockingKey

    rows = [(f"h{i}", "HOT") for i in range(500)] + [
        (f"c{i}", f"cold{i // 3}") for i in range(60)
    ]
    df = spark.createDataFrame(rows, "conv_id string, shape string")
    key = BlockingKey("shape", lambda d: F.col("shape"), max_block_size=64)
    cand = candidate_pairs(df, df, [key], dedup_mode=True, cache=False)
    pairs = cand.collect()
    # hot block (500 rows -> would be 124,750 pairs) must contribute none
    assert all(a.startswith("c") and b.startswith("c") for a, b in map(tuple, pairs))
    # cold blocks of 3 -> 3 unordered pairs each
    assert len(pairs) == 60
    # uncapped control: the same key without a cap explodes combinatorially
    uncapped = BlockingKey("shape", lambda d: F.col("shape"))
    n_uncapped = candidate_pairs(df, df, [uncapped], dedup_mode=True,
                                 cache=False).count()
    assert n_uncapped == 124_750 + 60


def test_pipeline_unpersist_releases_cached_frames(spark):
    """match_transcripts registers every persisted DataFrame and
    unpersist() releases them (no storage accumulation across runs)."""
    t, _ = _corpus(spark)
    res = match_transcripts(t, edge_mode="threshold")
    res.clusters.count()
    assert len(res.persisted) >= 4  # conv, keyed relation, cand, pairs, clusters
    assert any(df.storageLevel.useMemory for df in res.persisted)
    res.unpersist()
    assert res.persisted == []


def test_observation_progress_metrics(spark):
    """observe=True collects per-stage metrics during the stage actions
    (Observation — the Spark-native update_func replacement) without any
    extra jobs; numbers agree with direct counts."""
    t, _ = _corpus(spark)
    res = match_transcripts(t, edge_mode="threshold", observe=True)
    n = res.clusters.count()
    prog = res.progress()
    assert set(prog) == {"conversations", "candidates", "pairs", "clusters"}
    assert prog["conversations"]["n_conversations"] == res.conversations.count()
    assert prog["clusters"]["n_rows"] == n
    assert prog["pairs"]["n_scored_pairs"] >= prog["pairs"]["n_passing"] > 0
    assert prog["conversations"]["avg_turns"] > 1
    res.unpersist()


def test_scoring_stage_build_is_job_free_and_exact(spark):
    """Constructing the pipeline's scoring stage must trigger NO Spark job:
    with lazy_uniqueness the weight statistics ride the plan as a
    broadcast one-row aggregate (scoring._lazy_uniqueness_columns)
    instead of an eager collect — and the resulting scores must be
    BIT-identical to the eager path (both divide the same exact integer
    counts with one correctly-rounded double division)."""
    from record_matcher_spark.operators.blocking import candidate_pairs
    from record_matcher_spark.operators.scoring import score_candidate_pairs
    from record_matcher_spark.pipeline import default_transcript_match_config

    t, _ = _corpus(spark)
    conv = rollup_conversations(t).drop("turns").cache()
    conv.count()  # materialize inputs; the assertion targets PLAN BUILDING
    cfg = default_transcript_match_config()
    cand = candidate_pairs(conv, conv, cache=False).where("x_id <> y_id")
    cand = cand.cache()
    cand.count()

    sc = spark.sparkContext
    sc.setJobGroup("rm-build-probe", "plan construction must run no jobs")
    try:
        lazy = score_candidate_pairs(conv, conv, cand, cfg,
                                     lazy_uniqueness=True)
        jobs = sc.statusTracker().getJobIdsForGroup("rm-build-probe")
        assert list(jobs) == [], f"plan construction ran jobs: {jobs}"
    finally:
        sc.setJobGroup("", "")

    eager = score_candidate_pairs(conv, conv, cand, cfg)
    key = lambda r: (r["x_id"], r["y_id"])  # noqa: E731
    lz = sorted(map(tuple, lazy.collect()), key=lambda r: (r[0], r[1]))
    eg = sorted(map(tuple, eager.collect()), key=lambda r: (r[0], r[1]))
    assert len(lz) == len(eg) > 0
    assert lz == eg  # bitwise: float equality, not tolerance
    conv.unpersist(); cand.unpersist(); t.unpersist()
