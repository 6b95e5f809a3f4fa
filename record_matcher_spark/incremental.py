"""Incremental transcript entity resolution: fold a NEW batch of
transcripts into an already-clustered corpus without re-scoring or
re-clustering the base.

Why this exists at 100 TB: the batch pipeline (pipeline.match_transcripts)
is a full recompute — candidate generation over all pairs of blocks,
scoring, and connected components over the whole match graph. When a
corpus is already resolved and a daily/hourly slice arrives, the only new
information is edges INCIDENT TO THE BATCH; everything the base graph
already decided is summarized losslessly by its cluster labels. So the
increment:

1. rolls up only the batch's transcripts;
2. blocks batch conversations against (base ∪ batch) — a plain equi-join
   against the base's keyed relation, which a production deployment keeps
   materialized (bucketed by key) and only APPENDS to per batch;
3. scores only those candidate pairs (same vectorized scorers, with the
   corpus-level uniqueness weights so a small batch's skewed column
   statistics cannot shift row weights — see ``uniqueness``);
4. contracts every base endpoint to its cluster label and runs connected
   components on the contracted graph — node count is O(|batch| + touched
   clusters), NOT O(corpus); the base graph is never revisited.

A component that captures two or more base labels is a MERGE discovered by
new evidence; the survivor is the smallest base label and the remap is
reported in ``IncrementResult.merges`` (apply with :func:`apply_merges` —
an O(|merged clusters|) broadcast-join touch-up of the assignment table,
not a rewrite).

Equivalence to the batch pipeline: on a corpus whose match margins are
wide (every true pair scores well above threshold, every false candidate
well below — e.g. the closed-form driver corpus in ``__spark_entry__``),
incremental and full-batch runs produce the identical partition of
conversations into clusters; tests/test_incremental.py pins this. With
thin margins they can differ exactly where any streaming system must:
uniqueness weights drift as the corpus grows (frozen here by contract)
and block caps see different block sizes.

Structured Streaming wrapper: this function is deliberately a pure batch
operator so it drops into ``foreachBatch`` unchanged::

    def sink(batch_df, batch_id):
        inc = match_increment(batch_df, base_conv, base_clusters, ...)
        ...append inc.conversations / inc.assignments, apply inc.merges...

    stream.writeStream.foreachBatch(sink).start()

(the state tables live in the lake, e.g. sources.checkpoints.StageStore —
per-batch exactly-once comes from the sink's idempotent overwrite keyed by
batch_id, the standard Spark pattern).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from record_matcher_spark.config import MatchConfig
from record_matcher_spark.operators.blocking import (
    DEFAULT_TRANSCRIPT_KEYS,
    BlockingKey,
    candidate_pairs,
)
from record_matcher_spark.operators.cluster import connected_components
from record_matcher_spark.operators.resolve import resolve_matches
from record_matcher_spark.operators.rollup import rollup_conversations
from record_matcher_spark.operators.scoring import (
    score_candidate_pairs,
    uniqueness_by_columns,
)
from record_matcher_spark.pipeline import default_transcript_match_config


@dataclass
class IncrementResult:
    conversations: DataFrame  # batch rollup (slim, no `turns`)
    candidates: DataFrame  # [x_id, y_id]: x = batch conv, y = base or batch
    pairs: DataFrame  # scored candidate pairs
    assignments: DataFrame  # [conv_id, cluster_id] for the BATCH convs
    merges: DataFrame  # [old_cluster_id, cluster_id] base clusters remapped
    persisted: list = field(default_factory=list)

    def unpersist(self) -> None:
        """Release every DataFrame this increment persisted."""
        for df in self.persisted:
            try:
                df.unpersist()
            except Exception:
                pass
        self.persisted.clear()


def apply_merges(base_clusters: DataFrame, merges: DataFrame) -> DataFrame:
    """Rewrite base cluster labels through the merge map:
    ``[conv_id, cluster_id]`` with merged labels replaced by survivors.

    The merge map is tiny (only clusters newly connected by this batch),
    so the join broadcasts; rows in unaffected clusters pass through the
    left join unchanged — no shuffle of the base table on a real cluster
    when the output is written back partition-aligned.
    """
    m = F.broadcast(
        merges.select(
            F.col("old_cluster_id").alias("cluster_id"),
            F.col("cluster_id").alias("__rm_new_cl"),
        )
    )
    return (
        base_clusters.join(m, "cluster_id", "left")
        .select(
            "conv_id",
            F.coalesce("__rm_new_cl", "cluster_id").alias("cluster_id"),
        )
    )


def match_increment(
    new_transcripts: DataFrame,
    base_conversations: DataFrame,
    base_clusters: DataFrame,
    keys: Sequence[BlockingKey] = DEFAULT_TRANSCRIPT_KEYS,
    cfg: MatchConfig | None = None,
    *,
    edge_mode: str = "threshold",
    edge_statuses: tuple[str, ...] = ("matched", "review"),
    uniqueness: Mapping[str, float] | None = None,
    cache: bool = True,
) -> IncrementResult:
    """Match a batch of transcripts against a clustered base corpus.

    ``new_transcripts``: turn-level rows (rollup schema) for the batch;
    conv_ids must be disjoint from the base.
    ``base_conversations``: the slim conversation rollup of the base
    corpus (e.g. ``TranscriptMatchResult.conversations`` of the run that
    produced ``base_clusters``); any extra columns are ignored.
    ``base_clusters``: ``[conv_id, cluster_id]`` for every base conv.

    ``edge_mode`` / ``edge_statuses``: as in
    :func:`pipeline.match_transcripts` (threshold = transitive-closure
    recall, best_match = reference claim semantics).

    ``uniqueness``: per-column uniqueness for the scoring weights.
    Default None computes it over base ∪ batch — the same statistic the
    full-batch pipeline would use, so shared pairs score identically.
    Production deployments freeze a corpus-level map instead (one
    aggregate over the base, reused every batch) — weights then cannot
    drift between batches.

    Returns assignments for the batch's conversations (singletons keep
    their own conv_id, like the batch pipeline) plus the base-cluster
    merge map. The base assignment table itself is NOT rewritten here —
    apply ``merges`` with :func:`apply_merges`.
    """
    if edge_mode not in ("best_match", "threshold"):
        raise ValueError(f"unknown edge_mode {edge_mode!r}")
    cfg = cfg or default_transcript_match_config()
    persisted: list = []

    def _persist(df: DataFrame) -> DataFrame:
        if cache:
            df = df.persist()
            persisted.append(df)
        return df

    newc = _persist(
        rollup_conversations(new_transcripts, tokens=True).drop("turns")
    )
    # base slimmed to the shared schema; union is the y side. ONLY the
    # tokenize-once columns are optional on the base side: a base from an
    # older (token-less) rollup drops them from the union and
    # scoring/blocking fall back to the prep expressions with identical
    # results (ColumnRule.prepped and minhash hashes_column are
    # presence-gated). Every other rollup column is REQUIRED — a base
    # missing e.g. ts_min is malformed, and silently narrowing both
    # sides would hide it (earlier behavior; flagged in round-4 review).
    _OPTIONAL_Y = {"tok_hashes", "tok_hashes_lower"}
    missing = [
        c for c in newc.columns
        if c not in base_conversations.columns and c not in _OPTIONAL_Y
    ]
    if missing:
        raise ValueError(
            f"base_conversations is missing required rollup columns "
            f"{missing}; only tokenize-once columns {sorted(_OPTIONAL_Y)} "
            f"may be absent"
        )
    y_cols = [c for c in newc.columns if c in base_conversations.columns]
    all_y = _persist(
        base_conversations.select(*y_cols).unionByName(newc.select(*y_cols))
    )

    if uniqueness is None:
        uniqueness = uniqueness_by_columns(all_y, cfg.x_match_columns)

    # Lineage policy: the batch-sized frames (candidates, scored pairs,
    # the contracted edge set below) are EAGER localCheckpoints, not mere
    # persists. Each downstream stage embeds multiple copies of its
    # inputs' logical plans (key families x the y-union — whose own plan
    # is the base pipeline's —, CC's self-joins, the label joins), so
    # without truncation the plan tree grows multiplicatively and Spark's
    # own plan rendering (AQE explainString) exhausts the driver heap
    # long before any data does. persist() keeps the data but NOT the
    # plan flat; a LAZY checkpoint is not enough either — no action runs
    # between these stages and CC's first round, so AQE would render the
    # full untruncated tree while planning that first action. Eager costs
    # one extra job per stage over frames that are O(batch) by
    # construction — never O(corpus) — so both the job and the
    # checkpoint storage are bounded.
    cand = candidate_pairs(
        newc, all_y, keys, x_id=cfg.x_id, y_id=cfg.y_id,
        cache=cache, persisted=persisted,
    ).where(F.col("x_id") != F.col("y_id")).localCheckpoint(eager=True)
    pairs = score_candidate_pairs(
        newc, all_y, cand, cfg, uniqueness=uniqueness
    ).localCheckpoint(eager=True)

    if edge_mode == "best_match":
        resolved = resolve_matches(newc, all_y, pairs, cfg, keep_debug=True)
        edges = resolved.where(
            F.col("__rm_final").isin(*edge_statuses)
        ).select(
            F.col(cfg.x_id).alias("src"),
            F.col("__rm_matched_y").alias("dst"),
        )
    else:
        edges = pairs.where(
            F.col("row_score") >= F.lit(float(cfg.required_threshold))
        ).select(F.col("x_id").alias("src"), F.col("y_id").alias("dst"))

    # Contract base endpoints to their cluster labels: the base graph's
    # connectivity is fully represented by the labels, so CC below runs on
    # O(|batch| + touched clusters) nodes. src is always a batch conv (the
    # x side); only dst can be a base conv.
    bc = base_clusters.select(
        F.col("conv_id").alias("dst"), F.col("cluster_id").alias("__rm_dcl")
    )
    cedges = (
        edges.join(bc, "dst", "left")
        .select("src", F.coalesce("__rm_dcl", "dst").alias("dst"))
        .localCheckpoint(eager=True)  # see lineage policy above
    )

    cc = connected_components(cedges, "src", "dst")

    # Component representative: the smallest BASE label when the component
    # touches the base (cluster stability — base members never relabel
    # except on a merge), else the smallest batch conv_id (identical to
    # the batch pipeline's min-id labeling).
    base_ids = base_clusters.select(
        F.col("cluster_id").alias("node")
    ).distinct().withColumn("_is_base", F.lit(True))
    nodes = cc.join(base_ids, "node", "left")
    rep = nodes.groupBy("component").agg(
        F.min(F.when(F.col("_is_base"), F.col("node"))).alias("_base_rep"),
        F.min("node").alias("_any_rep"),
    ).select(
        "component",
        F.coalesce("_base_rep", "_any_rep").alias("_label"),
    )
    labeled = _persist(nodes.join(rep, "component"))

    assignments = (
        newc.select("conv_id")
        .join(
            labeled.select(F.col("node").alias("conv_id"), "_label"),
            "conv_id",
            "left",
        )
        .select(
            "conv_id",
            F.coalesce("_label", F.col("conv_id")).alias("cluster_id"),
        )
    )
    merges = labeled.where(
        F.col("_is_base") & (F.col("node") != F.col("_label"))
    ).select(
        F.col("node").alias("old_cluster_id"),
        F.col("_label").alias("cluster_id"),
    )

    return IncrementResult(newc, cand, pairs, assignments, merges, persisted)
