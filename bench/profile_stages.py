"""Per-stage wall-clock profile of the transcript ER pipeline.

Usage: python bench/profile_stages.py <cores> <n_entities>
Times each stage's materialization (count) separately so the dominant
cost is visible; used to attack scaling-efficiency bottlenecks.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 20000

    from pyspark.sql import functions as F

    from record_matcher_spark.config import MatchConfig
    from record_matcher_spark.datagen import generate_transcripts
    from record_matcher_spark.operators.blocking import (
        DEFAULT_TRANSCRIPT_KEYS,
        candidate_pairs,
    )
    from record_matcher_spark.operators.cluster import connected_components
    from record_matcher_spark.operators.resolve import resolve_matches
    from record_matcher_spark.operators.rollup import rollup_conversations
    from record_matcher_spark.operators.scoring import score_candidate_pairs
    from record_matcher_spark.pipeline import default_transcript_match_config
    from record_matcher_spark.session import get_spark

    # Mirror bench/scaling_worker.py's measurement environment so stage
    # times decompose the scaling run: tmpfs shuffle scratch, AQE off for
    # the microbench, one untimed small-corpus pipeline to JIT-compile the
    # codegen classes before any timed stage.
    extra = {"spark.ui.enabled": "false", "spark.driver.memory": "48g"}
    java_opts = os.environ.get("RM_JAVA_OPTS", "")
    if java_opts:
        extra["spark.driver.extraJavaOptions"] = java_opts
    local_dir = os.environ.get("RM_LOCAL_DIR", "/dev/shm/rm-spark-local")
    if local_dir:
        extra["spark.local.dir"] = local_dir
    sql_extra = os.environ.get("RM_SPARK_CONF", "")
    if sql_extra:
        for kv in sql_extra.split(";"):
            if kv.strip():
                k, _, v = kv.partition("=")
                extra[k.strip()] = v.strip()
    if os.environ.get("RM_AQE", "0") == "0":
        extra["spark.sql.adaptive.enabled"] = "false"
    spark = get_spark(
        app_name="rm-profile",
        master=f"local[{cores}]",
        shuffle_partitions=int(os.environ.get("RM_SHUFFLE_PARTITIONS", "32")),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from record_matcher_spark.pipeline import match_transcripts

    warm_df, _ = generate_transcripts(
        spark, min(n_entities, 20000), seed=43, num_partitions=32
    )
    warm_df = warm_df.cache()
    warm_df.count()
    warm_res = match_transcripts(warm_df, edge_mode="threshold")
    warm_res.clusters.select("cluster_id").distinct().count()
    warm_res.unpersist()
    warm_df.unpersist()

    corpus_dir = os.environ.get("RM_INPUT_PARQUET", "")
    if corpus_dir:
        t_df = spark.read.parquet(os.path.join(corpus_dir, "transcripts"))
    else:
        t_df, _truth = generate_transcripts(spark, n_entities, seed=42,
                                            num_partitions=32)
    # conv_id-clustered cache, exactly like bench/scaling_worker.py, so the
    # stage decomposition matches the scaling measurement's plan shapes
    n_buckets = int(os.environ.get("RM_SHUFFLE_PARTITIONS", "32"))
    t_df = t_df.repartition(n_buckets, "conv_id").cache()
    t_df.count()

    cfg = default_transcript_match_config()

    def _machine_cpu() -> float:
        """Machine-wide busy CPU seconds (user+nice+system) from /proc/stat.
        Nothing else runs on this box during a profile, so per-stage deltas
        attribute to the stage — separating CPU inflation (GC, allocation
        churn: CPU grows with cores) from underutilization (wall grows,
        CPU flat)."""
        with open("/proc/stat") as f:
            parts = f.readline().split()
        hz = os.sysconf("SC_CLK_TCK")
        return (int(parts[1]) + int(parts[2]) + int(parts[3])) / hz

    def timed(name, fn):
        c0 = _machine_cpu()
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        dc = _machine_cpu() - c0
        print(f"{name:<28} {dt:8.2f}s  cpu {dc:8.1f}s  ({dc / max(dt, 1e-9):.2f} cores)",
              flush=True)
        return out

    # mirror pipeline.match_transcripts: tokenize-once rollup, turns
    # dropped before the persist (the pipeline's cache payload)
    conv = timed("rollup(build+persist+count)",
                 lambda: rollup_conversations(t_df, tokens=True)
                 .drop("turns").persist())
    timed("rollup count", lambda: conv.count())

    cand = timed("candidates(build+persist)", lambda: candidate_pairs(
        conv, conv, DEFAULT_TRANSCRIPT_KEYS, x_id="conv_id", y_id="conv_id"
    ).where(F.col("x_id") != F.col("y_id")).persist())
    timed("candidates count", lambda: cand.count())

    pairs = timed("pairs(build+persist)", lambda: score_candidate_pairs(
        conv, conv, cand, cfg).persist())
    timed("pairs count", lambda: pairs.count())

    edges = pairs.where(
        F.col("row_score") >= F.lit(float(cfg.required_threshold))
    ).select(F.col("x_id").alias("src"), F.col("y_id").alias("dst"))
    timed("edges count", lambda: edges.count())

    cc = timed("cc(build)", lambda: connected_components(edges, "src", "dst"))
    timed("cc count", lambda: cc.count())

    resolved = timed("resolve(build)", lambda: resolve_matches(
        conv, conv, pairs, cfg, keep_debug=True))
    timed("resolve count", lambda: resolved.count())


if __name__ == "__main__":
    main()
