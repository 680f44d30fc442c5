"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "pipeline": {...}, "scaling": {...}}

Two parts:
1. headline queries from __spark_entry__.queries() at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] — timed with a
   noop sink (no disk cost, full plan execution).
2. the docs->triples pipeline on a deterministic synthetic docs table at TWO
   parallelism levels — the sandbox stand-in for the N vs 4N executor
   scaling rule; reports docs/sec at both and the scaling efficiency
   (thr_big / thr_small) / 4.

The scaling pair defaults to local[1] vs local[4] ($BENCH_SCALE_N scales
both).  Rationale: this VM advertises 32 vCPUs but a pure-JVM ALU loop
saturates at ~6x one thread's rate (host oversubscription), so levels above
~8 threads measure host contention, not the engine; 1 vs 4 is the honest
"N vs 4N executors" stand-in within the machine's real capacity (see
BASELINE.md for the raw-CPU ceiling measurements).  BENCH_PIN_CPUS=1
additionally pins each measurement to exactly that many CPUs.

Each pipeline measurement runs in its OWN subprocess (fresh JVM): sharing
one JVM across sequential SparkContexts leaks heap garbage from the first
run into the second and produced 2-8x timing swings.  Best of
$BENCH_PIPELINE_RUNS (default 3) runs per level is reported.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "ahrd_winner",
    "ahrd_hit_scores",
    "tokenize",
    "dedup_minhash",
    "dedup_lsh_pairs",
    "ann_cosine_topk",
    "events_windowed",
    "text_stats",
    "cc_components",
    # round 4: the interleaved text+media axis — the greedy chunk walk is
    # the representative span-array workload; benched via the Arrow twin
    # (hot-path impl; bit-identical to the expression fold, ~3x faster)
    "interleaved_chunks_arrow",
]

# 160k docs (~2x the round-4 corpus): the pipeline carries ~1.5 s of
# per-run fixed cost (job scheduling + the materialize stage's constant
# tail) that dilutes the big level's throughput far more than the small
# level's at 80k — a longer run amortizes it, the "fewer, longer runs"
# rule for a scaling measurement
SYNTH_DOCS = int(os.environ.get("BENCH_SYNTH_DOCS", "160000"))
SYNTH_HITS = 24
# each child runs warm-up + $BENCH_TIMED_RUNS timed executions and keeps
# the best, so ONE child per level already yields two decorrelated
# samples; the 160k corpus makes each sample long enough that another
# cold JVM (+ its discarded warm-up) buys little extra signal for ~4 min
# of wall-clock — the ALU calibration brackets (before/after the
# pipeline block) carry the window-drift correction instead
PIPELINE_RUNS = int(os.environ.get("BENCH_PIPELINE_RUNS", "1"))
SCALE_N = int(os.environ.get("BENCH_SCALE_N", "1"))


def _pipeline_cfg():
    from ahrd_spark.config import AhrdConfig, BlastDbConfig

    dbs = tuple(
        BlastDbConfig(
            name=f"db{i}",
            weight=[100, 50, 10][i],
            description_score_bit_score_weight=[0.2, 0.4, 0.4][i],
        )
        for i in range(3)
    )
    return AhrdConfig(blast_dbs=dbs)


# ---------------------------------------------------------------------------
# child modes (executed in their own subprocess -> fresh JVM)
# ---------------------------------------------------------------------------
def child_synth(docs_path: str):
    from ahrd_spark.plans.docs import synthesize_docs
    from ahrd_spark.session import get_spark

    spark = get_spark(app_name="ahrd_bench_synth", master="local[32]",
                      shuffle_partitions=32)
    synthesize_docs(spark, SYNTH_DOCS, hits_per_doc=SYNTH_HITS,
                    partitions=64).write.mode("overwrite").parquet(docs_path)
    spark.stop()


def child_rawcpu(par: int):
    """Hardware calibration: a pure-JVM codegen'd ALU loop (zero shuffle,
    zero strings).  Its scaling between the two levels is the ceiling ANY
    job can reach on this host — reported alongside the pipeline's so the
    engine's scaling can be judged relative to what the machine delivers."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{par}]").appName(f"raw{par}")
        .config("spark.ui.enabled", "false").getOrCreate()
    )
    spark.range(1).count()  # warm
    best = None
    for _ in range(3):
        t0 = time.time()
        spark.range(0, 2_000_000_000, 1, par).selectExpr(
            "sum(id * 2 + 1)"
        ).collect()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(json.dumps({"parallelism": par, "sec": round(best, 3)}))
    spark.stop()


def child_pipeline(par: int, docs_path: str):
    from ahrd_spark.plans.pipeline import run_pipeline
    from ahrd_spark.session import get_spark

    spark = get_spark(
        app_name=f"ahrd_bench_p{par}", master=f"local[{par}]",
        shuffle_partitions=par,
        # mention-detect is compute-dense (~1 s/MB): 16 MB scan splits keep
        # task count >> cores so the pre-shuffle stage has straggler slack
        # (128 MB packs the 114 MB docs table into ~core-count splits)
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)
        },
    )
    docs = spark.read.parquet(docs_path)

    def one_run():
        workdir = tempfile.mkdtemp(prefix=f"ahrd_bench_{par}_")
        try:
            stages: dict = {}
            t0 = time.time()
            run_pipeline(spark, docs, _pipeline_cfg(), workdir,
                         num_partitions=par * 2, stage_timings=stages)
            # row count comes from the materialize stage's lineage sidecar
            # — the pipeline already recorded it; no extra Spark job
            with open(
                os.path.join(workdir, "materialize", "_lineage.json")
            ) as fh:
                n_triples = json.load(fh)["total_rows"]
            return time.time() - t0, stages, n_triples
        finally:
            shutil.rmtree(workdir, ignore_errors=True)

    try:
        # steady-state measurement: the first pipeline run in a fresh JVM
        # pays ~13 s of JIT/whole-stage-codegen warmup (measured at par=4:
        # 35 s cold vs 21-22 s for every later run in the same JVM) — a
        # fixed per-JVM cost a long-running cluster job pays once, which
        # would otherwise deflate the big level's throughput far more than
        # the small level's.  One discarded warm-up run, then
        # $BENCH_TIMED_RUNS (default 2) timed runs with the best kept:
        # a single timed window lets one transient host-contention spike
        # sink the whole level's number; two windows per JVM halve that
        # risk at ~20 s extra cost, cheaper than another cold child.
        one_run()
        dt = stages = n_triples = None
        for _ in range(max(1, int(os.environ.get("BENCH_TIMED_RUNS", "2")))):
            d, s, n = one_run()
            if dt is None or d < dt:
                dt, stages, n_triples = d, s, n
        print(json.dumps({
            "parallelism": par,
            "docs": SYNTH_DOCS,
            "triples": n_triples,
            "sec": round(dt, 3),
            "docs_per_sec": round(SYNTH_DOCS / dt, 1),
            "stages": stages,
        }))
    finally:
        spark.stop()


def _run_child(args: list[str], pin_cpus: int | None = None) -> dict | None:
    """BENCH_PIN_CPUS=1 pins each measurement to exactly `par` CPUs via
    taskset.  Off by default: squeezing the JVM's GC/JIT/daemon threads and
    the Python workers onto the task cores punishes the small-N baseline in
    a way a real executor (which shares a node with OS headroom) is not —
    measured ~20%% lower throughput at par=1 with no stability gain."""
    cmd = [sys.executable, os.path.abspath(__file__)] + args
    if (
        pin_cpus
        and os.environ.get("BENCH_PIN_CPUS") == "1"
        and shutil.which("taskset")
    ):
        cmd = ["taskset", "-c", f"0-{pin_cpus - 1}"] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    return None


def time_pipeline_pair(
    small_par: int, big_par: int, docs_path: str
) -> tuple[dict, dict]:
    """Interleave the two levels (small, big, small, big, ...) instead of
    running them in sequential blocks: host contention drifts by tens of
    percent between windows, and a blocked schedule hands one level a
    systematically different window than the other.  Best-of-N per level
    over interleaved samples decorrelates the ratio from the drift."""
    best = {small_par: None, big_par: None}
    for _ in range(PIPELINE_RUNS):
        for par in (small_par, big_par):
            r = _run_child(["--pipeline", str(par), docs_path], pin_cpus=par)
            if r and (
                best[par] is None
                or r["docs_per_sec"] > best[par]["docs_per_sec"]
            ):
                best[par] = r
    fallback = lambda p: {"parallelism": p, "docs_per_sec": 0.0, "sec": -1.0}  # noqa: E731
    return best[small_par] or fallback(small_par), best[big_par] or fallback(big_par)


# ---------------------------------------------------------------------------
def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0

    import __spark_entry__ as entrymod
    from ahrd_spark.session import get_spark

    spark = get_spark(
        app_name="ahrd_bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    qs = entrymod.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = None
        for _ in range(2):  # best-of-2: one transient spike can't own
            t0 = time.time()  # a query's number for the whole round
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        times[name] = round(best, 3)
    spark.stop()

    docs_dir = tempfile.mkdtemp(prefix="ahrd_bench_docs_")
    docs_path = docs_dir + "/docs"
    try:
        _run_child(["--synth", docs_path])
        small_par = SCALE_N
        big_par = SCALE_N * 4
        # ALU calibration BRACKETS the pipeline block (before and after);
        # per-level best-of decorrelates the ceiling from window drift the
        # same way the interleaved pipeline pair does
        raw_small_a = _run_child(["--rawcpu", str(small_par)])
        raw_big_a = _run_child(["--rawcpu", str(big_par)])
        small, big = time_pipeline_pair(small_par, big_par, docs_path)
        raw_small_b = _run_child(["--rawcpu", str(small_par)])
        raw_big_b = _run_child(["--rawcpu", str(big_par)])
    finally:
        shutil.rmtree(docs_dir, ignore_errors=True)
    ratio = big["docs_per_sec"] / max(small["docs_per_sec"], 1e-9)
    factor = big_par / small_par
    efficiency = ratio / factor

    def _best_sec(*rs):
        secs = [r["sec"] for r in rs if r and r.get("sec")]
        return min(secs) if secs else None

    ceiling = None
    relative = None
    rs, rb = _best_sec(raw_small_a, raw_small_b), _best_sec(raw_big_a, raw_big_b)
    if rs and rb:
        ceiling = round((rs / rb) / factor, 3)
        if ceiling:
            relative = round(min(efficiency / ceiling, 1.0), 3)

    out = {
        "metric": "ahrd_spark headline queries + docs->triples pipeline",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "pipeline": {"small": small, "big": big},
        "scaling": {
            "small_parallelism": small_par,
            "big_parallelism": big_par,
            "cpu_pinned": os.environ.get("BENCH_PIN_CPUS") == "1"
            and bool(shutil.which("taskset")),
            "throughput_ratio": round(ratio, 3),
            "efficiency": round(efficiency, 3),
            # what a zero-shuffle pure-ALU job scales at on this host
            # between the same two levels (1.0 = perfect hardware)
            "alu_ceiling_efficiency": ceiling,
            # pipeline efficiency relative to that hardware ceiling
            "efficiency_vs_ceiling": relative,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--pipeline":
        child_pipeline(int(sys.argv[2]), sys.argv[3])
    elif len(sys.argv) > 1 and sys.argv[1] == "--rawcpu":
        child_rawcpu(int(sys.argv[2]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--synth":
        child_synth(sys.argv[2])
        print("{}")
    else:
        main()
