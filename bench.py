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
   parallelism levels (local[N/4] vs local[N]) — the sandbox stand-in for
   the N vs 4N executor scaling rule; reports docs/sec at both and the
   scaling efficiency (thr_big / thr_small) / 4.
"""

from __future__ import annotations

import json
import os
import shutil
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
]

SYNTH_DOCS = int(os.environ.get("BENCH_SYNTH_DOCS", "80000"))
SYNTH_HITS = 24


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


def time_pipeline(par: int) -> dict:
    """Docs->triples pipeline on the synthetic table at a given parallelism."""
    from ahrd_spark.plans.docs import synthesize_docs
    from ahrd_spark.plans.pipeline import run_pipeline
    from ahrd_spark.session import get_spark

    spark = get_spark(
        app_name=f"ahrd_bench_p{par}",
        master=f"local[{par}]",
        shuffle_partitions=par,
    )
    workdir = tempfile.mkdtemp(prefix=f"ahrd_bench_{par}_")
    try:
        docs = synthesize_docs(
            spark, SYNTH_DOCS, hits_per_doc=SYNTH_HITS, partitions=par * 2
        )
        t0 = time.time()
        triples = run_pipeline(spark, docs, _pipeline_cfg(), workdir,
                               num_partitions=par * 2)
        n_triples = triples.count()
        dt = time.time() - t0
        return {
            "parallelism": par,
            "docs": SYNTH_DOCS,
            "triples": n_triples,
            "sec": round(dt, 3),
            "docs_per_sec": round(SYNTH_DOCS / dt, 1),
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


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
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    spark.stop()

    small_par = max(cpus // 4, 2)
    small = time_pipeline(small_par)
    big = time_pipeline(cpus)
    ratio = big["docs_per_sec"] / small["docs_per_sec"]
    efficiency = ratio / (cpus / small_par)

    out = {
        "metric": "ahrd_spark headline queries + docs->triples pipeline",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "pipeline": {"small": small, "big": big},
        "scaling": {
            "small_parallelism": small_par,
            "big_parallelism": cpus,
            "throughput_ratio": round(ratio, 3),
            "efficiency": round(efficiency, 3),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
