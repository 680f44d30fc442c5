"""Profile the mention_detect stage: where do the seconds go?

Each variant runs in its own subprocess (fresh JVM), local[4],
best-of-N.  Variants:

  fusedfull   ckpt.run_stage over detect_mentions   — the real stage
  fused       detect_mentions -> noop sink          — compute only
  shred       docs_to_hits() -> noop sink           — shredding only
  ckptsort    repartition+sort+observe+parquet      — write internals
  ckptnosort  same minus the in-partition sort
  ckpthashsort  sort prefixed with xxhash64(key)    — cheap-compare sort
  ckptnoobs2  sort+write minus the Observation checksum
  (legacy, pre-fusion composed plan — SLOW, see detect_mentions docstring:
   full / nockpt / notok / prepart / noobs)

Usage: [PROFILE_WARM=1] python tools/profile_mention.py [runs]
PROFILE_WARM=1 pays one warm-up execution per child JVM and times the
second (bench.py's steady-state convention); default times the cold run.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("BENCH_SYNTH_DOCS", "80000"))
PAR = int(os.environ.get("PROFILE_PAR", "4"))


def _cfg():
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


def child(variant: str, docs_path: str):
    """PROFILE_WARM=1: run the variant once to pay JIT/codegen warm-up, wipe
    the workdir, then time a second execution (matches bench.py's
    steady-state measurement)."""
    from pyspark.sql import functions as F

    from ahrd_spark.plans.checkpoint import CheckpointManager
    from ahrd_spark.plans.docs import docs_to_hits
    from ahrd_spark.plans.pipeline import gate_candidates_multi
    from ahrd_spark.session import get_spark

    spark = get_spark(app_name=f"prof_{variant}", master=f"local[{PAR}]",
                      shuffle_partitions=PAR)
    cfg = _cfg()
    docs = spark.read.parquet(docs_path)
    warm = os.environ.get("PROFILE_WARM") == "1"
    workdir = tempfile.mkdtemp(prefix=f"prof_{variant}_")
    for _round in range(2 if warm else 1):
        if _round:  # wipe so the timed round never resumes a checkpoint
            shutil.rmtree(workdir, ignore_errors=True)
            os.makedirs(workdir, exist_ok=True)
        t0 = time.time()
        _run_variant(
            variant, spark, docs, cfg, workdir, F,
            CheckpointManager, docs_to_hits, gate_candidates_multi,
        )
    print(json.dumps({"variant": variant, "sec": round(time.time() - t0, 3)}))
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


def _run_variant(variant, spark, docs, cfg, workdir, F,
                 CheckpointManager, docs_to_hits, gate_candidates_multi):
    t0 = time.time()
    if True:
        if variant == "fusedfull":
            from ahrd_spark.plans.pipeline import detect_mentions

            ckpt = CheckpointManager(spark, workdir, config_obj={"v": 1})
            ckpt.run_stage(
                "mention_detect",
                lambda: detect_mentions(docs, cfg).drop("media_ref"),
                key="protein_acc", num_partitions=PAR * 2,
                sort_keys=["protein_acc", "line_no"],
            )
        elif variant == "fused":
            from ahrd_spark.plans.pipeline import detect_mentions

            detect_mentions(docs, cfg).drop("media_ref") \
                .write.format("noop").mode("overwrite").save()
        elif variant == "full":
            ckpt = CheckpointManager(spark, workdir, config_obj={"v": 1})
            ckpt.run_stage(
                "mention_detect",
                lambda: gate_candidates_multi(docs_to_hits(docs), cfg).drop("media_ref"),
                key="protein_acc", num_partitions=PAR * 2,
                sort_keys=["protein_acc", "line_no"],
            )
        elif variant == "nockpt":
            gate_candidates_multi(docs_to_hits(docs), cfg).drop("media_ref") \
                .write.format("noop").mode("overwrite").save()
        elif variant == "shred":
            docs_to_hits(docs).write.format("noop").mode("overwrite").save()
        elif variant == "notok":
            gate_candidates_multi(docs_to_hits(docs), cfg) \
                .drop("media_ref", "tokens") \
                .write.format("noop").mode("overwrite").save()
        elif variant == "prepart":
            pre = docs.repartition(PAR * 2, "doc_id")
            out = gate_candidates_multi(docs_to_hits(pre), cfg).drop("media_ref") \
                .sortWithinPartitions("protein_acc", "line_no")
            out.write.mode("overwrite").parquet(os.path.join(workdir, "data"))
        elif variant == "noobs":
            out = gate_candidates_multi(docs_to_hits(docs), cfg).drop("media_ref") \
                .repartition(PAR * 2, F.col("protein_acc")) \
                .sortWithinPartitions("protein_acc", "line_no")
            out.write.mode("overwrite").parquet(os.path.join(workdir, "data"))
        elif variant in ("ckptsort", "ckptnosort", "ckpthashsort", "ckptnoobs2"):
            # isolate the checkpoint-write internals: repartition + sort +
            # observe-checksum + parquet write (no sidecar/footer reads)
            from pyspark.sql import Observation

            from ahrd_spark.plans.pipeline import detect_mentions

            out = detect_mentions(docs, cfg).drop("media_ref") \
                .repartition(PAR * 2, F.col("protein_acc"))
            if variant == "ckptsort":
                out = out.sortWithinPartitions("protein_acc", "line_no")
            elif variant == "ckpthashsort":
                out = out.sortWithinPartitions(
                    F.xxhash64("protein_acc"), "protein_acc", "line_no"
                )
            if variant != "ckptnoobs2":
                obs = Observation(f"prof_{variant}")
                out = out.observe(
                    obs,
                    F.count(F.lit(1)).alias("rows"),
                    F.bit_xor(F.xxhash64(*out.columns)).alias("checksum"),
                )
            else:
                out = out.sortWithinPartitions("protein_acc", "line_no")
            out.write.mode("overwrite").parquet(os.path.join(workdir, "data"))
        else:
            raise SystemExit(f"unknown variant {variant}")


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    docs_dir = tempfile.mkdtemp(prefix="prof_docs_")
    docs_path = docs_dir + "/docs"
    me = os.path.abspath(__file__)
    try:
        subprocess.run(
            [sys.executable, "-c",
             f"import sys; sys.path.insert(0, {os.path.dirname(os.path.dirname(me))!r});"
             "from ahrd_spark.plans.docs import synthesize_docs;"
             "from ahrd_spark.session import get_spark;"
             f"s=get_spark(app_name='synth', master='local[32]', shuffle_partitions=32);"
             f"synthesize_docs(s, {N_DOCS}, hits_per_doc=24, partitions=64)"
             f".write.mode('overwrite').parquet('{docs_path}'); s.stop()"],
            check=True, capture_output=True, text=True)
        variants = os.environ.get(
            "PROFILE_VARIANTS",
            "full,nockpt,shred,notok,prepart,noobs,fused,fusedfull",
        ).split(",")
        best: dict[str, float] = {}
        for _ in range(runs):
            for v in variants:
                p = subprocess.run([sys.executable, me, "--child", v, docs_path],
                                   capture_output=True, text=True, timeout=900)
                for line in reversed(p.stdout.strip().splitlines()):
                    if line.startswith("{"):
                        sec = json.loads(line)["sec"]
                        if v not in best or sec < best[v]:
                            best[v] = sec
                        break
                else:
                    print(f"variant {v} FAILED:\n{p.stderr[-2000:]}", file=sys.stderr)
        print(json.dumps({"par": PAR, "docs": N_DOCS, "best": best}))
    finally:
        shutil.rmtree(docs_dir, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
    else:
        main()
