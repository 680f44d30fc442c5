"""Profile the mention_detect stage at bench settings (par=4) to find
where the 21.5 s goes.  Run: python tools/profile_mention.py [par]"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAR = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N_DOCS = int(os.environ.get("PROF_DOCS", "80000"))


def main():
    from pyspark.sql import functions as F

    from ahrd_spark.plans.docs import synthesize_docs
    from ahrd_spark.plans.pipeline import detect_mentions
    from ahrd_spark.plans.checkpoint import CheckpointManager
    from ahrd_spark.session import get_spark

    sys.path.insert(0, "/root/repo")
    import importlib
    bench = importlib.import_module("bench")
    cfg = bench._pipeline_cfg()

    docs_path = tempfile.mkdtemp(prefix="prof_docs_") + "/docs"
    sp = get_spark(app_name="synth", master="local[32]", shuffle_partitions=32)
    synthesize_docs(sp, N_DOCS, hits_per_doc=24, partitions=64)\
        .write.mode("overwrite").parquet(docs_path)
    sp.stop()

    spark = get_spark(
        app_name=f"prof{PAR}", master=f"local[{PAR}]", shuffle_partitions=PAR,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    docs = spark.read.parquet(docs_path)

    def timeit(name, fn, n=2):
        best = None
        for _ in range(n):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        print(f"{name:50s} {best:7.2f} s", flush=True)
        return best

    noop = lambda df: df.write.format("noop").mode("overwrite").save()

    # warm up JIT on the full path first
    wd = tempfile.mkdtemp(prefix="prof_wd_")
    ck = CheckpointManager(spark, wd, config_obj={"v": 1})
    ck.write(detect_mentions(docs, cfg).drop("media_ref", "tokens"),
             "warm", key="protein_acc", num_partitions=PAR * 2,
             sort_keys=["protein_acc", "line_no"])
    shutil.rmtree(wd, ignore_errors=True)

    # 0. scan only
    timeit("scan docs (count spans)", lambda: noop(
        docs.select(F.explode("spans").alias("s")).select(F.col("s.kind"))))
    # 1. full detect_mentions, noop sink (no checkpoint)
    timeit("detect_mentions -> noop", lambda: noop(
        detect_mentions(docs, cfg).drop("media_ref", "tokens")))
    # 2. detect_mentions without tokenize (replace tokens branch w/ const)
    # approximated: shred+parse only via docs_to_hits
    from ahrd_spark.plans.docs import docs_to_hits
    timeit("docs_to_hits (parse only) -> noop", lambda: noop(docs_to_hits(docs)))
    # 3. full checkpointed stage
    def full():
        wd = tempfile.mkdtemp(prefix="prof_wd_")
        try:
            ck = CheckpointManager(spark, wd, config_obj={"v": 1})
            ck.write(detect_mentions(docs, cfg).drop("media_ref", "tokens"),
                     "mention_detect", key="protein_acc",
                     num_partitions=PAR * 2,
                     sort_keys=["protein_acc", "line_no"])
        finally:
            shutil.rmtree(wd, ignore_errors=True)
    timeit("detect_mentions -> checkpoint write", full)

    # 4. checkpoint write WITHOUT the observe/checksum
    def no_obs():
        wd = tempfile.mkdtemp(prefix="prof_wd_")
        try:
            out = detect_mentions(docs, cfg).drop("media_ref", "tokens")
            out = out.repartition(PAR * 2, F.col("protein_acc"))\
                .sortWithinPartitions(F.xxhash64(F.col("protein_acc")),
                                      "protein_acc", "line_no")
            out.write.mode("overwrite").parquet(wd + "/data")
        finally:
            shutil.rmtree(wd, ignore_errors=True)
    timeit("detect -> repart+sort+parquet (no observe)", no_obs)

    # 5. no sort
    def no_sort():
        wd = tempfile.mkdtemp(prefix="prof_wd_")
        try:
            out = detect_mentions(docs, cfg).drop("media_ref", "tokens")
            out = out.repartition(PAR * 2, F.col("protein_acc"))
            out.write.mode("overwrite").parquet(wd + "/data")
        finally:
            shutil.rmtree(wd, ignore_errors=True)
    timeit("detect -> repart+parquet (no sort)", no_sort)

    # 6. no repartition either (write live)
    def no_repart():
        wd = tempfile.mkdtemp(prefix="prof_wd_")
        try:
            detect_mentions(docs, cfg).drop("media_ref", "tokens")\
                .write.mode("overwrite").parquet(wd + "/data")
        finally:
            shutil.rmtree(wd, ignore_errors=True)
    timeit("detect -> parquet (no shuffle/sort)", no_repart)

    spark.stop()
    shutil.rmtree(os.path.dirname(docs_path), ignore_errors=True)


if __name__ == "__main__":
    main()
