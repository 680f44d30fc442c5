"""spark-submit entrypoint for the docs->triples pipeline.

North-rule deployment story: the engine ships as a plain Python package zip
and runs on any cluster via

    python tools/make_pyfiles.py                       # -> dist/ahrd_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/ahrd_spark.zip \\
        tools/submit_pipeline.py \\
        --docs s3://bucket/docs --out s3://bucket/triples \\
        --workdir s3://bucket/ckpt --partitions 4096

Unlike ``ahrd_spark.session.get_spark`` (which pins a local master for
tests/bench), this entrypoint NEVER sets a master: ``spark-submit --master``
owns cluster placement, and only runtime-settable SQL confs are applied, so
the same script runs unchanged on local[N], YARN, or K8s at N or 4N
executors.  The reference's analog is the Batcher's generated LSF shell
scripts (src/ahrd/controller/Batcher.java:301-351); here cluster fan-out is
ordinary Spark partitioning.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession


def _runtime_session(app_name: str, shuffle_partitions: int | None) -> SparkSession:
    spark = SparkSession.builder.appName(app_name).getOrCreate()
    # runtime-settable confs only (static ones belong to spark-submit --conf)
    if shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # the docs scan is compute-dense (~1 s of regex/tokenize per MB in
    # mention-detect, far above a typical scan), so the default 128 MB
    # splits give each core multi-minute tasks with no straggler slack;
    # 16 MB keeps scan tasks at a few seconds and task count >> cores
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    return spark


def default_config():
    """Three-database config used when no --config YAML is given (same shape
    as the bench pipeline; weights mirror the reference example YAML)."""
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


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="ahrd_spark", description="docs -> triples KG-construction pipeline"
    )
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--docs", help="input docs table (parquet path)")
    def _positive_int(v: str) -> int:
        n = int(v)
        if n <= 0:
            raise argparse.ArgumentTypeError("must be a positive integer")
        return n

    src.add_argument(
        "--synth", type=_positive_int, metavar="N",
        help="synthesize N deterministic docs instead of reading --docs",
    )
    ap.add_argument("--out", required=True, help="output triples table path")
    ap.add_argument("--workdir", required=True, help="checkpoint/lineage dir")
    ap.add_argument("--config", help="AHRD-style input.yml (optional)")
    ap.add_argument(
        "--partitions", type=int, default=None,
        help="stage repartition width (default: spark.sql.shuffle.partitions)",
    )
    ap.add_argument(
        "--export-nt", default=None, metavar="PATH",
        help="also export the graph as gzip N-Triples text at PATH "
             "(one .nt part per triples partition)",
    )
    args = ap.parse_args(argv)

    from ahrd_spark.config import load_config
    from ahrd_spark.plans.docs import synthesize_docs
    from ahrd_spark.plans.pipeline import run_pipeline

    spark = _runtime_session("ahrd_spark_pipeline", args.partitions)
    cfg = load_config(args.config) if args.config else default_config()

    from ahrd_spark.sources.table_io import read_table, write_table

    if args.synth is not None:
        docs = synthesize_docs(spark, args.synth, partitions=args.partitions)
    else:
        # table URI dispatch: iceberg:db.docs / table:name / parquet path
        docs = read_table(spark, args.docs)

    stage_timings: dict = {}
    t0 = time.time()
    triples = run_pipeline(
        spark, docs, cfg, args.workdir,
        num_partitions=args.partitions, stage_timings=stage_timings,
    )
    # count rides the write job via an Observation — re-reading args.out
    # for the log line would double the cheapest stage's I/O on every run
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("cli_out_rows")
    write_table(
        triples.observe(obs, F.count(F.lit(1)).alias("rows")), args.out
    )
    n = int(obs.get["rows"])
    if args.export_nt:
        # a second cheap job over the materialize checkpoint (triples is
        # the re-read checkpoint frame, not the live plan)
        from ahrd_spark.plans.graph_export import write_ntriples

        write_ntriples(triples, args.export_nt)
    print(json.dumps({
        "triples": n,
        "out": args.out,
        "sec": round(time.time() - t0, 3),
        "stages": stage_timings,
        "parallelism": spark.sparkContext.defaultParallelism,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
