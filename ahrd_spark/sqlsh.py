"""Ad-hoc SQL entry point over a directory of parquet tables.

``python -m ahrd_spark.sqlsh /data/sf0.1 "SELECT count(*) FROM lineitem"``
registers every ``<name>.parquet`` in the directory as a temp view named
``<name>`` and streams the result as JSON lines — the quickest way for a
user (or a driver script) to poke at the same tables every ``queries()``
entry reads, with full Spark SQL available (window functions, ROLLUP,
lateral views, ...).

Views are lazy: registration costs one schema read per table, and an
unreferenced view never touches storage, so registering the whole
directory is free.  Output streams via ``toLocalIterator`` — one
partition in driver memory at a time, not a ``collect()`` of the full
result.
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import DataFrame, SparkSession


def register_views(spark: SparkSession, data_dir: str) -> list[str]:
    """Register every ``*.parquet`` child of ``data_dir`` as a same-named
    temp view; returns the view names (sorted for determinism)."""
    names = sorted(
        f[: -len(".parquet")]
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    for n in names:
        spark.read.parquet(os.path.join(data_dir, f"{n}.parquet")) \
            .createOrReplaceTempView(n)
    return names


def run_sql(spark: SparkSession, data_dir: str, sql: str) -> DataFrame:
    register_views(spark, data_dir)
    return spark.sql(sql)


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        print(
            "usage: python -m ahrd_spark.sqlsh <data_dir> <sql>",
            file=sys.stderr,
        )
        return 2
    from ahrd_spark.session import get_spark

    spark = get_spark(app_name="ahrd_spark_sqlsh")
    df = run_sql(spark, argv[0], argv[1])
    for row in df.toJSON().toLocalIterator():
        print(row)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
