"""Physical-layout maintenance: partitioned writes and compaction.

At 100 TB the difference between a usable and an unusable table is
layout, not logic: a table partitioned by the columns queries filter on
gets partition pruning for free; files sorted within partitions get
parquet row-group min/max skipping; and a table that has accumulated
millions of tiny files (streaming sinks, per-batch appends) needs
periodic compaction or every downstream scan drowns in task overhead.

Both helpers are thin, deliberately: the work happens inside Spark's
own writer, and the value is encoding the right defaults (hive-style
``partitionBy``, sort-within-files, size-targeted file counts) in one
place instead of in every pipeline.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as hive-partitioned parquet, one shuffle: rows are
    repartitioned BY the partition columns first (otherwise every task
    opens a writer per partition value it happens to hold — the
    small-file explosion), then sorted within partitions so parquet
    row-group statistics support min/max skipping on ``sort_cols``.
    """
    out = df.repartition(*partition_cols)
    if sort_cols:
        out = out.sortWithinPartitions(*partition_cols, *sort_cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def parquet_bytes(path: str) -> int:
    """Total size of the parquet data files under ``path`` (recursive),
    via pyarrow.fs so object-store URIs work like local dirs."""
    from pyarrow import fs as pafs

    filesystem, root = pafs.FileSystem.from_uri(path)
    infos = filesystem.get_file_info(
        pafs.FileSelector(root, recursive=True, allow_not_found=True)
    )
    return sum(
        i.size
        for i in infos
        if i.type == pafs.FileType.File and i.path.endswith(".parquet")
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite the parquet table at ``path`` into ``ceil(total_bytes /
    target_bytes)`` files at ``out_path`` and return that file count.

    Sizing comes from the FILES (compressed bytes), not a row count —
    the quantity that actually determines scan-task overhead.  The
    rewrite uses ``repartition`` (a real shuffle) rather than
    ``coalesce`` so the output files are even-sized; a coalesce of
    heavily skewed inputs just glues small files into lopsided big ones.
    Writing to a NEW path keeps the operation resumable and atomic at
    the table level (swap pointers after success) instead of clobbering
    the live data mid-rewrite.
    """
    n_files = max(1, math.ceil(parquet_bytes(path) / target_bytes))
    spark.read.parquet(path).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(out_path)
    return n_files


__all__ = ["write_partitioned", "parquet_bytes", "compact_parquet"]
