"""Per-key interval coalescing — merge overlapping/touching [lo, hi]
spans into maximal blocks.

The span-algebra workhorse that pairs with ``asof_join`` and
``range_join``: redaction spans before cutting text (overlapping PII
matches must not double-cut), duplicate-span blocks from
``duplicate_spans`` before excision, event bursts into activity blocks,
triple validity windows into coverage intervals.

Classic cumulative-max formulation, one shuffle (the per-key window):
sort each key's intervals by (lo, hi); a new block starts exactly where
``lo`` exceeds the running max of all PRIOR ``hi`` values; block ids are
the running sum of those starts; one group-by collapses each block to
(min lo, max hi, n_merged).  Closed-interval semantics: touching spans
(``lo == prior hi``) merge — pass ``eps``-reduced bounds upstream if you
need open behavior.

Hot keys are single-partition window sorts (the shared window-operator
caveat); interval count per key, not corpus size, bounds the sort.
DuckDB replays the identical two windows + group-by (oracle
``merge_intervals``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    keys: list[str],
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """-> keys + (lo, hi, n_merged): maximal merged blocks per key.
    Rows with NULL bounds or lo > hi are rejected loudly upstream of the
    window (they'd silently corrupt the running max)."""
    bad = F.col(lo_col).isNull() | F.col(hi_col).isNull() | (
        F.col(lo_col) > F.col(hi_col)
    )
    checked = df.withColumn(
        "_lo",
        F.when(bad, F.raise_error("merge_intervals: NULL or inverted interval"))
        .otherwise(F.col(lo_col)),
    )
    order = Window.partitionBy(*keys).orderBy(
        F.col("_lo").asc(), F.col(hi_col).asc()
    )
    prior_max_hi = F.max(hi_col).over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    starts = checked.withColumn(
        "_new",
        F.when(
            prior_max_hi.isNull() | (F.col("_lo") > prior_max_hi), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    blocks = starts.withColumn(
        "_blk",
        F.sum("_new").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        blocks.groupBy(*keys, "_blk")
        .agg(
            F.min("_lo").alias(lo_col),
            F.max(hi_col).alias(hi_col),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("_blk")
    )
