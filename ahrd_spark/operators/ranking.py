"""Distributed ranking and sorted-neighborhood blocking.

Global ordered ranking is the canonical single-reducer trap: a plain
``row_number() OVER (ORDER BY ...)`` funnels the whole table through one
task.  ``global_dense_rank`` is the standard two-pass range-partitioned
ranking instead, and ``sorted_neighborhood_pairs`` builds the classic
Hernandez-Stolfo blocking on top of it.  They live apart from
``dedup.py`` because their one explicit ``F.broadcast`` is the
``partitions``-row offset table — bounded by construction, never
stream-sized (tests/test_plan_shapes.py bans explicit broadcasts inside
the stream-consuming modules wholesale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_dense_rank(
    df: DataFrame,
    order_cols: list[str],
    partitions: int = 64,
    out_col: str = "rank",
) -> DataFrame:
    """-> input columns + ``out_col``: a dense 1-based global rank under
    ``ORDER BY order_cols`` WITHOUT a single-reducer global window.

    A plain ``row_number() OVER (ORDER BY ...)`` funnels the whole table
    through one task — the classic 100 TB killer.  This is the standard
    two-pass distributed ranking instead:

    1. range-partition by the sort key (Spark samples split points), sort
       within partitions;
    2. count rows per partition (a ``partitions``-row aggregate — driver
       safe by construction), prefix-sum the counts into per-partition
       offsets, broadcast-join them back;
    3. rank = within-partition ``row_number`` (window PARTITIONED by the
       range-partition id, so every window group is one task's worth)
       + the partition's offset.

    Deterministic for a total order: callers must include a tiebreaker
    column (e.g. the id) in ``order_cols``.

    The ranged frame is PERSISTED before fan-out: the counts branch and
    the ranked branch both read ``_pid``, and partition ids are only
    guaranteed consistent across the two if the range exchange is
    evaluated once — RangePartitioner re-samples split points on
    re-evaluation, so two independent evaluations could disagree and
    silently corrupt the offsets.  (A global sort materializes one pass
    at any scale anyway — this is that pass.)  Downstream actions
    consume both branches immediately, so the cache is hot exactly when
    needed; Spark evicts it LRU afterwards.
    """
    from pyspark.sql import Window

    cols = [F.col(c) for c in order_cols]
    part = df.repartitionByRange(partitions, *cols).withColumn(
        "_pid", F.spark_partition_id()
    ).persist()
    counts = part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    offsets = counts.select(
        "_pid",
        (
            F.sum("_cnt").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
        ).alias("_off"),
    ).fillna({"_off": 0})
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        part.withColumn("_local", F.row_number().over(w))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_local") + F.col("_off")).cast("bigint"))
        .drop("_pid", "_local", "_off")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str = "doc_id",
    window: int = 3,
    partitions: int = 64,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995) ->
    ``(doc_a, doc_b, rank_gap)``: sort the corpus by a blocking key and
    emit every pair whose sort positions are fewer than ``window`` apart,
    with ``doc_a`` the earlier-sorted id.

    The classic complement to LSH blocking: LSH finds high-set-overlap
    pairs, sorted-neighborhood finds prefix/key-adjacent pairs (typos,
    serials, near-identical titles) at a guaranteed linear candidate count
    (window-1 pairs per row) regardless of key distribution — a hot key
    cannot flood, it just sorts adjacently.

    Distributed shape: one ``global_dense_rank`` (two bounded shuffles),
    then pair generation as rank -> rank+j for j in 1..window-1 via an
    equi-join on the UNIFORM rank key — explicitly NOT a window function
    over a global sort, and boundary pairs across range partitions fall
    out of the join for free (no edge replication step needed).
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    ranked = global_dense_rank(
        df.select(F.col(id_col).alias("doc_id"), F.col(key_col).alias("k")),
        ["k", "doc_id"],
        partitions=partitions,
    )
    left = ranked.select(
        F.col("doc_id").alias("doc_a"), F.col("rank").alias("rank_a")
    )
    probes = left.select(
        "doc_a",
        "rank_a",
        F.explode(
            F.sequence(F.lit(1), F.lit(window - 1))
        ).alias("rank_gap"),
    ).withColumn("rank_b", F.col("rank_a") + F.col("rank_gap"))
    right = ranked.select(
        F.col("doc_id").alias("doc_b"), F.col("rank").alias("rank_b")
    )
    return probes.join(right, "rank_b").select(
        "doc_a", "doc_b", F.col("rank_gap").cast("bigint").alias("rank_gap")
    )
