"""Sequence packing — assign documents to fixed-token-budget packs for
LLM training batch construction.

Exact bin packing is NP-hard and order-dependent; what a data pipeline
needs is a DETERMINISTIC, shuffle-light assignment that any engine can
replay.  Scheme: docs are spread across ``buckets`` independent streams by
id hash (the parallelism unit — each bucket's packing is independent, so
the window never sees more than ~corpus/buckets rows and buckets scale
with the cluster), ordered within the bucket by doc id, and packed by
cumulative fill: pack boundary every ``budget`` tokens of running total.

Properties:
- pack_id is a pure function of (corpus, budget, buckets, salt) — stable
  across runs/partitionings, replayable in SQL (the DuckDB oracle runs the
  identical window arithmetic);
- a pack overflows its budget by at most one document's tokens (the
  standard fill-then-truncate packing contract; docs longer than the
  budget get a pack of their own).  An overflowing doc consumes the next
  pack's fill space, so the pack AFTER an overflow can be under-full —
  cumulative-fill trades perfect fill for determinism and one-pass cost;
- one hash-partitioned window per bucket is the only shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    buckets: int = 1024,
    salt: str = "",
) -> DataFrame:
    """-> input columns + (bucket, pack_id): pack_id unique within bucket;
    (bucket, pack_id) is the global pack key."""
    h = F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt)))
    bucket = (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % buckets
    ).alias("bucket")
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    # exclusive prefix sum -> floor-div: a doc starts a new pack when the
    # tokens BEFORE it already fill a whole number of budgets
    return df.select("*", bucket).withColumn(
        "pack_id",
        F.floor((cum - F.col(token_col)) / F.lit(budget)).cast("bigint"),
    )
