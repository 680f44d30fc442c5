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
    from ahrd_spark.functions.hashing import md5_prefix60

    h = F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))
    bucket = (md5_prefix60(h) % buckets).alias("bucket")
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


def chunk_documents(
    df: DataFrame,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window token chunking for context-window preparation ->
    (id_col, chunk_id, start_token, n_tokens, chunk_text).

    Docs are whitespace-tokenized; chunk ``i`` covers tokens
    [i*stride, i*stride + window).  Chunk count is
    ``ceil(max(n - window, 0) / stride) + 1`` — every token lands in at
    least one chunk, the final chunk may be shorter than ``window``, and a
    doc at most ``window`` tokens long yields exactly one chunk.  Empty
    docs yield one empty chunk (kept: downstream joins stay total over
    doc ids).

    Scale shape: pure per-row codegen — split once, one ``sequence`` of
    start offsets, one explode, ``slice`` + ``concat_ws`` per chunk.  No
    shuffle, no Python; output rows ~= corpus tokens / stride, produced
    streaming inside the scan stage, so the operator pipelines into any
    downstream shuffle (e.g. pack_sequences on the chunk token counts).
    Overlap (window - stride tokens) is the standard training-data stride
    redundancy; set stride == window for disjoint chunks.
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(F.size(toks))
    n_chunks = (
        F.ceil(F.greatest(n - window, F.lit(0)) / F.lit(stride)) + 1
    ).cast("int")
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    return (
        df.select(
            F.col(id_col),
            toks.alias("_toks"),
            n.alias("_n"),
            F.posexplode(starts).alias("chunk_id", "start_token"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.col("start_token").cast("bigint").alias("start_token"),
            F.least(
                F.lit(window).cast("bigint"),
                (F.col("_n") - F.col("start_token")).cast("bigint"),
            ).alias("n_tokens"),
            F.concat_ws(
                " ", F.slice(F.col("_toks"), F.col("start_token") + 1, window)
            ).alias("chunk_text"),
        )
    )
