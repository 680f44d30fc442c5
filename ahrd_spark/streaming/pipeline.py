"""Structured Streaming variants of the engine's stages.

The reference is strictly batch (one JVM run per YAML; its only parallelism
is the file-splitting Batcher, Batcher.java:70-83).  The engine adds a
streaming ingestion path: a docs stream (e.g. a landing zone of parquet
files written by an upstream crawler) can be mention-detected continuously
and appended to the mentions checkpoint; scoring remains a periodic batch
job over the accumulated mentions (the scoring math needs per-protein
totals over ALL hits, so it is a batch aggregation by nature).

``windowed_event_counts`` demonstrates the watermarked windowed-aggregation
operator surface on an event stream (late data bounded by the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ahrd_spark.config import AhrdConfig
from ahrd_spark.plans.docs import DOCS_SCHEMA, docs_to_hits
from ahrd_spark.plans.pipeline import gate_candidates_multi


def stream_mention_detect(
    spark: SparkSession,
    cfg: AhrdConfig,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """readStream(docs parquet dir) -> shred + gate -> append parquet sink.
    Exactly-once via the streaming checkpoint; the transformation is the
    SAME gate_candidates_multi plan the batch stage runs — one codebase,
    two execution modes."""
    docs = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )
    mentions = gate_candidates_multi(docs_to_hits(docs), cfg)
    writer = (
        mentions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums — works on both a static
    DataFrame (batch backfill) and a stream (late rows beyond the watermark
    dropped)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )
