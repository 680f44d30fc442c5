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
from ahrd_spark.plans.docs import DOCS_SCHEMA
from ahrd_spark.plans.pipeline import detect_mentions


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
    SAME detect_mentions plan the batch stage runs — one codebase,
    two execution modes."""
    docs = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )
    mentions = detect_mentions(docs, cfg)
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


SESSION_OUTPUT_SCHEMA = "user_id bigint, n_sessions bigint, n_events bigint"
SESSION_STATE_SCHEMA = (
    "starts array<bigint>, ends array<bigint>, n_events bigint"
)


def stateful_session_counts(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user session counting with a ``gap_minutes`` inactivity split.

    State per user = the merged *session intervals* seen so far (plus an
    event counter).  A gap-sessionization is exactly interval-merging of
    timestamps at distance <= gap, and interval merging is commutative —
    so the fold is insensitive to arrival order across micro-batches
    (late/out-of-order rows within the watermark land in the right
    session instead of splitting it).  State size is bounded by the number
    of sessions, not events.  Each trigger emits the updated per-user
    totals.

    Equivalent batch formulation: the lag-window sessionize
    (``events_sessionize`` in the driver contract) — the test suite
    asserts stream==batch parity on the same input with shuffled arrival
    order, the correctness bar for every streaming variant in this engine.
    The reference has no streaming/stateful surface at all (SURVEY.md
    SSt); this is the engine's scale path for continuous per-entity state.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            starts, ends, n_events = state.get
            intervals = list(zip(list(starts), list(ends)))
        else:
            intervals, n_events = [], 0
        for pdf in pdfs:
            for us in (pdf["ts"].astype("int64") // 1000).tolist():
                intervals.append((us, us))
                n_events += 1
        if not intervals:  # timeout-only invocation: nothing to fold
            return
        intervals.sort()
        merged = [intervals[0]]
        for s, e in intervals[1:]:
            if s - merged[-1][1] <= gap_us:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        state.update(
            ([s for s, _ in merged], [e for _, e in merged], n_events)
        )
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [len(merged)],
             "n_events": [n_events]}
        )

    df = events.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id"
    )  # parquet NTZ -> TZ before the watermark (event time must be TIMESTAMP)
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
