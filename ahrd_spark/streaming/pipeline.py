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


def stream_triples(
    spark: SparkSession,
    cfg: AhrdConfig,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    synonym_edges: DataFrame | None = None,
    num_partitions: int | None = None,
    trigger_once: bool = True,
    max_files_per_trigger: int = 8,
):
    """Incremental docs->triples: readStream(docs parquet landing zone) ->
    foreachBatch(mention-detect + link-score + GO transfer + canonical map
    -> idempotent per-batch parquet append under ``sink_dir/batch_id=N``).

    Why micro-batching is EXACT here (not an approximation): a doc row is
    self-contained — every hit of a protein lives in that protein's spans
    array — and the scoring core's aggregations (E2/E3 totals, K1 top-k,
    E10 argmax) are all per-protein.  A doc processed in batch N therefore
    produces exactly the triples the batch pipeline would produce for it,
    regardless of what other docs share the trigger.  The set-union of all
    batch outputs equals the batch pipeline's output on the same docs
    (pinned by tests/test_extras.py).

    Exactly-once: the streaming checkpoint tracks consumed files; each
    batch OVERWRITES its own ``batch_id=N`` directory, so a retried batch
    rewrites the same rows instead of duplicating them (read the sink with
    ``spark.read.parquet(sink_dir)`` — Spark maps the partition dirs back
    to a ``batch_id`` column).

    Static reference inputs (GOA, synonym edges) are resolved ONCE at
    stream start and reused by every trigger: GOA is re-read per batch
    semi-filtered to that batch's accessions (the reference-table scan is
    predicate-pushed, never fully materialized), and the canonical map is a
    small static frame broadcast into each batch.  InterPro hasDomain
    triples come from a static per-config file in the reference layout, not
    from the stream — run the batch pipeline for those.
    """
    from ahrd_spark.operators.connected_components import canonical_map
    from ahrd_spark.operators.go_transfer import transfer_go
    from ahrd_spark.operators.scoring_batch import select_winners_batch
    from ahrd_spark.sources.goa import read_goa

    docs = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    token_w = (
        cfg.token_score_bit_score_weight,
        cfg.token_score_database_score_weight,
        cfg.token_score_overlap_score_weight,
    )

    def handle(batch_docs: DataFrame, batch_id: int) -> None:
        from ahrd_spark.plans.pipeline import desc_triples

        mentions = detect_mentions(batch_docs, cfg).drop("media_ref")
        # the write action references the winners subplan up to 3x (desc
        # triples, GO transfer, the source join-back) and mentions twice —
        # Spark does no cross-subplan CSE, so without persisting each
        # micro-batch would re-run mention-detect + the vectorized scorer
        # per reference (the recomputation the batch path avoids by
        # checkpointing each stage)
        cached = []
        goa = None
        if cfg.has_go:
            mentions = mentions.persist()
            cached.append(mentions)
            goa = read_goa(
                spark,
                cfg.gene_ontology_result,
                cfg.reference_go_regex,
                short_accessions=mentions.select("short_acc"),
            )
        winners = select_winners_batch(
            mentions,
            cfg.db_weights,
            cfg.dsbs_weights,
            token_w,
            top_k=cfg.top_blast_results,
            goa=goa,
            prefer_go=cfg.prefer_reference_with_go_annos and goa is not None,
            num_partitions=num_partitions,
        )
        if goa is not None:
            winners = winners.persist()
            cached.append(winners)
        triples = desc_triples(winners)
        if goa is not None:
            ents = transfer_go(winners, goa).select(
                "protein_acc", F.explode("go_terms").alias("obj")
            )
            cmap = canonical_map(synonym_edges, ents.select("obj"))
            go_triples = (
                ents.join(
                    F.broadcast(cmap.withColumnRenamed("node", "obj")),
                    "obj",
                    "left",
                )
                .join(
                    winners.select("protein_acc", "db", "hit_acc"),
                    "protein_acc",
                    "left",
                )
                .select(
                    F.col("protein_acc").alias("subj"),
                    F.lit("hasGOTerm").alias("pred"),
                    F.coalesce("canonical", "obj").alias("obj"),
                    F.lit("go_term").alias("obj_kind"),
                    F.lit(None).cast("double").alias("score"),
                    F.col("db").alias("src_db"),
                    F.col("hit_acc").alias("src_hit"),
                )
            )
            triples = triples.unionByName(go_triples)
        try:
            triples.write.mode("overwrite").parquet(
                f"{sink_dir}/batch_id={batch_id}"
            )
        finally:
            for df in cached:
                df.unpersist(blocking=False)

    writer = docs.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_exact(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    schema: str = "doc_id bigint, text string, source string",
    trigger_once: bool = True,
    max_files_per_trigger: int = 8,
):
    """Incremental exact dedup over a docs landing zone: only
    never-seen-before content reaches the sink, across ALL triggers of all
    runs (the continuously-arriving-crawl shape of `dedup_incremental`).

    Per micro-batch (foreachBatch):

    1. hash the batch (md5 over ``text_col``),
    2. keep one in-batch keeper per hash (min ``id_col``),
    3. anti-join the keepers against the accumulated STATE hash table,
       EXCLUDING rows this same batch id wrote — so a retried batch
       ignores its own partial writes instead of suppressing itself,
    4. overwrite ``sink_dir/batch_id=N`` with the surviving rows and
       ``state_dir/batch_id=N`` with their hashes (overwrite-by-batch-dir
       keeps retries idempotent, exactly like ``stream_triples``).

    Semantics: FIRST-SEEN WINS across triggers — the streaming-natural
    dedup contract; it coincides with batch ``exact_dedup``'s min-id
    keeper whenever files land in id order, and the kept HASH SET equals
    the batch result under any arrival order.

    Scale: the per-trigger cost is one hash-shuffled anti-join of the
    batch's keys against the state keys plus the batch-sized writes.  At
    10^12-doc state, compact the per-batch state dirs periodically and
    partition the compacted table by a hash prefix so the anti-join
    prunes to matching buckets; the trigger-time work stays bounded by
    the batch, never by history size.
    """
    from pyspark.errors import AnalysisException

    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def handle(batch_docs: DataFrame, batch_id: int) -> None:
        # keepers carry EVERY input column (the sink IS the deduped corpus
        # — a narrowed schema would force a re-join against the landing
        # zone to recover dropped columns like `source`)
        doc_cols = list(batch_docs.columns)
        hashed = batch_docs.withColumn(
            "content_hash", F.md5(F.col(text_col))
        )
        keep = (
            hashed.groupBy("content_hash")
            .agg(
                F.min_by(
                    F.struct(*[F.col(c) for c in doc_cols]), F.col(id_col)
                ).alias("k")
            )
            .select("content_hash", "k.*")
        )
        try:
            seen = (
                spark.read.parquet(state_dir)
                .filter(F.col("batch_id") != batch_id)
                .select("content_hash")
            )
            # null-safe anti-join: md5(NULL) is NULL, and a plain key
            # anti-join would re-emit a NULL-content keeper every batch
            # (NULL = NULL never matches) — eqNullSafe keeps the
            # one-keeper-per-content contract for the NULL group too
            keep = keep.alias("k").join(
                seen.alias("s"),
                F.col("k.content_hash").eqNullSafe(F.col("s.content_hash")),
                "left_anti",
            )
        except AnalysisException as e:
            # cold start (no state yet) is the ONLY condition this may
            # swallow; anything else — e.g. a compacted state table whose
            # layout lost the batch_id column — must fail the batch loudly
            # instead of silently disabling cross-trigger dedup
            klass = getattr(e, "errorClass", None) or (
                e.getErrorClass() if hasattr(e, "getErrorClass") else None
            )
            if klass != "PATH_NOT_FOUND":
                raise
        # referenced by two write actions — persist so the anti-join runs
        # once, not once per sink
        keep = keep.persist()
        try:
            keep.write.mode("overwrite").parquet(
                f"{sink_dir}/batch_id={batch_id}"
            )
            keep.select("content_hash").write.mode("overwrite").parquet(
                f"{state_dir}/batch_id={batch_id}"
            )
        finally:
            keep.unpersist()

    writer = docs.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_click_attribution(
    clicks: DataFrame,
    views: DataFrame,
    within: str = "10 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: attribute each click to every view by
    the same user in the preceding ``within`` -> (click_id, view_id,
    user_id, c_ts, v_ts).

    Both inputs carry (user_id, ts, event_id).  On streaming inputs each
    side gets a watermark and the join carries an explicit event-time
    bound — the two ingredients Structured Streaming needs to know when
    buffered state can be dropped: a view older than
    ``watermark + within`` can never match a future click, so the state
    store stays bounded regardless of stream length.  On batch inputs
    the same plan is an ordinary interval-condition join, which is how
    the test oracles it.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").cast("timestamp").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").cast("timestamp").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    if c.isStreaming:
        c = c.withWatermark("c_ts", watermark)
    if v.isStreaming:
        v = v.withWatermark("v_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("v_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {within}"))
    )
    return c.join(v, cond).select(
        "click_id", "view_id", F.col("c_user").alias("user_id"),
        "c_ts", "v_ts",
    )


def stream_interleaved_ingest(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    state_dir: str,
    metrics_dir: str,
    checkpoint_dir: str,
    max_media_ratio: float = 0.5,
    min_text_chars: int = 20,
    min_text_spans: int = 1,
    trigger_once: bool = True,
    max_files_per_trigger: int = 8,
):
    """Streaming ingest of an interleaved text+media landing zone:
    gate -> fingerprint -> cross-batch content dedup -> audited sink.

    Per micro-batch (foreachBatch):

    1. ``media_text_gate`` drops non-trainable docs (no_text /
       media_heavy / too_short);
    2. survivors get the order-sensitive ``span_fingerprint`` — the
       span-sequence invariant travels WITH the row from the first
       trigger on, so any later stage can audit content preservation
       against the ingest-time digest without re-reading the spans;
    3. first-seen-wins content dedup: anti-join the batch's fingerprints
       against the accumulated state (excluding this batch id's own
       writes, so retries stay idempotent — same contract as
       ``stream_dedup_exact``);
    4. write surviving docs (+ ``span_fp``) to ``sink_dir/batch_id=N``,
       their fingerprints to ``state_dir/batch_id=N``, and a one-row
       lineage record to ``metrics_dir/batch_id=N``: ``(batch_id, n_in,
       n_gated, n_dup, n_out)`` plus per-gate-reason counts — the
       per-batch metrics/lineage trail the resumable-pipeline contract
       asks for, written by overwrite-by-batch-dir so a retried batch
       replaces (never double-counts) its own record.

    Scale: per-trigger cost is the batch-sized gate/fingerprint
    projections (zero shuffle), one fingerprint-keyed anti-join against
    state, and batch-sized writes; state grows one 32-char digest per
    ingested doc, compactable exactly like ``stream_dedup_exact``'s.
    """
    from pyspark.errors import AnalysisException

    from ahrd_spark.operators.interleaved import (
        media_text_gate,
        span_fingerprint,
    )

    schema = (
        "doc_id bigint, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def handle(batch_docs: DataFrame, batch_id: int) -> None:
        gate = media_text_gate(
            batch_docs,
            max_media_ratio=max_media_ratio,
            min_text_chars=min_text_chars,
            min_text_spans=min_text_spans,
        )
        gated = batch_docs.join(gate, "doc_id").persist()
        try:
            fp = span_fingerprint(
                gated.filter(F.col("keep")).drop("keep", "drop_reason")
            )
            # one in-batch keeper per fingerprint (min doc_id), so the
            # kept FINGERPRINT SET is arrival-order independent even when
            # duplicates share a batch
            doc_cols = [c for c in fp.columns if c != "span_fp"]
            kept = (
                fp.groupBy("span_fp")
                .agg(
                    F.min_by(
                        F.struct(*[F.col(c) for c in doc_cols]),
                        F.col("doc_id"),
                    ).alias("k")
                )
                .select("span_fp", "k.*")
            )
            try:
                seen = (
                    spark.read.parquet(state_dir)
                    .filter(F.col("batch_id") != batch_id)
                    .select("span_fp")
                )
                kept = kept.join(seen, "span_fp", "left_anti")
            except AnalysisException as e:
                klass = getattr(e, "errorClass", None) or (
                    e.getErrorClass()
                    if hasattr(e, "getErrorClass")
                    else None
                )
                if klass != "PATH_NOT_FOUND":
                    raise
            kept = kept.persist()
            try:
                kept.write.mode("overwrite").parquet(
                    f"{sink_dir}/batch_id={batch_id}"
                )
                kept.select("span_fp").write.mode("overwrite").parquet(
                    f"{state_dir}/batch_id={batch_id}"
                )
                # lineage record: one row per batch, reason counts as a
                # map so new gate reasons never change the schema
                n_in = gated.count()
                n_kept_gate = gated.filter(F.col("keep")).count()
                n_out = kept.count()
                reasons = {
                    r["drop_reason"]: r["n"]
                    for r in gated.filter(~F.col("keep"))
                    .groupBy("drop_reason")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
                spark.createDataFrame(
                    [
                        (
                            batch_id,
                            n_in,
                            n_in - n_kept_gate,
                            n_kept_gate - n_out,
                            n_out,
                            reasons,
                        )
                    ],
                    "batch_id bigint, n_in bigint, n_gated bigint, "
                    "n_dup bigint, n_out bigint, "
                    "gate_reasons map<string,bigint>",
                ).coalesce(1).write.mode("overwrite").parquet(
                    f"{metrics_dir}/batch_id={batch_id}"
                )
            finally:
                kept.unpersist()
        finally:
            gated.unpersist()

    writer = docs.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_kmv_sketch(
    spark: SparkSession,
    source_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    value_col: str = "text",
    group_col: str | None = None,
    k: int = 64,
    schema: str = "doc_id bigint, text string, source string",
    trigger_once: bool = True,
    max_files_per_trigger: int = 8,
):
    """Streaming KMV distinct-count rollup over a docs landing zone: each
    micro-batch writes its own bottom-k sketch partition
    (``sketch_dir/batch_id=N``), and ``sketches.kmv_merge`` folds the
    per-batch partitions into the corpus sketch on demand.

    Because the KMV merge is associative, commutative AND idempotent
    (duplicate hashes collapse in the bottom-k), the merged streaming
    result is BIT-IDENTICAL to the batch ``kmv_distinct`` over the whole
    corpus, regardless of how arrival order slices the docs across
    triggers or how many times a failed trigger retried — the
    overwrite-by-batch-dir layout (same contract as ``stream_triples``)
    makes replays harmless twice over.

    Scale: per-trigger cost is the batch's own bottom-k (batch-sized);
    state growth is k hashes per (batch, group) — merge and compact the
    partitions periodically and history never gets rescanned.
    """
    from ahrd_spark.operators.sketches import kmv_distinct

    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    groups = [group_col] if group_col else None

    def handle(batch_docs: DataFrame, batch_id: int) -> None:
        sk = kmv_distinct(batch_docs, value_col, k=k, group_cols=groups)
        sk.write.mode("overwrite").parquet(
            f"{sketch_dir}/batch_id={batch_id}"
        )

    writer = docs.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
