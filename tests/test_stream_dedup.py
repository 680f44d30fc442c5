"""Streaming incremental exact dedup: cross-trigger suppression, in-batch
keepers, restart/resume, and retry idempotence via the per-batch state."""

import os

from pyspark.sql import functions as F

from ahrd_spark.streaming.pipeline import stream_dedup_exact


def _land(spark, tmp_path, name, rows):
    """Land ONE flat parquet file (<src>/<name>.parquet) — the file-stream
    source lists plain files, and one file per _land call gives one
    trigger under maxFilesPerTrigger=1."""
    import glob
    import shutil

    staging = str(tmp_path / "staging" / name)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    dest = str(tmp_path / "src" / f"{name}.parquet")
    shutil.copy(part, dest)
    return dest


def _run(spark, tmp_path, src):
    sq = stream_dedup_exact(
        spark,
        src,
        str(tmp_path / "sink"),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    assert sq.awaitTermination(300)


def test_stream_dedup_first_seen_wins_across_triggers(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # one landed file per trigger (maxFilesPerTrigger=1); file names order
    # the triggers
    _land(spark, tmp_path, "a", [
        (1, "alpha text", "s"),
        (2, "alpha text", "s"),      # in-batch dup -> keeper is 1
        (3, "beta text", "s"),
    ])
    _land(spark, tmp_path, "b", [
        (4, "alpha text", "s"),      # cross-trigger dup -> suppressed
        (5, "gamma text", "s"),
    ])
    _run(spark, tmp_path, src)

    out = spark.read.parquet(str(tmp_path / "sink"))
    kept = {r["text"]: r["doc_id"] for r in out.collect()}
    assert kept == {"alpha text": 1, "beta text": 3, "gamma text": 5}
    # the sink is the deduped corpus: passthrough columns survive
    assert all(r["source"] == "s" for r in out.collect())

    # restart on NEW arrivals: known content suppressed, new content kept
    _land(spark, tmp_path, "c", [
        (6, "beta text", "s"),
        (7, "delta text", "s"),
    ])
    _run(spark, tmp_path, src)
    out2 = spark.read.parquet(str(tmp_path / "sink"))
    kept2 = {r["text"]: r["doc_id"] for r in out2.collect()}
    assert kept2 == {
        "alpha text": 1, "beta text": 3, "gamma text": 5, "delta text": 7,
    }


def test_stream_dedup_batch_retry_is_idempotent(spark, tmp_path):
    """A batch that re-runs (simulated by pre-seeding this batch_id's own
    state dir) must not suppress itself and must overwrite, not append."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _land(spark, tmp_path, "a", [(1, "alpha text", "s")])
    # pre-seed state/batch_id=0 as if a previous attempt of batch 0 died
    # after writing state but before the checkpoint commit
    spark.createDataFrame(
        [("%s" % __import__("hashlib").md5(b"alpha text").hexdigest(),)],
        "content_hash string",
    ).write.mode("overwrite").parquet(
        str(tmp_path / "state" / "batch_id=0")
    )
    _run(spark, tmp_path, src)
    out = spark.read.parquet(str(tmp_path / "sink"))
    assert [(r["doc_id"], r["text"]) for r in out.collect()] == [
        (1, "alpha text")
    ]


def test_stream_dedup_null_text_one_keeper(spark, tmp_path):
    """md5(NULL) is NULL; the null-safe anti-join must keep exactly one
    NULL-content keeper across triggers (matching batch exact dedup)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _land(spark, tmp_path, "a", [(1, None, "s")])
    _land(spark, tmp_path, "b", [(2, None, "s"), (3, "real text here", "s")])
    _run(spark, tmp_path, src)
    out = spark.read.parquet(str(tmp_path / "sink")).collect()
    assert sorted((r["doc_id"], r["text"]) for r in out) == [
        (1, None), (3, "real text here"),
    ]


def test_stream_dedup_bad_state_layout_fails_loudly(spark, tmp_path):
    """A state table without the batch_id layout (e.g. a botched
    compaction) must FAIL the batch, not silently disable dedup."""
    import pytest
    from pyspark.errors import StreamingQueryException

    src = str(tmp_path / "src")
    os.makedirs(src)
    _land(spark, tmp_path, "a", [(1, "alpha text", "s")])
    # flat state parquet with no batch_id partition dirs
    spark.createDataFrame(
        [("deadbeef",)], "content_hash string"
    ).write.mode("overwrite").parquet(str(tmp_path / "state"))
    sq = stream_dedup_exact(
        spark, src,
        str(tmp_path / "sink"),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    with pytest.raises(StreamingQueryException):
        sq.awaitTermination(300)
