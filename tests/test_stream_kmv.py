"""Streaming KMV sketch rollup: per-trigger bottom-k partitions whose
merge equals the batch sketch regardless of arrival slicing
(streaming/pipeline.py::stream_kmv_sketch + sketches.py::kmv_merge)."""

import glob
import os
import shutil

from ahrd_spark.operators.sketches import kmv_distinct, kmv_merge
from ahrd_spark.streaming.pipeline import stream_kmv_sketch

SCHEMA = "doc_id bigint, text string, source string"


def _land(spark, tmp_path, name, rows):
    staging = str(tmp_path / "staging" / name)
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    os.makedirs(str(tmp_path / "src"), exist_ok=True)
    dest = str(tmp_path / "src" / f"{name}.parquet")
    shutil.copy(part, dest)


def _run(spark, tmp_path, k=8):
    sq = stream_kmv_sketch(
        spark,
        str(tmp_path / "src"),
        str(tmp_path / "sketches"),
        str(tmp_path / "ckpt"),
        value_col="text",
        group_col="source",
        k=k,
        max_files_per_trigger=1,
    )
    assert sq.awaitTermination(300)
    return spark.read.parquet(str(tmp_path / "sketches"))


def _rows(i0, n, source):
    return [(i0 + i, f"doc {i0 + i} text", source) for i in range(n)]


def test_stream_kmv_merge_equals_batch_sketch(spark, tmp_path):
    a = _rows(0, 30, "crawlA") + _rows(100, 5, "crawlB")
    b = _rows(20, 25, "crawlA")  # overlaps a: dup texts across triggers
    c = _rows(100, 20, "crawlB")
    _land(spark, tmp_path, "a", a)
    _land(spark, tmp_path, "b", b)
    _land(spark, tmp_path, "c", c)
    parts = _run(spark, tmp_path, k=8)
    # one sketch partition per trigger, one row per (batch, source)
    assert {r.batch_id for r in parts.select("batch_id").collect()} == {
        0, 1, 2,
    }
    merged = kmv_merge(parts, k=8, group_cols=["source"])
    batch = kmv_distinct(
        spark.createDataFrame(a + b + c, SCHEMA),
        "text",
        k=8,
        group_cols=["source"],
    )
    got = {
        r.source: (tuple(r.hashes), r.n_seen, r.kth_hash, r.est_distinct)
        for r in merged.collect()
    }
    want = {
        r.source: (tuple(r.hashes), r.n_seen, r.kth_hash, r.est_distinct)
        for r in batch.collect()
    }
    assert got == want


def test_stream_kmv_retry_idempotent(spark, tmp_path):
    rows = _rows(0, 40, "s")
    _land(spark, tmp_path, "a", rows)
    _run(spark, tmp_path, k=8)
    # simulate a replayed trigger: write the same batch dir again (the
    # overwrite-by-batch-dir layout) plus a DUPLICATE batch dir — the
    # idempotent merge must shrug both off
    parts = spark.read.parquet(str(tmp_path / "sketches"))
    dup_dir = str(tmp_path / "sketches" / "batch_id=9")
    parts.drop("batch_id").write.mode("overwrite").parquet(dup_dir)
    merged = kmv_merge(
        spark.read.parquet(str(tmp_path / "sketches")),
        k=8,
        group_cols=["source"],
    ).collect()[0]
    batch = kmv_distinct(
        spark.createDataFrame(rows, SCHEMA), "text", k=8,
        group_cols=["source"],
    ).collect()[0]
    assert merged.hashes == batch.hashes
    assert merged.est_distinct == batch.est_distinct
