"""Streaming interleaved ingest: gate + fingerprint + cross-trigger
content dedup + per-batch lineage metrics."""

import glob
import os
import shutil

from pyspark.sql import functions as F

from ahrd_spark.streaming.pipeline import stream_interleaved_ingest

SCHEMA = (
    "doc_id bigint, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _span(kind, text=None, media_ref=None, offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref,
            "offset": offset}


def _land(spark, tmp_path, name, rows):
    staging = str(tmp_path / "staging" / name)
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    dest = str(tmp_path / "src" / f"{name}.parquet")
    shutil.copy(part, dest)
    return dest


def _run(spark, tmp_path):
    sq = stream_interleaved_ingest(
        spark,
        str(tmp_path / "src"),
        str(tmp_path / "sink"),
        str(tmp_path / "state"),
        str(tmp_path / "metrics"),
        str(tmp_path / "ckpt"),
        max_media_ratio=0.5,
        min_text_chars=5,
        min_text_spans=1,
        max_files_per_trigger=1,
    )
    assert sq.awaitTermination(300)


GOOD = [_span("text", text="hello world prose", offset=0),
        _span("media", media_ref="m1", offset=1)]
GOOD2 = [_span("text", text="other good prose", offset=0)]
ALL_MEDIA = [_span("media", media_ref="m1", offset=0),
             _span("media", media_ref="m2", offset=1)]
SHORT = [_span("text", text="abc", offset=0)]


def test_stream_interleaved_gate_dedup_and_metrics(spark, tmp_path):
    os.makedirs(str(tmp_path / "src"))
    _land(spark, tmp_path, "a", [
        (1, GOOD),
        (2, GOOD),        # in-batch content dup -> keeper is 1
        (3, ALL_MEDIA),   # gated: no_text
        (4, SHORT),       # gated: too_short
    ])
    _land(spark, tmp_path, "b", [
        (5, GOOD),        # cross-trigger dup -> suppressed
        (6, GOOD2),
    ])
    _run(spark, tmp_path)

    sink = spark.read.parquet(str(tmp_path / "sink"))
    assert sorted(r["doc_id"] for r in sink.collect()) == [1, 6]
    # fingerprint travels with the row and is the dedup key
    assert sink.select("span_fp").distinct().count() == 2

    metrics = {
        r["batch_id"]: r.asDict()
        for r in spark.read.parquet(str(tmp_path / "metrics")).collect()
    }
    assert len(metrics) == 2
    for m in metrics.values():
        assert m["n_in"] == m["n_gated"] + m["n_dup"] + m["n_out"]
    # batch ordering follows file name order (a then b)
    first, second = (metrics[k] for k in sorted(metrics))
    assert (first["n_in"], first["n_gated"], first["n_dup"],
            first["n_out"]) == (4, 2, 1, 1)
    assert dict(first["gate_reasons"]) == {"no_text": 1, "too_short": 1}
    assert (second["n_in"], second["n_gated"], second["n_dup"],
            second["n_out"]) == (2, 0, 1, 1)


def test_stream_interleaved_resume_suppresses_history(spark, tmp_path):
    os.makedirs(str(tmp_path / "src"))
    _land(spark, tmp_path, "a", [(1, GOOD)])
    _run(spark, tmp_path)
    # new arrivals after a restart: the duplicate of batch-0 content is
    # suppressed by the persisted state, the novel doc survives
    _land(spark, tmp_path, "b", [(7, GOOD), (8, GOOD2)])
    _run(spark, tmp_path)

    sink = spark.read.parquet(str(tmp_path / "sink"))
    assert sorted(r["doc_id"] for r in sink.collect()) == [1, 8]


def test_stream_interleaved_media_heavy_gate(spark, tmp_path):
    os.makedirs(str(tmp_path / "src"))
    heavy = [_span("text", text="caption words", offset=0),
             _span("media", media_ref="m1", offset=1),
             _span("media", media_ref="m2", offset=2)]
    _land(spark, tmp_path, "a", [(1, heavy), (2, GOOD2)])
    _run(spark, tmp_path)

    sink = spark.read.parquet(str(tmp_path / "sink"))
    assert [r["doc_id"] for r in sink.collect()] == [2]
    m = spark.read.parquet(str(tmp_path / "metrics")).collect()[0]
    assert dict(m["gate_reasons"]) == {"media_heavy": 1}
