"""The one-shuffle vectorized-batch scoring path (mapInPandas) must agree
exactly with the relational path — on the reference fixtures AND on a
synthetic docs table, including small Arrow batches that split protein
groups across chunk boundaries."""

import pytest
from pyspark.sql import functions as F

from ahrd_spark.config import load_config
from ahrd_spark.operators.scoring import select_winners, with_overlap
from ahrd_spark.operators.scoring_batch import select_winners_batch
from ahrd_spark.plans.annotate import load_candidate_hits, score_candidates

REF = "/root/reference"


def _batch_winners(hits, cfg, **kw):
    return select_winners_batch(
        hits,
        cfg.db_weights,
        cfg.dsbs_weights,
        (
            cfg.token_score_bit_score_weight,
            cfg.token_score_database_score_weight,
            cfg.token_score_overlap_score_weight,
        ),
        top_k=cfg.top_blast_results,
        **kw,
    )


def _as_dict(df):
    return {
        x["protein_acc"]: (
            x["hit_acc"],
            round(x["desc_score"], 9),
            round(x["desc_high_score"], 9),
            round(x["lexical_score"], 9),
            round(x["rel_bit_score"], 9),
        )
        for x in df.collect()
    }


@pytest.mark.parametrize("yml", ["ahrd_example_input.yml",
                                 "test/resources/ahrd_input.yml"])
def test_batch_path_matches_relational(spark, yml):
    cfg = load_config(f"{REF}/{yml}", base_dir=REF)
    hits = load_candidate_hits(spark, cfg).cache()
    relational = select_winners(with_overlap(score_candidates(hits, cfg)))
    assert _as_dict(relational) == _as_dict(_batch_winners(hits, cfg))


def test_batch_path_matches_on_synthetic_with_tiny_arrow_batches(spark):
    from ahrd_spark.plans.docs import docs_to_hits, synthesize_docs
    from ahrd_spark.plans.pipeline import gate_candidates_multi
    from bench import _pipeline_cfg

    cfg = _pipeline_cfg()
    docs = synthesize_docs(spark, 300, hits_per_doc=12)
    hits = gate_candidates_multi(docs_to_hits(docs), cfg).cache()
    relational = select_winners(with_overlap(score_candidates(hits, cfg)))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        # 7-row batches: every protein group (12 hits) straddles a batch
        # boundary -> exercises the leftover-carry chunker
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        batch = _batch_winners(hits, cfg, num_partitions=5)
        r = _as_dict(relational)
        b = _as_dict(batch)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert r == b
    assert len(r) == 300


def test_batch_path_go_preference(spark):
    """prefer_go restricts the argmax to GO-annotated candidates when any
    exist for a protein (DescriptionScoreCalculator.java:89-99)."""
    from ahrd_spark.plans.docs import docs_to_hits, synthesize_docs
    from ahrd_spark.plans.pipeline import gate_candidates_multi
    from bench import _pipeline_cfg

    cfg = _pipeline_cfg()
    docs = synthesize_docs(spark, 120, hits_per_doc=8)
    hits = gate_candidates_multi(docs_to_hits(docs), cfg).cache()
    # every 3rd short accession is "GO-annotated"
    accs = [r["short_acc"] for r in hits.select("short_acc").distinct().collect()]
    go_accs = sorted(accs)[:: 3]
    goa = hits.sparkSession.createDataFrame(
        [(a,) for a in go_accs], "short_acc string"
    )
    relational = select_winners(
        with_overlap(score_candidates(hits, cfg)), goa=goa, prefer_go=True
    )
    batch = _batch_winners(hits, cfg, goa=goa, prefer_go=True)
    assert _as_dict(relational) == _as_dict(batch)


def test_batch_path_pre_grouped_matches(spark, tmp_path):
    """pre_grouped=True skips the scorer's repartition+sort, trusting the
    caller's checkpoint layout (hash-partitioned by protein_acc, one whole
    file per scan task).  Must be value-identical to the shuffled path."""
    import glob
    import os

    from ahrd_spark.plans.checkpoint import whole_file_scan
    from ahrd_spark.plans.docs import docs_to_hits, synthesize_docs
    from ahrd_spark.plans.pipeline import gate_candidates_multi
    from bench import _pipeline_cfg

    cfg = _pipeline_cfg()
    docs = synthesize_docs(spark, 250, hits_per_doc=9)
    hits = gate_candidates_multi(docs_to_hits(docs), cfg).cache()
    relational = select_winners(with_overlap(score_candidates(hits, cfg)))

    # emulate the mention-detect checkpoint layout: hash-repartition by
    # protein_acc, sort within partitions, one parquet file per partition
    path = str(tmp_path / "mention_ckpt")
    hits.repartition(7, "protein_acc").sortWithinPartitions(
        "protein_acc", "line_no"
    ).write.parquet(path)
    max_bytes = max(
        os.path.getsize(f) for f in glob.glob(os.path.join(path, "*.parquet"))
    )

    pre = {
        k: spark.conf.get(k, None)
        for k in ("spark.sql.files.maxPartitionBytes",
                  "spark.sql.files.openCostInBytes")
    }
    with whole_file_scan(spark, max_bytes):
        back = spark.read.parquet(path)
        grouped = _as_dict(_batch_winners(back, cfg, pre_grouped=True))
    # context manager restores the scan-split confs
    for k, v in pre.items():
        assert spark.conf.get(k, None) == v
    assert _as_dict(relational) == grouped
    assert len(grouped) == 250


def test_batch_path_pre_grouped_rejects_prefer_go(spark):
    from ahrd_spark.plans.docs import docs_to_hits, synthesize_docs
    from ahrd_spark.plans.pipeline import gate_candidates_multi
    from bench import _pipeline_cfg

    cfg = _pipeline_cfg()
    hits = gate_candidates_multi(
        docs_to_hits(synthesize_docs(spark, 10, hits_per_doc=3)), cfg
    )
    goa = spark.createDataFrame([("X",)], "short_acc string")
    with pytest.raises(ValueError, match="pre_grouped"):
        _batch_winners(hits, cfg, goa=goa, prefer_go=True, pre_grouped=True)
