"""The grouped-Arrow scoring path must agree exactly with the relational
path — on the reference fixtures AND on a synthetic docs table."""

import pytest
from pyspark.sql import functions as F

from ahrd_spark.config import load_config
from ahrd_spark.operators.scoring import select_winners, with_overlap
from ahrd_spark.operators.scoring_pandas import select_winners_pandas
from ahrd_spark.plans.annotate import load_candidate_hits, score_candidates

REF = "/root/reference"


def _winners_both_ways(spark, cfg):
    hits = load_candidate_hits(spark, cfg).cache()
    relational = select_winners(with_overlap(score_candidates(hits, cfg)))
    arrow = select_winners_pandas(
        hits,
        cfg.db_weights,
        cfg.dsbs_weights,
        (
            cfg.token_score_bit_score_weight,
            cfg.token_score_database_score_weight,
            cfg.token_score_overlap_score_weight,
        ),
        top_k=cfg.top_blast_results,
    )
    return relational, arrow


@pytest.mark.parametrize("yml", ["ahrd_example_input.yml",
                                 "test/resources/ahrd_input.yml"])
def test_pandas_path_matches_relational(spark, yml):
    cfg = load_config(f"{REF}/{yml}", base_dir=REF)
    relational, arrow = _winners_both_ways(spark, cfg)
    r = {
        x["protein_acc"]: (x["hit_acc"], round(x["desc_score"], 9),
                           round(x["desc_high_score"], 9))
        for x in relational.collect()
    }
    a = {
        x["protein_acc"]: (x["hit_acc"], round(x["desc_score"], 9),
                           round(x["desc_high_score"], 9))
        for x in arrow.collect()
    }
    assert r == a


def test_pandas_path_matches_on_synthetic(spark):
    from ahrd_spark.plans.docs import docs_to_hits, synthesize_docs
    from ahrd_spark.plans.pipeline import gate_candidates_multi
    from bench import _pipeline_cfg

    cfg = _pipeline_cfg()
    docs = synthesize_docs(spark, 200, hits_per_doc=12)
    hits = gate_candidates_multi(docs_to_hits(docs), cfg).cache()
    relational = select_winners(with_overlap(score_candidates(hits, cfg)))
    arrow = select_winners_pandas(
        hits, cfg.db_weights, cfg.dsbs_weights, (0.5, 0.3, 0.2),
        top_k=cfg.top_blast_results,
    )
    r = {x["protein_acc"]: (x["hit_acc"], round(x["desc_score"], 9))
         for x in relational.collect()}
    a = {x["protein_acc"]: (x["hit_acc"], round(x["desc_score"], 9))
         for x in arrow.collect()}
    assert r == a
    assert len(r) == 200
