"""Hand-worked goldens for multi-source truth discovery
(operators/truth.py): majority round, trust re-weighting round,
deterministic tie-breaks.
"""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ahrd_spark.operators.truth import (  # noqa: E402
    claim_confidence,
    truth_discovery,
)

CLAIM_SCHEMA = "source STRING, subj STRING, pred STRING, obj STRING"


def test_one_iteration_is_majority_vote(spark):
    claims = spark.createDataFrame(
        [
            ("s1", "i1", "p", "a"),
            ("s2", "i1", "p", "a"),
            ("s3", "i1", "p", "b"),
        ],
        CLAIM_SCHEMA,
    )
    rows = claim_confidence(claims, n_iter=1).collect()
    got = {r.obj: r.conf for r in rows}
    assert got == pytest.approx({"a": 2 / 3, "b": 1 / 3})
    win = truth_discovery(claims, n_iter=1).collect()
    assert [(r.subj, r.obj) for r in win] == [("i1", "a")]


def test_second_round_reweights_by_trust(spark):
    # item i1: s1, s2 say a; s3 says b  -> conf1 a=2/3, b=1/3
    # item i2: s1 says x; s3 says y     -> conf1 x=1/2, y=1/2
    # trust1: s1=(2/3+1/2)/2=7/12, s2=2/3, s3=(1/3+1/2)/2=5/12
    # round2 i2: x=7/12, y=5/12 -> x wins (majority alone couldn't decide)
    claims = spark.createDataFrame(
        [
            ("s1", "i1", "p", "a"),
            ("s2", "i1", "p", "a"),
            ("s3", "i1", "p", "b"),
            ("s1", "i2", "p", "x"),
            ("s3", "i2", "p", "y"),
        ],
        CLAIM_SCHEMA,
    )
    win = {
        (r.subj,): (r.obj, r.conf_r)
        for r in truth_discovery(claims, n_iter=2).collect()
    }
    assert win[("i1",)][0] == "a"
    obj, conf = win[("i2",)]
    assert obj == "x"
    assert conf == pytest.approx(
        round((7 / 12) / (7 / 12 + 5 / 12), 6), abs=1e-9
    )


def test_exact_tie_breaks_lexically(spark):
    claims = spark.createDataFrame(
        [
            ("s1", "i1", "p", "b"),
            ("s2", "i1", "p", "a"),
        ],
        CLAIM_SCHEMA,
    )
    win = truth_discovery(claims, n_iter=2).collect()
    assert [(r.subj, r.obj, r.conf_r) for r in win] == [("i1", "a", 0.5)]


def test_duplicate_claims_count_once(spark):
    # s1 repeats its claim 3x; s2+s3 agree on the other value -> b wins
    claims = spark.createDataFrame(
        [
            ("s1", "i1", "p", "a"),
            ("s1", "i1", "p", "a"),
            ("s1", "i1", "p", "a"),
            ("s2", "i1", "p", "b"),
            ("s3", "i1", "p", "b"),
        ],
        CLAIM_SCHEMA,
    )
    win = truth_discovery(claims, n_iter=1).collect()
    assert [(r.obj, r.conf_r) for r in win] == [
        ("b", round(2 / 3, 6))
    ]


def test_confidences_sum_to_one_per_item(spark):
    claims = spark.createDataFrame(
        [
            ("s%d" % (i % 5), "i%d" % (i % 3), "p", "v%d" % (i % 4))
            for i in range(30)
        ],
        CLAIM_SCHEMA,
    )
    rows = claim_confidence(claims, n_iter=3).collect()
    per_item = {}
    for r in rows:
        per_item.setdefault((r.subj, r.pred), 0.0)
        per_item[(r.subj, r.pred)] += r.conf
    for total in per_item.values():
        assert math.isclose(total, 1.0, rel_tol=1e-9)


def test_predicate_alignment_overlap_and_jaccard(spark):
    from ahrd_spark.operators.truth import predicate_alignment

    schema = "subj STRING, pred STRING, obj STRING"
    kg_a = spark.createDataFrame(
        [
            ("e1", "encodes", "x"),
            ("e2", "encodes", "y"),
            ("e3", "encodes", "z"),
            ("e1", "located_in", "m"),
            ("e1", "encodes", "x"),  # dup assertion: extension still 3
        ],
        schema,
    )
    kg_b = spark.createDataFrame(
        [
            ("e1", "codes_for", "x"),
            ("e2", "codes_for", "y"),
            ("e9", "codes_for", "q"),
            ("e8", "unrelated", "r"),
        ],
        schema,
    )
    rows = predicate_alignment(kg_a, kg_b).collect()
    got = {
        (r.pred_a, r.pred_b): (r.n_shared, r.n_a, r.n_b, r.jaccard_r)
        for r in rows
    }
    # encodes(3) vs codes_for(3): share {e1-x, e2-y} -> J = 2/(3+3-2)
    assert got == {("encodes", "codes_for"): (2, 3, 3, 0.5)}


def test_predicate_alignment_min_shared_filters(spark):
    from ahrd_spark.operators.truth import predicate_alignment

    schema = "subj STRING, pred STRING, obj STRING"
    kg_a = spark.createDataFrame([("e1", "p", "x")], schema)
    kg_b = spark.createDataFrame([("e1", "q", "x")], schema)
    assert predicate_alignment(kg_a, kg_b, min_shared=2).count() == 0
    assert predicate_alignment(kg_a, kg_b, min_shared=1).count() == 1
