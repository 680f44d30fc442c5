"""GO information content + Resnik BMA similarity (operators/semsim.py).

Hand-computed goldens on a diamond DAG (multiple parents — exercises the
DAG path the driver's binary-tree fixture cannot)."""

import math

import pytest

from ahrd_spark.operators.semsim import (
    resnik_similarity,
    term_information_content,
)


@pytest.fixture()
def diamond(spark):
    #        a
    #       / \
    #      b   c     d has TWO parents (b, c); e under b only
    #       \ / \
    #        d   |
    #        e---+   (e -> b)
    dag = spark.createDataFrame(
        [("b", "a"), ("c", "a"), ("d", "b"), ("d", "c"), ("e", "b")],
        "child string, parent string",
    )
    ann = spark.createDataFrame(
        [("P1", "d"), ("P2", "e"), ("P3", "c")],
        "protein_acc string, go_term string",
    )
    return dag, ann


def test_ic_diamond_goldens(diamond):
    dag, ann = diamond
    got = {
        r["go_term"]: (r["n_prot"], r["ic"])
        for r in term_information_content(ann, dag).collect()
    }
    # true-path: P1 -> {d,b,c,a}; P2 -> {e,b,a}; P3 -> {c,a}; N = 3
    assert got["a"] == (3, 0.0)
    assert math.copysign(1.0, got["a"][1]) == 1.0  # +0.0, not -0.0
    assert got["b"][0] == 2 and abs(got["b"][1] - math.log(1.5)) < 1e-12
    assert got["c"][0] == 2 and abs(got["c"][1] - math.log(1.5)) < 1e-12
    assert got["d"][0] == 1 and abs(got["d"][1] - math.log(3.0)) < 1e-12
    assert got["e"][0] == 1 and abs(got["e"][1] - math.log(3.0)) < 1e-12


def test_resnik_bma_diamond_goldens(spark, diamond):
    dag, ann = diamond
    pairs = spark.createDataFrame(
        [("P1", "P2"), ("P1", "P3"), ("P2", "P3")], "p1 string, p2 string"
    )
    got = {
        (r["p1"], r["p2"]): r["sim"]
        for r in resnik_similarity(ann, dag, pairs).collect()
    }
    # sim(d,e): anc*(d)={d,b,c,a}, anc*(e)={e,b,a} -> common {b,a},
    # max ic = ic(b) = ln 1.5.  sim(d,c): common {c,a} -> ic(c) = ln 1.5.
    # sim(e,c): common {a} -> 0.
    assert abs(got[("P1", "P2")] - math.log(1.5)) < 1e-12
    assert abs(got[("P1", "P3")] - math.log(1.5)) < 1e-12
    assert got[("P2", "P3")] == 0.0


def test_resnik_multi_term_bma(spark, diamond):
    dag, _ = diamond
    # P4 has {d, e}; P5 has {c}: best-match rows are
    # s45 per-t1: d->ln1.5, e->0  -> avg 0.5*ln1.5
    # s54 per-t2: c->max(ln1.5, 0) = ln1.5
    # BMA = (0.5*ln1.5 + ln1.5)/2 = 0.75*ln1.5
    ann = spark.createDataFrame(
        [("P4", "d"), ("P4", "e"), ("P5", "c")],
        "protein_acc string, go_term string",
    )
    pairs = spark.createDataFrame([("P4", "P5")], "p1 string, p2 string")
    [row] = resnik_similarity(ann, dag, pairs).collect()
    # with only P4/P5 annotated, N=2: ic(b)=ln(2/2)=0... recompute:
    # true-path: P4 -> {d,e,b,c,a}; P5 -> {c,a}
    # counts: a:2, b:1, c:2, d:1, e:1 -> ic(b)=ln2, ic(c)=0, ic(d)=ic(e)=ln2
    # sim(d,c): common {c,a} -> max(0,0)=0; sim(e,c): common {a} -> 0
    # => BMA 0
    assert row["sim"] == 0.0


def test_resnik_unannotated_pair_dropped(spark, diamond):
    dag, ann = diamond
    pairs = spark.createDataFrame(
        [("P1", "PX"), ("P1", "P2")], "p1 string, p2 string"
    )
    rows = resnik_similarity(ann, dag, pairs).collect()
    assert {(r["p1"], r["p2"]) for r in rows} == {("P1", "P2")}
