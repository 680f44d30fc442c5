"""PageRank (operators/graph.py) — hand-computed goldens.

The two-node chain golden is worked by hand in the assertions: N=2,
d=0.85, A->B with B dangling.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ahrd_spark.operators.graph import pagerank


def _ranks(df):
    return {r.node: r.rank for r in df.collect()}


def test_pagerank_two_node_cycle(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src STRING, dst STRING"
    )
    r = _ranks(pagerank(edges, iters=4))
    assert r["a"] == pytest.approx(0.5)
    assert r["b"] == pytest.approx(0.5)
    assert sum(r.values()) == pytest.approx(1.0)


def test_pagerank_dangling_golden(spark):
    # A -> B, B dangling.  iter1: dm=0.5, in(B)=0.5
    #   rank_A = 0.075 + 0.85*(0.25)        = 0.2875
    #   rank_B = 0.075 + 0.85*(0.5 + 0.25)  = 0.7125
    # iter2: dm=0.7125, in(B)=0.2875
    #   rank_A = 0.075 + 0.85*(0.35625)           = 0.3778125
    #   rank_B = 0.075 + 0.85*(0.2875 + 0.35625)  = 0.6221875
    edges = spark.createDataFrame([("a", "b")], "src STRING, dst STRING")
    r1 = _ranks(pagerank(edges, iters=1))
    assert r1["a"] == pytest.approx(0.2875)
    assert r1["b"] == pytest.approx(0.7125)
    r2 = _ranks(pagerank(edges, iters=2))
    assert r2["a"] == pytest.approx(0.3778125)
    assert r2["b"] == pytest.approx(0.6221875)
    assert sum(r2.values()) == pytest.approx(1.0)


def test_pagerank_mass_conserved_and_multiedge_collapse(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
         ("d", "a")],
        "src STRING, dst STRING",
    )
    r = _ranks(pagerank(edges, iters=5))
    assert sum(r.values()) == pytest.approx(1.0)
    # duplicate (a,b) collapses: a splits evenly between b and c
    single = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a")],
        "src STRING, dst STRING",
    )
    assert r == pytest.approx(_ranks(pagerank(single, iters=5)))


def test_pagerank_reliable_checkpoint_dir(spark, tmp_path):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c")], "src STRING, dst STRING"
    )
    out = pagerank(edges, iters=2, checkpoint_dir=str(tmp_path / "ck"))
    assert out.count() == 3
    assert any((tmp_path / "ck").rglob("*"))


def test_pagerank_validates_iters(spark):
    edges = spark.createDataFrame([("a", "b")], "src STRING, dst STRING")
    with pytest.raises(ValueError):
        pagerank(edges, iters=0)
