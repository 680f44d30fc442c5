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


# ------------------------------------------------------------- KG maintenance
def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj STRING, pred STRING, obj STRING, score DOUBLE, "
              "snapshot BIGINT"
    )


def test_predicate_stats_and_entity_degree(spark):
    from ahrd_spark.operators.graph import entity_degree, predicate_stats

    t = _triples(spark, [
        ("p1", "hasGOTerm", "GO:1", 0.9, 1),
        ("p1", "hasGOTerm", "GO:2", 0.8, 1),
        ("p2", "hasGOTerm", "GO:1", 0.7, 1),
        ("p2", "hasDescription", "kinase", 0.6, 1),
    ])
    ps = {r["pred"]: r.asDict() for r in predicate_stats(t).collect()}
    assert ps["hasGOTerm"] == {
        "pred": "hasGOTerm", "n_triples": 3, "n_subjects": 2, "n_objects": 2,
    }
    assert ps["hasDescription"]["n_triples"] == 1

    deg = {r["entity"]: r.asDict() for r in entity_degree(t).collect()}
    assert deg["p1"]["out_degree"] == 2 and deg["p1"]["in_degree"] == 0
    assert deg["GO:1"]["in_degree"] == 2 and deg["GO:1"]["degree"] == 2
    assert deg["kinase"]["degree"] == 1


def test_merge_triples_upsert_semantics(spark):
    from ahrd_spark.operators.graph import merge_triples

    existing = _triples(spark, [
        ("p1", "hasGOTerm", "GO:1", 0.5, 1),
        ("p1", "hasGOTerm", "GO:1", 0.7, 2),   # same triple, 2 evidences
        ("p2", "hasGOTerm", "GO:2", 0.9, 1),
    ])
    incoming = _triples(spark, [
        ("p1", "hasGOTerm", "GO:1", 0.6, 3),   # strengthens existing
        ("p3", "hasGOTerm", "GO:3", 0.4, 3),   # brand new
    ])
    merged = {
        (r["subj"], r["pred"], r["obj"]): r.asDict()
        for r in merge_triples(existing, incoming).collect()
    }
    m = merged[("p1", "hasGOTerm", "GO:1")]
    assert m["n_evidence"] == 3
    assert m["best_score"] == 0.7
    assert (m["first_snapshot"], m["last_snapshot"]) == (1, 3)
    assert merged[("p3", "hasGOTerm", "GO:3")]["n_evidence"] == 1
    assert len(merged) == 3

    # re-merge: snapshot 3 into the ALREADY-MERGED table — evidence adds
    merged_df = merge_triples(existing, incoming)
    snap3 = _triples(spark, [("p1", "hasGOTerm", "GO:1", 0.95, 4)])
    again = {
        (r["subj"], r["pred"], r["obj"]): r.asDict()
        for r in merge_triples(merged_df, snap3).collect()
    }
    m2 = again[("p1", "hasGOTerm", "GO:1")]
    assert m2["n_evidence"] == 4          # 3 prior + 1 new, NOT reset
    assert m2["best_score"] == 0.95
    assert (m2["first_snapshot"], m2["last_snapshot"]) == (1, 4)
    assert len(again) == 3


def test_new_triples_delta(spark):
    from ahrd_spark.operators.graph import new_triples

    existing = _triples(spark, [("p1", "hasGOTerm", "GO:1", 0.5, 1)])
    incoming = _triples(spark, [
        ("p1", "hasGOTerm", "GO:1", 0.9, 2),   # known -> excluded
        ("p1", "hasGOTerm", "GO:2", 0.9, 2),
        ("p1", "hasGOTerm", "GO:2", 0.8, 2),   # dup in snapshot -> once
    ])
    delta = [tuple(r) for r in new_triples(existing, incoming).collect()]
    assert delta == [("p1", "hasGOTerm", "GO:2")]


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node string")


def test_khop_nodes_bfs_min_hop(spark):
    from ahrd_spark.operators.graph import khop_nodes

    # diamond a->b, a->c, b->d, c->d plus a detached edge e->f
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
                       ("e", "f")])
    got = {r["node"]: r["hop"]
           for r in khop_nodes(e, _seeds(spark, ["a"]), k=2).collect()}
    # d reachable via two length-2 paths -> ONE row at min hop
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}

    # k caps expansion; absent seed still reports hop 0
    got1 = {r["node"]: r["hop"]
            for r in khop_nodes(e, _seeds(spark, ["a", "zz"]), k=1).collect()}
    assert got1 == {"a": 0, "zz": 0, "b": 1, "c": 1}


def test_khop_directed_vs_undirected(spark):
    from ahrd_spark.operators.graph import khop_nodes

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    undirected = {r["node"]: r["hop"]
                  for r in khop_nodes(e, _seeds(spark, ["c"]), k=2).collect()}
    assert undirected == {"c": 0, "b": 1, "d": 1, "a": 2}
    directed = {r["node"]: r["hop"]
                for r in khop_nodes(e, _seeds(spark, ["c"]), k=2,
                                    directed=True).collect()}
    assert directed == {"c": 0, "d": 1}


def test_khop_edges_induced_subgraph(spark):
    from ahrd_spark.operators.graph import khop_edges

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")])
    got = {(r["src"], r["dst"]): (r["src_hop"], r["dst_hop"])
           for r in khop_edges(e, _seeds(spark, ["a"]), k=2).collect()}
    # c is hop 2 but d is hop 3 -> edge (c,d) excluded; (x,y) unreachable
    assert got == {("a", "b"): (0, 1), ("b", "c"): (1, 2)}


def test_khop_early_exit_beyond_diameter(spark):
    from ahrd_spark.operators.graph import khop_nodes

    e = _edges(spark, [("a", "b"), ("b", "c")])
    got = {r["node"]: r["hop"]
           for r in khop_nodes(e, _seeds(spark, ["a"]), k=10).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_triangle_counts_k4_and_star(spark):
    from ahrd_spark.operators.graph import triangle_counts

    # K4: every node sits in C(3,2) = 3 triangles; a 5-leaf star hanging
    # off node 1 adds zero (stars are the hub case the orientation must
    # not explode on); duplicate + reversed + self-loop edges collapse
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    star = [(1, s) for s in range(100, 105)]
    noise = [(2, 1), (3, 3), (1, 2)]
    edges = spark.createDataFrame(k4 + star + noise, "src int, dst int")
    got = {r["node"]: r["triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_two_shared_edge_triangles(spark):
    from ahrd_spark.operators.graph import triangle_counts

    # triangles {1,2,3} and {2,3,4} share edge (2,3)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "src int, dst int"
    )
    got = {r["node"]: r["triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_triangle_counts_triangle_free(spark):
    from ahrd_spark.operators.graph import triangle_counts

    # even cycle (bipartite) -> no triangles -> empty result
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src int, dst int"
    )
    assert triangle_counts(edges).count() == 0


def test_personalized_pagerank_two_node_cycle(spark):
    from ahrd_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src int, dst int")
    seeds = spark.createDataFrame([(1,)], "node int")
    # r0=(1,0); it1: A .15, B .85; it2: A .15+.85*.85=.8725, B .1275
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(edges, seeds, iters=2).collect()
    }
    assert abs(got[1] - 0.8725) < 1e-12
    assert abs(got[2] - 0.1275) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-12


def test_personalized_pagerank_isolated_seed_keeps_mass(spark):
    from ahrd_spark.operators.graph import personalized_pagerank

    # seed 9 touches no edge: all teleport + dangling mass returns to it
    edges = spark.createDataFrame([(1, 2)], "src int, dst int")
    seeds = spark.createDataFrame([(9,)], "node int")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(edges, seeds, iters=3).collect()
    }
    assert got == {1: 0.0, 2: 0.0, 9: 1.0}


def test_personalized_pagerank_mass_conserved_with_dangling(spark):
    from ahrd_spark.operators.graph import personalized_pagerank

    # 3 is dangling; two seeds split the restart vector
    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src int, dst int")
    seeds = spark.createDataFrame([(1,), (2,)], "node int")
    rows = personalized_pagerank(edges, seeds, iters=4).collect()
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-9
    got = {r["node"]: r["rank"] for r in rows}
    # non-seed sink collects flow but leaks back only to seeds
    assert got[3] > 0 and got[1] > got[3] * 0  # sanity: defined everywhere


def test_label_propagation_two_triangles_bridge(spark):
    from ahrd_spark.operators.graph import label_propagation

    # two triangles bridged by (3,4): LPA separates the dense cores that
    # connected components would fuse
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src int, dst int",
    )
    got = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iters=4).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_label_propagation_deterministic_oscillation(spark):
    from ahrd_spark.operators.graph import label_propagation

    # a single edge oscillates under synchronous updates; fixed iters make
    # the output a deterministic function of iteration parity
    edges = spark.createDataFrame([(1, 2)], "src int, dst int")
    even = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iters=4).collect()
    }
    odd = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iters=3).collect()
    }
    assert even == {1: 1, 2: 2}
    assert odd == {1: 2, 2: 1}


def test_shortest_paths_relaxation_golden(spark):
    from ahrd_spark.operators.graph import shortest_paths

    # 1 -> 2 (1.0) -> 3 (1.0); direct 1 -> 3 (5.0); multi-edge 1->2 keeps
    # min(1.0, 7.0); node 4 unreachable
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (1, 2, 7.0), (2, 3, 1.0), (1, 3, 5.0), (4, 1, 0.5)],
        "src int, dst int, weight double",
    )
    seeds = spark.createDataFrame([(1,)], "node int")
    got = {
        r["node"]: r["dist"]
        for r in shortest_paths(edges, seeds, iters=3).collect()
    }
    assert got == {1: 0.0, 2: 1.0, 3: 2.0}


def test_shortest_paths_hop_bound_and_undirected(spark):
    from ahrd_spark.operators.graph import shortest_paths

    # chain 1-2-3-4 with unit weights
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0)], "src int, dst int, weight double"
    )
    seeds = spark.createDataFrame([(4,)], "node int")
    # directed: nothing leaves 4
    d = {r["node"]: r["dist"] for r in shortest_paths(edges, seeds, iters=3).collect()}
    assert d == {4: 0.0}
    # undirected, 2 hops: reach 3 and 2 but not 1
    u = {
        r["node"]: r["dist"]
        for r in shortest_paths(edges, seeds, iters=2, directed=False).collect()
    }
    assert u == {4: 0.0, 3: 1.0, 2: 2.0}


def test_degree_histogram_bit_length_buckets(spark):
    from ahrd_spark.operators.graph import degree_histogram

    # a->b (a: deg1... build degrees 1,2,4: z has 4 edges, y 2, others 1
    triples = spark.createDataFrame(
        [("z", "p", "a"), ("z", "p", "b"), ("z", "p", "c"), ("z", "p", "y"),
         ("y", "p", "a")],
        "subj string, pred string, obj string",
    )
    # degrees: z=4(out), y=2(1in+1out), a=2(in), b=1, c=1
    got = {r["bucket"]: (r["n_nodes"], r["min_degree"], r["max_degree"])
           for r in degree_histogram(triples).collect()}
    assert got == {0: (2, 1, 1), 1: (2, 2, 2), 2: (1, 4, 4)}


def test_neighbor_jaccard_exact_scores(spark):
    from ahrd_spark.operators.graph import neighbor_jaccard

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 2), (4, 3), (4, 5)], "src int, dst int"
    )
    got = {
        (r["a"], r["b"]): (r["shared"], r["deg_a"], r["deg_b"], r["jaccard"])
        for r in neighbor_jaccard(edges, min_shared=2).collect()
    }
    # N(1)={2,3} N(4)={2,3,5} -> shared 2, J=2/4... union=3 -> 2/3
    assert got[(1, 4)] == (2, 2, 3, 2 / 3)
    # N(2)=N(3)={1,4} -> J=1
    assert got[(2, 3)] == (2, 2, 2, 1.0)
    assert set(got) == {(1, 4), (2, 3)}


def test_neighbor_jaccard_hub_blocking_cap(spark):
    from ahrd_spark.operators.graph import neighbor_jaccard

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 2), (4, 3), (4, 5)], "src int, dst int"
    )
    # without cap: (2,5) and (3,5) are generated via middle 4
    all_pairs = {
        (r["a"], r["b"])
        for r in neighbor_jaccard(edges, min_shared=1).collect()
    }
    assert (2, 5) in all_pairs and (3, 5) in all_pairs
    # cap 2 excludes node 4 (deg 3) as a blocking middle: pairs whose only
    # shared neighbor is the hub disappear; others survive with EXACT
    # scores (hub still counted in the verify step)
    capped = {
        (r["a"], r["b"]): r["shared"]
        for r in neighbor_jaccard(edges, min_shared=1, max_block_degree=2).collect()
    }
    assert (2, 5) not in capped and (3, 5) not in capped
    assert capped[(1, 4)] == 2 and capped[(2, 3)] == 2


def test_kg_negative_samples_protocol(spark):
    from ahrd_spark.operators.graph import kg_negative_samples

    triples = spark.createDataFrame(
        [("p1", "has", "g1"), ("p1", "has", "g2"), ("p2", "has", "g1"),
         ("p3", "has", "g3")],
        "subj string, pred string, obj string",
    )
    a = kg_negative_samples(triples, buckets=4).collect()
    b = kg_negative_samples(triples, buckets=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    true_set = {("p1", "has", "g1"), ("p1", "has", "g2"), ("p2", "has", "g1"),
                ("p3", "has", "g3")}
    ents = {"p1", "p2", "p3", "g1", "g2", "g3"}
    for r in a:
        # corrupted tail is a real entity, differs from the positive, and
        # never recreates a true edge
        assert r["obj_neg"] in ents
        assert r["obj_neg"] != r["obj_pos"]
        assert (r["subj"], r["pred"], r["obj_neg"]) not in true_set
    # a different salt draws a different (still valid) set
    c = kg_negative_samples(triples, buckets=4, salt="x").collect()
    assert sorted(map(tuple, c)) != sorted(map(tuple, a)) or len(c) != len(a)


def test_kg_negative_samples_validates_buckets(spark):
    import pytest as _pytest

    from ahrd_spark.operators.graph import kg_negative_samples

    t = spark.createDataFrame([("a", "p", "b")], "subj string, pred string, obj string")
    with _pytest.raises(ValueError):
        kg_negative_samples(t, buckets=0)


def test_new_iterative_ops_reliable_checkpoint_dir(spark, tmp_path):
    from ahrd_spark.operators.graph import (
        label_propagation,
        personalized_pagerank,
        shortest_paths,
    )

    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src int, dst int"
    )
    weighted = edges.withColumn("weight", F.lit(1.0))
    seeds = spark.createDataFrame([(1,)], "node int")

    base = str(tmp_path / "ckpt")
    lpa = {r["node"]: r["community"]
           for r in label_propagation(edges, iters=3,
                                      checkpoint_dir=base + "/lpa").collect()}
    ppr = {r["node"]: r["rank"]
           for r in personalized_pagerank(edges, seeds, iters=2,
                                          checkpoint_dir=base + "/ppr").collect()}
    sp = {r["node"]: r["dist"]
          for r in shortest_paths(weighted, seeds, iters=3,
                                  checkpoint_dir=base + "/sp").collect()}
    # same answers as the localCheckpoint path
    assert lpa == {r["node"]: r["community"]
                   for r in label_propagation(edges, iters=3).collect()}
    assert ppr == {r["node"]: r["rank"]
                   for r in personalized_pagerank(edges, seeds, iters=2).collect()}
    assert sp == {r["node"]: r["dist"]
                  for r in shortest_paths(weighted, seeds, iters=3).collect()}
    # checkpoints actually landed on reliable storage
    import glob as _glob
    assert _glob.glob(base + "/*/*")


def test_kg_negative_samples_no_empty_bucket_drops(spark):
    """With far more buckets than distinct entities, triples must NOT be
    silently dropped by hashing into entity-empty buckets (the dense
    bucket-index regression): only the documented filtered-protocol
    removals (obj_neg == obj, accidental positives) may reduce the count."""
    from ahrd_spark.operators.graph import kg_negative_samples

    rows = [(f"s{i}", f"p{i}", f"o{i}") for i in range(200)]
    triples = spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )
    out = kg_negative_samples(triples, buckets=1024).collect()
    # unique predicates -> accidental positives impossible; the only legal
    # drop is the rare self-pick (obj_neg == obj), ~1/400 per triple
    assert len(out) >= 190
    subjects = {r["subj"] for r in out}
    assert len(subjects) >= 190


def test_canonicalize_triples_rewrites_both_ends(spark):
    from ahrd_spark.operators.graph import canonicalize_triples

    triples = spark.createDataFrame(
        [
            ("a2", "knows", "b1"),
            ("a1", "knows", "b2"),   # alias duplicate after rewrite
            ("c1", "knows", "a3"),   # object-side rewrite
            ("z1", "knows", "z2"),   # untouched: no synonym edges
        ],
        "subj STRING, pred STRING, obj STRING",
    )
    edges = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a3"), ("b1", "b2")], "u STRING, v STRING"
    )
    got = {
        (r.subj, r.pred, r.obj)
        for r in canonicalize_triples(triples, edges).collect()
    }
    # a-chain -> a1, b-pair -> b1: the two 'knows' rows collapse into one
    assert got == {
        ("a1", "knows", "b1"),
        ("c1", "knows", "a1"),
        ("z1", "knows", "z2"),
    }


def test_canonicalize_triples_noop_without_matching_edges(spark):
    from ahrd_spark.operators.graph import canonicalize_triples

    triples = spark.createDataFrame(
        [("x", "p", "y"), ("y", "p", "z")],
        "subj STRING, pred STRING, obj STRING",
    )
    edges = spark.createDataFrame(
        [("q1", "q2")], "u STRING, v STRING"
    )
    got = {
        (r.subj, r.pred, r.obj)
        for r in canonicalize_triples(triples, edges).collect()
    }
    assert got == {("x", "p", "y"), ("y", "p", "z")}


def test_snapshot_at_replays_log(spark):
    from ahrd_spark.operators.graph import snapshot_at

    log = spark.createDataFrame(
        [
            (1, "add", "a", "p", "x"),   # later deleted
            (5, "del", "a", "p", "x"),
            (2, "add", "b", "p", "y"),   # survives
            (3, "del", "c", "p", "z"),   # deleted then re-added
            (4, "add", "c", "p", "z"),
            (90, "add", "d", "p", "w"),  # after the cutoff: invisible
            (6, "add", "e", "p", "v"),   # same-ts conflict: del wins
            (6, "del", "e", "p", "v"),
        ],
        "ts BIGINT, op STRING, subj STRING, pred STRING, obj STRING",
    )
    got = {
        (r.subj, r.obj) for r in snapshot_at(log, at=70).collect()
    }
    assert got == {("b", "y"), ("c", "z")}


def test_triple_provenance_bounded_sample(spark):
    from ahrd_spark.operators.graph import triple_provenance

    assertions = spark.createDataFrame(
        [
            ("a", "p", "x", 7, "s1", 2),
            ("a", "p", "x", 3, "s2", 1),
            ("a", "p", "x", 9, "s1", 3),
            ("a", "p", "x", 1, "s1", 1),
            ("a", "p", "x", 1, "s1", 1),  # duplicate assertion
            ("b", "p", "y", 4, "s3", 2),
        ],
        "subj STRING, pred STRING, obj STRING, doc_id BIGINT,"
        " source STRING, snapshot BIGINT",
    )
    got = {
        r.subj: (
            r.n_docs,
            r.n_sources,
            r.first_snapshot,
            r.last_snapshot,
            r.sample_docs,
        )
        for r in triple_provenance(assertions, sample_k=2).collect()
    }
    # sample = the 2 SMALLEST distinct doc ids, dup rows counted once
    assert got == {
        "a": (4, 2, 1, 3, "1|3"),
        "b": (1, 1, 2, 2, "4"),
    }


def test_random_walks_matches_hashlib_replay(spark):
    import hashlib

    from ahrd_spark.operators.graph import random_walks

    edges = [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"), ("C", "D")]
    df = spark.createDataFrame(edges, "src STRING, dst STRING")
    got = {
        (r.start, r.walk_ix): r.path
        for r in random_walks(
            df, walk_len=3, walks_per_node=2, seed="t"
        ).collect()
    }

    nbrs = {}
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
    nbrs = {k: sorted(v) for k, v in nbrs.items()}

    def step(u, v, t, w):
        ns = nbrs.get(u)
        if not ns:
            return None
        h = int(
            hashlib.md5(f"{u}|{v}|{t}|{w}|t".encode()).hexdigest()[:15],
            16,
        )
        return ns[h % len(ns)]

    for start in ["A", "B", "C", "D"]:
        for w in range(2):
            path = [start]
            cur = start
            for t in range(1, 4):
                cur = step(cur, start, t, w)
                if cur is None:
                    break
                path.append(cur)
            assert got[(start, w)] == path, (start, w)
    # D is a dead end: its walks never leave
    assert got[("D", 0)] == ["D"] and got[("D", 1)] == ["D"]


def test_random_walks_max_degree_cap(spark):
    from ahrd_spark.operators.graph import random_walks

    # hub H has 4 neighbors; cap 2 keeps only the first two sorted
    edges = [("H", "n4"), ("H", "n1"), ("H", "n3"), ("H", "n2")]
    df = spark.createDataFrame(edges, "src STRING, dst STRING")
    rows = random_walks(
        df, walk_len=1, walks_per_node=8, max_degree=2, seed="c"
    ).collect()
    visited = {r.path[1] for r in rows if r.start == "H" and len(r.path) > 1}
    assert visited <= {"n1", "n2"}


def test_random_walks_deterministic_across_runs(spark):
    from ahrd_spark.operators.graph import random_walks

    edges = [("A", "B"), ("B", "A"), ("B", "C"), ("C", "B")]
    df = spark.createDataFrame(edges, "src STRING, dst STRING")
    a = sorted(
        (r.start, r.walk_ix, tuple(r.path))
        for r in random_walks(df, walk_len=5, walks_per_node=3).collect()
    )
    b = sorted(
        (r.start, r.walk_ix, tuple(r.path))
        for r in random_walks(
            df.repartition(7), walk_len=5, walks_per_node=3
        ).collect()
    )
    assert a == b


def test_random_walks_same_step_same_node_decorrelated(spark):
    """Walks with the SAME walk index meeting at the same node at the
    same step must not coalesce: the hop hash includes the walk's start
    (regression for the corpus-correlation bias — every same-index walk
    leaving hub H at step 2 would otherwise take the same edge)."""
    from ahrd_spark.operators.graph import random_walks

    feeders = [(f"S{i}", "H") for i in range(8)]
    fan = [("H", f"n{j}") for j in range(16)]
    df = spark.createDataFrame(
        feeders + fan, "src STRING, dst STRING"
    )
    rows = random_walks(df, walk_len=2, walks_per_node=1, seed="d")
    picks = {
        r.start: r.path[2]
        for r in rows.collect()
        if r.start.startswith("S") and len(r.path) == 3
    }
    # all 8 feeder walks sit at H at step 2; with 16 fan-out edges and
    # start-salted hashes they must not all agree on one neighbor
    assert len(picks) == 8
    assert len(set(picks.values())) > 1


def test_skipgram_pairs_window_counting(spark):
    from ahrd_spark.operators.graph import skipgram_pairs

    walks = spark.createDataFrame(
        [(["a", "b", "c", "d"],)], "path ARRAY<STRING>"
    )
    got = {
        (r.center, r.context): r.n
        for r in skipgram_pairs(walks, window=2).collect()
    }
    # brute-force expectation
    path = ["a", "b", "c", "d"]
    want = {}
    for i, c in enumerate(path):
        for j in range(max(0, i - 2), min(len(path), i + 3)):
            if j != i:
                want[(c, path[j])] = want.get((c, path[j]), 0) + 1
    assert got == want
    # directional double-count sanity: (b,a) and (a,b) both present
    assert got[("a", "b")] == 1 and got[("b", "a")] == 1


def test_skipgram_pairs_aggregates_across_walks(spark):
    from ahrd_spark.operators.graph import skipgram_pairs

    walks = spark.createDataFrame(
        [(["x", "y"],), (["x", "y"],), (["y", "x"],)],
        "path ARRAY<STRING>",
    )
    got = {
        (r.center, r.context): r.n
        for r in skipgram_pairs(walks, window=1).collect()
    }
    assert got == {("x", "y"): 3, ("y", "x"): 3}


def test_contract_graph_weights_and_self_loops(spark):
    from ahrd_spark.operators.graph import contract_graph

    edges = spark.createDataFrame(
        [
            ("a1", "b1"),
            ("a2", "b2"),
            ("a1", "a2"),   # intra-group
            ("b1", "a1"),
            ("a1", "b1"),   # duplicate edge: deduped
        ],
        "src STRING, dst STRING",
    )
    mapping = spark.createDataFrame(
        [("a1", "A"), ("a2", "A"), ("b1", "B"), ("b2", "B")],
        "node STRING, group STRING",
    )
    got = {
        (r.src_group, r.dst_group): r.weight
        for r in contract_graph(edges, mapping).collect()
    }
    assert got == {("A", "B"): 2, ("B", "A"): 1}
    with_self = {
        (r.src_group, r.dst_group): r.weight
        for r in contract_graph(edges, mapping, keep_self=True).collect()
    }
    assert with_self[("A", "A")] == 1


def test_weighted_random_walks_matches_hashlib_replay(spark):
    import hashlib

    from ahrd_spark.operators.graph import weighted_random_walks

    edges = [
        ("A", "B", 3), ("A", "C", 1), ("A", "B", 2),  # A: B w5, C w1
        ("B", "A", 1), ("B", "C", 1),
        ("C", "A", 7),
    ]
    df = spark.createDataFrame(edges, "src STRING, dst STRING, weight INT")
    got = {
        (r.start, r.walk_ix): r.path
        for r in weighted_random_walks(
            df, walk_len=3, walks_per_node=2, seed="v"
        ).collect()
    }

    adj = {}
    for s, d, w in edges:
        adj.setdefault(s, {})
        adj[s][d] = adj[s].get(d, 0) + w

    def step(u, v, t, w_ix):
        ns = adj.get(u)
        if not ns:
            return None
        items = sorted(ns.items())
        total = sum(w for _d, w in items)
        target = (
            int(
                hashlib.md5(
                    f"{u}|{v}|{t}|{w_ix}|v".encode()
                ).hexdigest()[:15],
                16,
            )
            % total
        )
        cum = 0
        for d, w in items:
            cum += w
            if target < cum:
                return d
        raise AssertionError("unreachable")

    for start in "ABC":
        for w_ix in range(2):
            path, cur = [start], start
            for t in range(1, 4):
                cur = step(cur, start, t, w_ix)
                if cur is None:
                    break
                path.append(cur)
            assert got[(start, w_ix)] == path, (start, w_ix)


def test_weighted_random_walks_heavy_edge_dominates(spark):
    from ahrd_spark.operators.graph import weighted_random_walks

    # H -> big carries 10^6x the weight of H -> rare: across 32 walks
    # the rare edge should essentially never be drawn
    edges = [("H", "big", 1_000_000), ("H", "rare", 1)]
    df = spark.createDataFrame(edges, "src STRING, dst STRING, weight INT")
    rows = weighted_random_walks(df, walk_len=1, walks_per_node=32).collect()
    hops = [r.path[1] for r in rows if r.start == "H" and len(r.path) > 1]
    assert len(hops) == 32
    assert hops.count("big") >= 31


def test_weighted_random_walks_drops_nonpositive_weights(spark):
    from ahrd_spark.operators.graph import weighted_random_walks

    edges = [("A", "B", 0), ("A", "C", -5), ("B", "A", 2)]
    df = spark.createDataFrame(edges, "src STRING, dst STRING, weight INT")
    got = {
        (r.start, r.walk_ix): r.path
        for r in weighted_random_walks(df, walk_len=2).collect()
    }
    # A has no positive out-edges -> dead end; B walks to A then stops
    assert got[("A", 0)] == ["A"]
    assert got[("B", 0)] == ["B", "A"]


def test_weighted_random_walks_deterministic_across_layouts(spark):
    from ahrd_spark.operators.graph import weighted_random_walks

    edges = [("A", "B", 2), ("A", "C", 3), ("B", "A", 1), ("C", "B", 4)]
    df = spark.createDataFrame(edges, "src STRING, dst STRING, weight INT")
    a = sorted(
        (r.start, r.walk_ix, tuple(r.path))
        for r in weighted_random_walks(
            df, walk_len=5, walks_per_node=3
        ).collect()
    )
    b = sorted(
        (r.start, r.walk_ix, tuple(r.path))
        for r in weighted_random_walks(
            df.repartition(7), walk_len=5, walks_per_node=3
        ).collect()
    )
    assert a == b
