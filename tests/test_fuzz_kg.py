"""Property-based checks for the schema-level KG operators: random
claim/triple sets vs straightforward Python references.  These cover the
combinatorial cases (fan-out products, alias chains crossing rewrites,
log interleavings) the hand-worked goldens can't enumerate."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

SUBJ = st.integers(0, 5)
PRED = st.sampled_from(["a", "b", "c"])
OBJ = st.integers(0, 4)


@settings(**_SETTINGS)
@given(
    triples=st.lists(
        st.tuples(SUBJ, PRED, OBJ), min_size=1, max_size=40
    ),
    req_obj=OBJ,
)
def test_bgp_match_equals_naive(_spark, triples, req_obj):
    from ahrd_spark.operators.kgschema import bgp_match

    rows = [("s%d" % s, p, "o%d" % o) for s, p, o in triples]
    df = _spark.createDataFrame(
        rows, "subj STRING, pred STRING, obj STRING"
    )
    required = [("a", "o%d" % req_obj)]
    got = sorted(
        (r.subj, r.val_b)
        for r in bgp_match(df, required=required, bindings=["b"]).collect()
    )
    t = set(rows)
    sat = {s for (s, p, o) in t if p == "a" and o == "o%d" % req_obj}
    naive = sorted(
        (s, o) for (s, p, o) in t if p == "b" and s in sat
    )
    assert got == naive


@settings(**_SETTINGS)
@given(
    triples=st.lists(
        st.tuples(SUBJ, PRED, OBJ), min_size=1, max_size=40
    )
)
def test_characteristic_sets_partition_subjects(_spark, triples):
    from ahrd_spark.operators.kgschema import characteristic_sets

    rows = [("s%d" % s, p, "o%d" % o) for s, p, o in triples]
    df = _spark.createDataFrame(
        rows, "subj STRING, pred STRING, obj STRING"
    )
    out = characteristic_sets(df).collect()
    # every subject lands in exactly one set: counts partition the subjects
    assert sum(r.n_subjects for r in out) == len({s for s, _, _ in rows})
    assert sum(r.n_triples for r in out) == len(rows)
    by_subj = {}
    for s, p, _ in rows:
        by_subj.setdefault(s, set()).add(p)
    expect = {}
    for s, preds in by_subj.items():
        cs = "|".join(sorted(preds))
        expect[cs] = expect.get(cs, 0) + 1
    assert {r.char_set: r.n_subjects for r in out} == expect


@settings(**_SETTINGS)
@given(
    triples=st.lists(
        st.tuples(SUBJ, PRED, OBJ), min_size=1, max_size=40
    ),
    k=st.integers(1, 4),
)
def test_entity_summary_topk_matches_naive(_spark, triples, k):
    from ahrd_spark.operators.kgschema import entity_summary

    rows = sorted({("s%d" % s, p, "o%d" % o) for s, p, o in triples})
    df = _spark.createDataFrame(
        rows, "subj STRING, pred STRING, obj STRING"
    )
    out = entity_summary(df, k=k).collect()
    n = len({s for s, _, _ in rows})
    dfreq = {}
    for s, p, o in rows:
        dfreq[(p, o)] = dfreq.get((p, o), 0) + 1
    naive = {}
    for s in {s for s, _, _ in rows}:
        facts = sorted(
            ((dfreq[(p, o)], p, o) for (s2, p, o) in rows if s2 == s),
        )[:k]
        naive[s] = [
            (p, o, round(math.log(n / d), 6), i + 1)
            for i, (d, p, o) in enumerate(facts)
        ]
    got = {}
    for r in sorted(out, key=lambda r: (r.subj, r.rnk)):
        got.setdefault(r.subj, []).append(
            (r.pred, r.obj, r.weight_r, r.rnk)
        )
    assert got == naive


@settings(**_SETTINGS)
@given(
    claims=st.lists(
        st.tuples(st.integers(0, 3), SUBJ, OBJ), min_size=1, max_size=30
    )
)
def test_truth_discovery_one_winner_per_item(_spark, claims):
    from ahrd_spark.operators.truth import truth_discovery

    rows = [
        ("src%d" % c, "s%d" % s, "p", "v%d" % v) for c, s, v in claims
    ]
    df = _spark.createDataFrame(
        rows, "source STRING, subj STRING, pred STRING, obj STRING"
    )
    out = truth_discovery(df, n_iter=2).collect()
    # exactly one resolved row per item, confidence in (0, 1]
    assert len(out) == len({s for _, s, _ in claims})
    for r in out:
        assert 0.0 < r.conf_r <= 1.0
    # an unanimous item always resolves to its unanimous value at conf 1
    by_item = {}
    for _, s, v in claims:
        by_item.setdefault(s, set()).add(v)
    resolved = {r.subj: (r.obj, r.conf_r) for r in out}
    for s, vals in by_item.items():
        if len(vals) == 1:
            v = next(iter(vals))
            assert resolved["s%d" % s] == ("v%d" % v, 1.0)


@settings(**_SETTINGS)
@given(
    triples=st.lists(
        st.tuples(SUBJ, PRED, SUBJ), min_size=1, max_size=30
    ),
    edges=st.lists(st.tuples(SUBJ, SUBJ), min_size=0, max_size=10),
)
def test_canonicalize_triples_equals_naive_union_find(
    _spark, triples, edges
):
    from ahrd_spark.operators.graph import canonicalize_triples

    trows = sorted(
        {("e%d" % s, p, "e%d" % o) for s, p, o in triples}
    )
    erows = [("e%d" % u, "e%d" % v) for u, v in edges if u != v]
    tdf = _spark.createDataFrame(
        trows, "subj STRING, pred STRING, obj STRING"
    )
    if not erows:
        erows = [("zz1", "zz2")]  # CC needs >=1 edge; ids never match
    edf = _spark.createDataFrame(erows, "u STRING, v STRING")

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for u, v in erows:
        union(u, v)
    # path-compress to the true min representative
    reps = {x: find(x) for x in list(parent)}
    naive = sorted(
        {
            (reps.get(s, s), p, reps.get(o, o))
            for s, p, o in trows
        }
    )
    got = sorted(
        (r.subj, r.pred, r.obj)
        for r in canonicalize_triples(tdf, edf).collect()
    )
    assert got == naive


@settings(**_SETTINGS)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 9),           # ts
            st.booleans(),               # is_add
            SUBJ,
            OBJ,
        ),
        min_size=1,
        max_size=30,
    ),
    at=st.integers(0, 9),
)
def test_snapshot_at_equals_naive_replay(_spark, events, at):
    from ahrd_spark.operators.graph import snapshot_at

    rows = [
        (ts, "add" if a else "del", "s%d" % s, "p", "v%d" % v)
        for ts, a, s, v in events
    ]
    df = _spark.createDataFrame(
        rows, "ts BIGINT, op STRING, subj STRING, pred STRING, obj STRING"
    )
    got = sorted(
        (r.subj, r.obj) for r in snapshot_at(df, at=at).collect()
    )
    latest = {}
    for ts, op, s, p, v in rows:
        if ts > at:
            continue
        k = (s, v)
        # delete-wins on equal ts: 'del' > 'add' in the (ts, op) order
        cur = latest.get(k)
        if cur is None or (ts, op) > cur:
            latest[k] = (ts, op)
    naive = sorted(k for k, (_, op) in latest.items() if op == "add")
    assert got == naive


@settings(**_SETTINGS)
@given(
    triples=st.lists(st.tuples(SUBJ, PRED, OBJ), min_size=1, max_size=30),
    subclass=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 4)),
        max_size=6,
    ),
    subprop=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.sampled_from(["a", "b", "c", "rdf:type"]),
        ),
        max_size=4,
    ),
)
def test_rdfs_materialize_equals_naive_fixpoint(
    _spark, triples, subclass, subprop
):
    """rdfs_materialize == a naive semi-naive fixpoint over rules
    rdfs5/7/9/11 run to saturation in Python.  Random subproperty edges
    may target rdf:type itself, exercising the rdfs7->rdfs9 feed; random
    subclass edges may contain cycles, exercising closure termination."""
    from ahrd_spark.operators.kgschema import rdfs_materialize

    rows = [("s%d" % s, p, "C%d" % o) for s, p, o in triples]
    sc = [("C%d" % a, "C%d" % b) for a, b in subclass if a != b]
    sp = [(a, b) for a, b in subprop if a != b]

    # naive fixpoint: closures by repeated squaring, then 7 -> 9
    def close(edges):
        cl = set(edges)
        while True:
            nxt = {(a, d) for (a, b) in cl for (c, d) in cl if b == c}
            if nxt <= cl:
                return cl
            cl |= nxt

    spc, scc = close(sp), close(sc)
    t = set(rows)
    wid = t | {(s, q, o) for (s, p, o) in t for (pp, q) in spc if pp == p}
    inf = wid | {
        (s, p, d)
        for (s, p, o) in wid
        if p == "rdf:type"
        for (c, d) in scc
        if c == o
    }
    expected = {(s, p, o, False) for (s, p, o) in t} | {
        (s, p, o, True) for (s, p, o) in inf - t
    }

    df = _spark.createDataFrame(rows, "subj STRING, pred STRING, obj STRING")
    sc_df = (
        _spark.createDataFrame(sc, "child STRING, parent STRING")
        if sc
        else None
    )
    sp_df = (
        _spark.createDataFrame(sp, "child STRING, parent STRING")
        if sp
        else None
    )
    out = rdfs_materialize(df, sc_df, sp_df)
    got = {(r.subj, r.pred, r.obj, r.inferred) for r in out.collect()}
    assert got == expected


@settings(**_SETTINGS)
@given(
    triples=st.lists(st.tuples(SUBJ, PRED, OBJ), min_size=1, max_size=30),
    subclass=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 4)), max_size=6
    ),
)
def test_rdfs_materialize_idempotent(_spark, triples, subclass):
    """Materializing the materialized graph adds nothing: the rule set is
    a closure operator."""
    from ahrd_spark.operators.kgschema import rdfs_materialize

    rows = [("s%d" % s, p, "C%d" % o) for s, p, o in triples]
    sc = [("C%d" % a, "C%d" % b) for a, b in subclass if a != b]
    if not sc:
        sc = [("C0", "C1")]
    df = _spark.createDataFrame(rows, "subj STRING, pred STRING, obj STRING")
    sc_df = _spark.createDataFrame(sc, "child STRING, parent STRING")
    once = rdfs_materialize(df, sc_df).select("subj", "pred", "obj")
    twice = rdfs_materialize(once, sc_df)
    assert twice.where("inferred").count() == 0


@settings(**_SETTINGS)
@given(
    triples=st.lists(st.tuples(SUBJ, PRED, OBJ), min_size=1, max_size=30),
    reqs=st.lists(
        st.tuples(st.sampled_from(["T0", "T1"]), PRED),
        min_size=1,
        max_size=4,
    ),
    typed=st.lists(
        st.tuples(SUBJ, st.sampled_from(["T0", "T1"])), max_size=8
    ),
)
def test_required_properties_equals_naive(_spark, triples, reqs, typed):
    from ahrd_spark.operators.kgschema import required_properties

    rows = [("s%d" % s, p, "o%d" % o) for s, p, o in triples]
    ty = [("s%d" % s, t) for s, t in typed]
    have = {(s, p) for (s, p, _o) in rows}
    expected = {
        ("missing", p, s, None, 0)
        for (s, t) in set(ty)
        for (rt, p) in set(reqs)
        if rt == t and (s, p) not in have
    }
    df = _spark.createDataFrame(rows, "subj STRING, pred STRING, obj STRING")
    ty_df = _spark.createDataFrame(
        ty, "entity STRING, type STRING"
    ) if ty else _spark.createDataFrame([], "entity STRING, type STRING")
    rq_df = _spark.createDataFrame(reqs, "type STRING, pred STRING")
    out = required_properties(df, ty_df, rq_df)
    got = {(r.kind, r.pred, r.subj, r.obj, r.n) for r in out.collect()}
    assert got == expected


@settings(**_SETTINGS)
@given(
    old=st.lists(st.tuples(SUBJ, PRED, OBJ), min_size=1, max_size=20),
    delta=st.lists(st.tuples(SUBJ, PRED, OBJ), min_size=1, max_size=20),
    subclass=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 4)), max_size=6
    ),
)
def test_rdfs_delta_equals_full_rematerialization(
    _spark, old, delta, subclass
):
    """Incremental maintenance == re-materializing from scratch, on the
    triple SET; and the additions themselves match a naive Python delta
    (rules on delta only, minus the existing graph).  Overlapping
    old/delta strategies exercise the re-assertion-dropping path."""
    from ahrd_spark.operators.kgschema import rdfs_delta, rdfs_materialize

    # 'a' doubles as rdf:type here so the class rules actually fire
    def mk(rows):
        return [
            ("s%d" % s, "rdf:type" if p == "a" else p, "C%d" % o)
            for s, p, o in rows
        ]

    old_r, delta_r = mk(old), mk(delta)
    sc = [("C%d" % a, "C%d" % b) for a, b in subclass if a != b]
    if not sc:
        sc = [("C0", "C1")]

    def close(edges):
        cl = set(edges)
        while True:
            nxt = {(a, d) for (a, b) in cl for (c, d) in cl if b == c}
            if nxt <= cl:
                return cl
            cl |= nxt

    scc = close(sc)

    def materialize(rows):
        t = set(rows)
        return t | {
            (s, p, d)
            for (s, p, o) in t
            if p == "rdf:type"
            for (c, d) in scc
            if c == o
        }

    mat_py = materialize(old_r)
    new_py = materialize(delta_r)
    expected = {
        (s, p, o, (s, p, o) not in set(delta_r))
        for (s, p, o) in new_py - mat_py
    }

    sc_df = _spark.createDataFrame(sc, "child STRING, parent STRING")
    old_df = _spark.createDataFrame(
        old_r, "subj STRING, pred STRING, obj STRING"
    )
    delta_df = _spark.createDataFrame(
        delta_r, "subj STRING, pred STRING, obj STRING"
    )
    mat = rdfs_materialize(old_df, sc_df).select("subj", "pred", "obj")
    out = rdfs_delta(mat, delta_df, sc_df)
    got = {(r.subj, r.pred, r.obj, r.inferred) for r in out.collect()}
    assert got == expected
    # union invariant: incremental == from-scratch on the triple set
    assert {(s, p, o) for (s, p, o, _f) in got} | mat_py == materialize(
        old_r + delta_r
    )


@settings(**_SETTINGS)
@given(
    triples=st.lists(st.tuples(SUBJ, PRED, OBJ), min_size=1, max_size=40),
    cap=st.integers(1, 4),
)
def test_bgp_chain_equals_naive(_spark, triples, cap):
    from ahrd_spark.operators.kgschema import bgp_chain

    rows = [("s%d" % s, p, "s%d" % o) for s, p, o in triples]
    t = set(rows)
    l = {(s, o) for (s, p, o) in t if p == "a"}
    r = {(s, o) for (s, p, o) in t if p == "b"}
    d_in = {}
    d_out = {}
    for (_s, m) in l:
        d_in[m] = d_in.get(m, 0) + 1
    for (m, _o) in r:
        d_out[m] = d_out.get(m, 0) + 1
    ok = {
        m
        for m in set(d_in) & set(d_out)
        if d_in[m] <= cap and d_out[m] <= cap
    }
    naive = {
        (s, m, o) for (s, m) in l if m in ok for (m2, o) in r if m2 == m
    }
    df = _spark.createDataFrame(rows, "subj STRING, pred STRING, obj STRING")
    got = {
        (r_.subj, r_.mid, r_.obj)
        for r_ in bgp_chain(df, "a", "b", hub_cap=cap).collect()
    }
    assert got == naive


@settings(**_SETTINGS)
@given(
    typed=st.lists(
        st.tuples(SUBJ, st.integers(0, 3)), min_size=1, max_size=25
    ),
    dis=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3)), max_size=5
    ),
)
def test_disjoint_violations_equals_naive(_spark, typed, dis):
    from ahrd_spark.operators.kgschema import disjoint_violations

    ty = [("e%d" % e, "T%d" % t) for e, t in typed]
    dj = [("T%d" % a, "T%d" % b) for a, b in dis]
    norm = {(min(a, b), max(a, b)) for a, b in dj if a != b}
    per_ent = {}
    for e, t in set(ty):
        per_ent.setdefault(e, set()).add(t)
    naive = {
        (e, a, b)
        for e, ts in per_ent.items()
        for a in ts
        for b in ts
        if a < b and (a, b) in norm
    }
    ty_df = _spark.createDataFrame(ty, "entity STRING, type STRING")
    dj_df = (
        _spark.createDataFrame(dj, "a STRING, b STRING")
        if dj
        else _spark.createDataFrame([], "a STRING, b STRING")
    )
    out = disjoint_violations(ty_df, dj_df)
    got = {(r.entity, r.type_a, r.type_b) for r in out.collect()}
    assert got == naive


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    old=st.lists(
        st.tuples(
            st.integers(0, 4),
            st.sampled_from(["knows", "parent_of", "child_of", "anc", "sib"]),
            st.integers(0, 4),
        ),
        min_size=1,
        max_size=12,
    ),
    delta=st.lists(
        st.tuples(
            st.integers(0, 4),
            st.sampled_from(["knows", "parent_of", "child_of", "anc", "sib"]),
            st.integers(0, 4),
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_owl_rules_delta_equals_full_difference(_spark, old, delta):
    """Incremental OWL maintenance == re-running owl_property_rules from
    scratch, on the (subj, pred, obj) set, across all three rule kinds
    interacting (symmetric knows, mutually inverse parent/child,
    transitive anc, symmetric-AND-transitive sib) — incl. cycles and
    re-assertions from the overlapping strategies."""
    from ahrd_spark.operators.kgschema import (
        owl_property_rules,
        owl_rules_delta,
    )

    schema = "subj STRING, pred STRING, obj STRING"
    axioms = _spark.createDataFrame(
        [
            ("knows", True, None, False),
            ("parent_of", False, "child_of", False),
            ("sib", True, None, True),
            ("anc", False, None, True),
        ],
        "pred STRING, symmetric BOOLEAN, inverse_of STRING,"
        " transitive BOOLEAN",
    )

    def mk(rows):
        return [("n%d" % s, p, "n%d" % o) for s, p, o in rows]

    old_df = _spark.createDataFrame(mk(old), schema)
    both_df = _spark.createDataFrame(mk(old) + mk(delta), schema)
    delta_df = _spark.createDataFrame(mk(delta), schema)

    full_old = owl_property_rules(old_df, axioms, max_depth=8)
    mat = full_old.select("subj", "pred", "obj")
    old_set = {(r.subj, r.pred, r.obj) for r in mat.collect()}
    full_new = owl_property_rules(both_df, axioms, max_depth=8)
    new_set = {
        (r.subj, r.pred, r.obj) for r in full_new.collect()
    }

    out = owl_rules_delta(mat, axioms, delta_df, max_rounds=8)
    got = {(r.subj, r.pred, r.obj, r.inferred) for r in out.collect()}
    got_set = {(s, p, o) for (s, p, o, _f) in got}

    assert got_set == new_set - old_set
    # flags: False exactly for the delta's own surviving assertions
    delta_set = set(mk(delta))
    for s, p, o, inferred in got:
        assert inferred == ((s, p, o) not in delta_set)
    # union invariant
    assert old_set | got_set == new_set


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    triples=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.sampled_from(["p", "q", "r", "w"]),
            st.integers(0, 3),
        ),
        min_size=1,
        max_size=8,
    ),
    # random axiom table over a 4-predicate vocab: arbitrary symmetric /
    # transitive flags and arbitrary inverse_of targets — including the
    # chained and self-inverse declarations a legal ontology can hold
    flags=st.tuples(
        st.integers(0, 15),               # symmetric bitmask over p,q,r,w
        st.integers(0, 15),               # transitive bitmask
        st.lists(
            st.sampled_from([None, "p", "q", "r", "w"]),
            min_size=4,
            max_size=4,
        ),
    ),
)
def test_owl_rules_equals_naive_fixpoint(_spark, triples, flags):
    """owl_property_rules == a brute-force Python fixpoint that applies
    all three rules (symmetric mirror, inverseOf both ways, transitive
    compose) to saturation — over RANDOM axiom tables including chained
    and mixed inverseOf declarations.  Node vocab <= 4, so depth 8
    covers any transitive chain and the naive fixpoint terminates."""
    from ahrd_spark.operators.kgschema import owl_property_rules

    preds = ["p", "q", "r", "w"]
    sym_mask, trans_mask, inv = flags
    sym = {preds[i] for i in range(4) if sym_mask >> i & 1}
    trans = {preds[i] for i in range(4) if trans_mask >> i & 1}
    inv_map = {
        preds[i]: inv[i]
        for i in range(4)
        if inv[i] is not None and inv[i] != preds[i]
    }
    axioms = _spark.createDataFrame(
        [
            (pr, pr in sym, inv_map.get(pr), pr in trans)
            for pr in preds
        ],
        "pred STRING, symmetric BOOLEAN, inverse_of STRING,"
        " transitive BOOLEAN",
    )
    rows = [("n%d" % s, pr, "n%d" % o) for s, pr, o in triples]
    df = _spark.createDataFrame(
        rows, "subj STRING, pred STRING, obj STRING"
    )

    # brute-force saturation (inverse declarations act both ways, the
    # operator's documented owl:inverseOf contract)
    inv_edges = set()
    for a, b in inv_map.items():
        inv_edges.add((a, b))
        inv_edges.add((b, a))
    closure = set(rows)
    while True:
        new = set()
        for s, pr, o in closure:
            if pr in sym:
                new.add((o, pr, s))
            for a, b in inv_edges:
                if pr == a:
                    new.add((o, b, s))
        for s, pr, o in closure:
            if pr in trans:
                for s2, pr2, o2 in closure:
                    if pr2 == pr and s2 == o:
                        new.add((s, pr, o2))
        if new <= closure:
            break
        closure |= new

    got = {
        (r.subj, r.pred, r.obj)
        for r in owl_property_rules(df, axioms, max_depth=8).collect()
    }
    assert got == closure
