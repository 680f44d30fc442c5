"""Hand-worked goldens for the schema-level KG operators
(operators/kgschema.py): RDFS type entailment, SHACL-style validation,
bounded metapath counts.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ahrd_spark.operators.kgschema import (  # noqa: E402
    bgp_minus,
    bgp_optional,
    infer_types,
    metapath_counts,
    owl_property_rules,
    owl_rules_delta,
    property_path,
    reach_delta,
    validate_triples,
)

TRIPLE_SCHEMA = "subj STRING, pred STRING, obj STRING"


def test_infer_types_domain_and_range(spark):
    triples = spark.createDataFrame(
        [
            ("p1", "hasGOTerm", "GO:1"),
            ("p1", "hasGOTerm", "GO:2"),
            ("p2", "hasDescription", "kinase"),
            ("p2", "unknownPred", "x"),  # not in schema -> no entailment
        ],
        TRIPLE_SCHEMA,
    )
    schema = spark.createDataFrame(
        [
            ("hasGOTerm", "Protein", "GOTerm"),
            ("hasDescription", "Protein", None),  # literal range
        ],
        "pred STRING, domain_type STRING, range_type STRING",
    )
    got = {(r.entity, r.type) for r in infer_types(triples, schema).collect()}
    assert got == {
        ("p1", "Protein"),
        ("p2", "Protein"),
        ("GO:1", "GOTerm"),
        ("GO:2", "GOTerm"),
    }


def test_infer_types_deduplicates(spark):
    triples = spark.createDataFrame(
        [("p1", "hasGOTerm", "GO:1")] * 3, TRIPLE_SCHEMA
    )
    schema = spark.createDataFrame(
        [("hasGOTerm", "Protein", "GOTerm")],
        "pred STRING, domain_type STRING, range_type STRING",
    )
    assert infer_types(triples, schema).count() == 2


CONSTRAINTS_SCHEMA = (
    "pred STRING, max_card INT, obj_regex STRING, obj_is_entity_ref BOOLEAN"
)


def test_validate_cardinality(spark):
    triples = spark.createDataFrame(
        [
            ("p1", "hasGOTerm", "GO:1"),
            ("p1", "hasGOTerm", "GO:2"),
            ("p1", "hasGOTerm", "GO:2"),  # dup: distinct objs still 2
            ("p2", "hasGOTerm", "GO:3"),
        ],
        TRIPLE_SCHEMA,
    )
    constraints = spark.createDataFrame(
        [("hasGOTerm", 1, None, False)], CONSTRAINTS_SCHEMA
    )
    rows = validate_triples(triples, constraints).collect()
    assert len(rows) == 1
    v = rows[0]
    assert (v.kind, v.pred, v.subj, v.obj, v.n) == (
        "cardinality", "hasGOTerm", "p1", None, 2,
    )


def test_validate_pattern_full_match(spark):
    triples = spark.createDataFrame(
        [
            ("p1", "hasGOTerm", "GO:123"),       # ok
            ("p1", "hasGOTerm", "GO:123 extra"),  # partial match -> violation
            ("p2", "hasGOTerm", "GOX9"),          # violation
            ("p2", "hasDescription", "free text"),  # unconstrained
        ],
        TRIPLE_SCHEMA,
    )
    constraints = spark.createDataFrame(
        [
            ("hasGOTerm", None, "GO:[0-9]+", False),
            ("hasDescription", None, None, False),
        ],
        CONSTRAINTS_SCHEMA,
    )
    got = {
        (r.subj, r.obj)
        for r in validate_triples(triples, constraints).collect()
    }
    assert got == {("p1", "GO:123 extra"), ("p2", "GOX9")}


def test_validate_dangling(spark):
    triples = spark.createDataFrame(
        [
            ("p1", "derivedFrom", "p2"),   # p2 is a subject -> fine
            ("p1", "derivedFrom", "p99"),  # p99 never a subject -> dangling
            ("p2", "hasDescription", "x"),
        ],
        TRIPLE_SCHEMA,
    )
    constraints = spark.createDataFrame(
        [
            ("derivedFrom", None, None, True),
            ("hasDescription", None, None, False),
        ],
        CONSTRAINTS_SCHEMA,
    )
    rows = validate_triples(triples, constraints).collect()
    assert [(r.kind, r.subj, r.obj) for r in rows] == [
        ("dangling", "p1", "p99")
    ]


def test_metapath_counts_basic(spark):
    # a -p1-> m -p2-> b  and  a -p1-> m -p1-> c: mid m composes both pairs
    triples = spark.createDataFrame(
        [
            ("a", "p1", "m"),
            ("m", "p2", "b"),
            ("m", "p1", "c"),
        ],
        TRIPLE_SCHEMA,
    )
    got = {
        (r.pred1, r.pred2): (r.n_paths, r.n_mids)
        for r in metapath_counts(triples, hub_cap=10).collect()
    }
    assert got == {("p1", "p2"): (1, 1), ("p1", "p1"): (1, 1)}


def test_metapath_hub_cap_excludes_hub(spark):
    # hub h has in-degree 3 (> cap 2): every path through it is dropped;
    # the quiet mid q keeps its single path
    triples = spark.createDataFrame(
        [
            ("a", "p1", "h"),
            ("b", "p1", "h"),
            ("c", "p1", "h"),
            ("h", "p2", "z"),
            ("a", "p1", "q"),
            ("q", "p2", "z"),
        ],
        TRIPLE_SCHEMA,
    )
    got = {
        (r.pred1, r.pred2): (r.n_paths, r.n_mids)
        for r in metapath_counts(triples, hub_cap=2).collect()
    }
    assert got == {("p1", "p2"): (1, 1)}


def test_bgp_match_required_and_binding(spark):
    triples = spark.createDataFrame(
        [
            # p1 satisfies both required constraints, two bindings
            ("p1", "hasGOTerm", "GO:1"),
            ("p1", "hasGOTerm", "GO:4"),
            ("p1", "hasDescription", "kinase"),
            ("p1", "hasDescription", "transferase"),
            # p2 satisfies only one required constraint
            ("p2", "hasGOTerm", "GO:1"),
            ("p2", "hasDescription", "ligase"),
            # p3 satisfies both but has no binding pred -> inner join drops
            ("p3", "hasGOTerm", "GO:1"),
            ("p3", "hasGOTerm", "GO:4"),
        ],
        TRIPLE_SCHEMA,
    )
    from ahrd_spark.operators.kgschema import bgp_match

    got = {
        (r.subj, r.val_hasDescription)
        for r in bgp_match(
            triples,
            required=[("hasGOTerm", "GO:1"), ("hasGOTerm", "GO:4")],
            bindings=["hasDescription"],
        ).collect()
    }
    assert got == {("p1", "kinase"), ("p1", "transferase")}


def test_bgp_match_no_required_two_bindings_fan_out(spark):
    triples = spark.createDataFrame(
        [
            ("p1", "a", "a1"),
            ("p1", "a", "a2"),
            ("p1", "b", "b1"),
            ("p2", "a", "a9"),  # no b binding -> dropped
        ],
        TRIPLE_SCHEMA,
    )
    from ahrd_spark.operators.kgschema import bgp_match

    rows = bgp_match(triples, required=[], bindings=["a", "b"]).collect()
    got = {(r.subj, r.val_a, r.val_b) for r in rows}
    # 2 a-bindings x 1 b-binding = 2 combination rows, SPARQL join semantics
    assert got == {("p1", "a1", "b1"), ("p1", "a2", "b1")}


def test_bgp_match_duplicate_triples_ignored(spark):
    triples = spark.createDataFrame(
        [("p1", "hasGOTerm", "GO:1")] * 3 + [("p1", "hasDescription", "x")],
        TRIPLE_SCHEMA,
    )
    from ahrd_spark.operators.kgschema import bgp_match

    rows = bgp_match(
        triples,
        required=[("hasGOTerm", "GO:1")],
        bindings=["hasDescription"],
    ).collect()
    assert len(rows) == 1  # distinct-first: dup assertions don't fan out


def test_characteristic_sets_groups_and_counts(spark):
    triples = spark.createDataFrame(
        [
            ("s1", "a", "x"),
            ("s1", "b", "y"),
            ("s2", "b", "z"),
            ("s2", "a", "w"),
            ("s2", "a", "v"),  # extra triple, same predicate set as s1
            ("s3", "a", "u"),
        ],
        TRIPLE_SCHEMA,
    )
    from ahrd_spark.operators.kgschema import characteristic_sets

    got = {
        r.char_set: (r.n_preds, r.n_subjects, r.n_triples)
        for r in characteristic_sets(triples).collect()
    }
    assert got == {"a|b": (2, 2, 5), "a": (1, 1, 1)}


def test_entity_summary_rare_facts_rank_first(spark):
    # GO:9 is asserted by all three subjects (df=3, weight ln(1)=0);
    # each description is unique (df=1, weight ln(3))
    triples = spark.createDataFrame(
        [
            ("s1", "hasGOTerm", "GO:9"),
            ("s2", "hasGOTerm", "GO:9"),
            ("s3", "hasGOTerm", "GO:9"),
            ("s1", "hasDescription", "alpha"),
            ("s2", "hasDescription", "beta"),
        ],
        TRIPLE_SCHEMA,
    )
    from ahrd_spark.operators.kgschema import entity_summary

    rows = entity_summary(triples, k=1).collect()
    got = {r.subj: (r.pred, r.obj, r.weight_r, r.rnk) for r in rows}
    import math

    w = round(math.log(3.0), 6)
    assert got == {
        "s1": ("hasDescription", "alpha", w, 1),
        "s2": ("hasDescription", "beta", w, 1),
        "s3": ("hasGOTerm", "GO:9", 0.0, 1),
    }


def test_entity_summary_tie_breaks_on_pred_then_obj(spark):
    triples = spark.createDataFrame(
        [
            ("s1", "b", "x"),
            ("s1", "a", "x"),
            ("s1", "a", "y"),
        ],
        TRIPLE_SCHEMA,
    )
    from ahrd_spark.operators.kgschema import entity_summary

    rows = sorted(
        entity_summary(triples, k=2).collect(), key=lambda r: r.rnk
    )
    # all facts df=1: rank order falls to (pred, obj) lexicographic
    assert [(r.pred, r.obj) for r in rows] == [("a", "x"), ("a", "y")]


def test_rdfs_materialize_subprop_and_subclass(spark):
    """Hand-worked rhoDF fixpoint: isoform_type is a subproperty of
    rdf:type (rdfs7 feeds rdfs9), encodes climbs a 2-deep property chain
    (rdfs5), and C0->C1->C2 carries the type up 2 levels (rdfs11)."""
    from ahrd_spark.operators.kgschema import rdfs_materialize

    triples = spark.createDataFrame(
        [
            ("p1", "rdf:type", "C0"),
            ("p2", "isoform_type", "C1"),
            ("p3", "encodes", "g1"),
        ],
        TRIPLE_SCHEMA,
    )
    subclass = spark.createDataFrame(
        [("C0", "C1"), ("C1", "C2")], "child STRING, parent STRING"
    )
    subprop = spark.createDataFrame(
        [("isoform_type", "rdf:type"), ("encodes", "mentions"),
         ("mentions", "relatedTo")],
        "child STRING, parent STRING",
    )
    out = rdfs_materialize(triples, subclass, subprop)
    got = {(r.subj, r.pred, r.obj, r.inferred) for r in out.collect()}
    assert got == {
        # asserted
        ("p1", "rdf:type", "C0", False),
        ("p2", "isoform_type", "C1", False),
        ("p3", "encodes", "g1", False),
        # rdfs7: property widening (incl. the 2-hop rdfs5 closure)
        ("p2", "rdf:type", "C1", True),
        ("p3", "mentions", "g1", True),
        ("p3", "relatedTo", "g1", True),
        # rdfs9/rdfs11: class climb, incl. the subproperty-fed type row
        ("p1", "rdf:type", "C1", True),
        ("p1", "rdf:type", "C2", True),
        ("p2", "rdf:type", "C2", True),
    }


def test_rdfs_materialize_no_schema_is_identity(spark):
    from ahrd_spark.operators.kgschema import rdfs_materialize

    triples = spark.createDataFrame(
        [("p1", "rdf:type", "C0"), ("p1", "rdf:type", "C0")], TRIPLE_SCHEMA
    )
    out = rdfs_materialize(triples).collect()
    assert [(r.subj, r.pred, r.obj, r.inferred) for r in out] == [
        ("p1", "rdf:type", "C0", False)
    ]


def test_rdfs_materialize_asserted_rows_not_reinferred(spark):
    """A triple that is both asserted and derivable stays inferred=False
    and appears exactly once."""
    from ahrd_spark.operators.kgschema import rdfs_materialize

    triples = spark.createDataFrame(
        [("p1", "rdf:type", "C0"), ("p1", "rdf:type", "C1")], TRIPLE_SCHEMA
    )
    subclass = spark.createDataFrame(
        [("C0", "C1")], "child STRING, parent STRING"
    )
    out = rdfs_materialize(triples, subclass).collect()
    got = {(r.subj, r.pred, r.obj, r.inferred) for r in out}
    assert got == {
        ("p1", "rdf:type", "C0", False),
        ("p1", "rdf:type", "C1", False),
    }
    assert len(out) == 2


def test_required_properties_min_count(spark):
    """p1 satisfies everything; p2 misses hasGOTerm; e1 is also an Enzyme
    and misses catalyzes."""
    from ahrd_spark.operators.kgschema import required_properties

    triples = spark.createDataFrame(
        [
            ("p1", "hasDescription", "kinase"),
            ("p1", "hasGOTerm", "GO:1"),
            ("p2", "hasDescription", "ligase"),
            ("e1", "hasDescription", "enzyme x"),
            ("e1", "hasGOTerm", "GO:2"),
        ],
        TRIPLE_SCHEMA,
    )
    types = spark.createDataFrame(
        [("p1", "Protein"), ("p2", "Protein"), ("e1", "Protein"),
         ("e1", "Enzyme")],
        "entity STRING, type STRING",
    )
    reqs = spark.createDataFrame(
        [("Protein", "hasDescription"), ("Protein", "hasGOTerm"),
         ("Enzyme", "catalyzes")],
        "type STRING, pred STRING",
    )
    out = required_properties(triples, types, reqs)
    got = {(r.kind, r.pred, r.subj, r.obj, r.n) for r in out.collect()}
    assert got == {
        ("missing", "hasGOTerm", "p2", None, 0),
        ("missing", "catalyzes", "e1", None, 0),
    }


def test_required_properties_unions_with_validate_triples(spark):
    """The report shape is union-compatible with validate_triples."""
    from ahrd_spark.operators.kgschema import (
        required_properties,
        validate_triples,
    )

    triples = spark.createDataFrame(
        [("p1", "hasGOTerm", "GOX")], TRIPLE_SCHEMA
    )
    constraints = spark.createDataFrame(
        [("hasGOTerm", None, "GO:[0-9]+", False)], CONSTRAINTS_SCHEMA
    )
    types = spark.createDataFrame(
        [("p1", "Protein")], "entity STRING, type STRING"
    )
    reqs = spark.createDataFrame(
        [("Protein", "hasDescription")], "type STRING, pred STRING"
    )
    v = validate_triples(triples, constraints)
    r = required_properties(triples, types, reqs)
    both = v.unionByName(r)
    kinds = sorted(x.kind for x in both.collect())
    assert kinds == ["missing", "pattern"]


def test_rdfs_delta_drops_known_keeps_new(spark):
    """Existing graph: p1 typed C0 (materialized up to C1).  Delta
    re-asserts (p1, rdf:type, C0) — dropped; asserts (p1, rdf:type, C1)
    which was previously only INFERRED — also dropped (triple set
    unchanged); and asserts (p2, rdf:type, C0) — kept with its
    entailment."""
    from ahrd_spark.operators.kgschema import rdfs_delta, rdfs_materialize

    subclass = spark.createDataFrame(
        [("C0", "C1")], "child STRING, parent STRING"
    )
    old = spark.createDataFrame(
        [("p1", "rdf:type", "C0")], TRIPLE_SCHEMA
    )
    mat = rdfs_materialize(old, subclass).select("subj", "pred", "obj")
    delta = spark.createDataFrame(
        [
            ("p1", "rdf:type", "C0"),
            ("p1", "rdf:type", "C1"),
            ("p2", "rdf:type", "C0"),
        ],
        TRIPLE_SCHEMA,
    )
    out = rdfs_delta(mat, delta, subclass)
    got = {(r.subj, r.pred, r.obj, r.inferred) for r in out.collect()}
    assert got == {
        ("p2", "rdf:type", "C0", False),
        ("p2", "rdf:type", "C1", True),
    }


def test_rdfs_delta_union_equals_full_rematerialization(spark):
    """Triple-set invariant: old materialization + delta additions ==
    materializing (old UNION delta) from scratch."""
    from ahrd_spark.operators.kgschema import rdfs_delta, rdfs_materialize

    subclass = spark.createDataFrame(
        [("C0", "C1"), ("C1", "C2")], "child STRING, parent STRING"
    )
    subprop = spark.createDataFrame(
        [("isoform_type", "rdf:type")], "child STRING, parent STRING"
    )
    old = spark.createDataFrame(
        [("p1", "rdf:type", "C0"), ("p2", "isoform_type", "C1")],
        TRIPLE_SCHEMA,
    )
    delta = spark.createDataFrame(
        [("p2", "rdf:type", "C0"), ("p3", "isoform_type", "C0")],
        TRIPLE_SCHEMA,
    )
    mat = rdfs_materialize(old, subclass, subprop).select(
        "subj", "pred", "obj"
    )
    add = rdfs_delta(mat, delta, subclass, subprop)
    incr = {
        (r.subj, r.pred, r.obj)
        for r in mat.unionByName(
            add.select("subj", "pred", "obj")
        ).collect()
    }
    full = {
        (r.subj, r.pred, r.obj)
        for r in rdfs_materialize(
            old.unionByName(delta), subclass, subprop
        ).collect()
    }
    assert incr == full


def test_bgp_chain_bindings_and_hub_cap(spark):
    """s1-knows->m1-parent_of->{o1,o2} binds two rows; hub mh (3 inbound
    knows, cap 2) is excluded entirely."""
    from ahrd_spark.operators.kgschema import bgp_chain

    triples = spark.createDataFrame(
        [
            ("s1", "knows", "m1"),
            ("m1", "parent_of", "o1"),
            ("m1", "parent_of", "o2"),
            # hub: 3 subjects know mh, mh parents o3 -> capped out
            ("s1", "knows", "mh"),
            ("s2", "knows", "mh"),
            ("s3", "knows", "mh"),
            ("mh", "parent_of", "o3"),
            # wrong-predicate chain never matches
            ("s4", "parent_of", "m1"),
        ],
        TRIPLE_SCHEMA,
    )
    out = bgp_chain(triples, "knows", "parent_of", hub_cap=2)
    got = {(r.subj, r.mid, r.obj) for r in out.collect()}
    assert got == {("s1", "m1", "o1"), ("s1", "m1", "o2")}


def test_bgp_chain_duplicate_triples_ignored(spark):
    from ahrd_spark.operators.kgschema import bgp_chain

    triples = spark.createDataFrame(
        [("s1", "knows", "m1")] * 3 + [("m1", "parent_of", "o1")] * 2,
        TRIPLE_SCHEMA,
    )
    out = bgp_chain(triples, "knows", "parent_of").collect()
    assert [(r.subj, r.mid, r.obj) for r in out] == [("s1", "m1", "o1")]


def test_disjoint_violations_normalizes_and_reports_once(spark):
    """e1 typed Protein+Gene with (Gene, Protein) declared disjoint in
    either order -> ONE row, types sorted; e2 (Protein only) clean."""
    from ahrd_spark.operators.kgschema import disjoint_violations

    types = spark.createDataFrame(
        [("e1", "Protein"), ("e1", "Gene"), ("e2", "Protein"),
         ("e1", "Protein")],
        "entity STRING, type STRING",
    )
    dj = spark.createDataFrame(
        [("Protein", "Gene"), ("Gene", "Protein")], "a STRING, b STRING"
    )
    out = disjoint_violations(types, dj).collect()
    assert [(r.entity, r.type_a, r.type_b) for r in out] == [
        ("e1", "Gene", "Protein")
    ]


def test_disjoint_violations_after_materialization(spark):
    """Entailed types trigger violations: e1 asserts only C0, the
    hierarchy C0->C1 entails C1, and (C1, X) is disjoint with e1's
    other asserted type X."""
    from ahrd_spark.operators.kgschema import (
        disjoint_violations,
        rdfs_materialize,
    )

    triples = spark.createDataFrame(
        [("e1", "rdf:type", "C0"), ("e1", "rdf:type", "X")], TRIPLE_SCHEMA
    )
    subclass = spark.createDataFrame(
        [("C0", "C1")], "child STRING, parent STRING"
    )
    mat = rdfs_materialize(triples, subclass)
    types = mat.where("pred = 'rdf:type'").selectExpr(
        "subj AS entity", "obj AS type"
    )
    dj = spark.createDataFrame([("C1", "X")], "a STRING, b STRING")
    out = disjoint_violations(types, dj).collect()
    assert [(r.entity, r.type_a, r.type_b) for r in out] == [
        ("e1", "C1", "X")
    ]


def test_bgp_optional_binds_and_nulls(spark):
    triples = spark.createDataFrame(
        [
            ("A", "p", "B"),
            ("B", "p", "C"),
            ("C", "p", "D"),
            ("A", "q", "X"),
            ("B", "q", "Y"),
            ("B", "q", "Z"),
            ("Z", "q", "only-optional-no-required"),
        ],
        TRIPLE_SCHEMA,
    )
    got = {
        (r.subj, r.obj, r.opt_obj)
        for r in bgp_optional(triples, "p", "q").collect()
    }
    # C has no q triple -> NULL binding; B has two -> two bindings;
    # Z asserts only the OPTIONAL pattern -> absent entirely
    assert got == {
        ("A", "B", "X"),
        ("B", "C", "Y"),
        ("B", "C", "Z"),
        ("C", "D", None),
    }


def test_bgp_optional_duplicate_triples_ignored(spark):
    triples = spark.createDataFrame(
        [("A", "p", "B")] * 3 + [("A", "q", "X")] * 2, TRIPLE_SCHEMA
    )
    assert bgp_optional(triples, "p", "q").count() == 1


def test_property_path_min_depth_and_bound(spark):
    # diamond: A->B->D and A->C->D plus a shortcut A->D; min depth wins
    triples = spark.createDataFrame(
        [
            ("A", "p", "B"),
            ("A", "p", "C"),
            ("B", "p", "D"),
            ("C", "p", "D"),
            ("A", "p", "D"),
            ("D", "p", "E"),
        ],
        TRIPLE_SCHEMA,
    )
    got = {
        (r.subj, r.obj): r.depth
        for r in property_path(triples, "p", max_depth=2).collect()
    }
    assert got[("A", "D")] == 1  # shortcut beats the 2-hop paths
    assert got[("A", "E")] == 2
    assert got[("B", "E")] == 2
    assert ("A", "E") in got and got[("B", "D")] == 1
    # depth bound respected: nothing deeper than 2 even though A->B->D->E
    assert max(got.values()) == 2


def test_property_path_cycle_terminates(spark):
    triples = spark.createDataFrame(
        [("A", "p", "B"), ("B", "p", "C"), ("C", "p", "A")], TRIPLE_SCHEMA
    )
    rows = property_path(triples, "p", max_depth=10).collect()
    got = {(r.subj, r.obj): r.depth for r in rows}
    # 3-cycle: all 9 ordered pairs reachable, incl. self at depth 3
    assert len(got) == 9
    assert got[("A", "A")] == 3 and got[("A", "B")] == 1
    assert got[("A", "C")] == 2


def test_property_path_other_predicates_ignored(spark):
    triples = spark.createDataFrame(
        [("A", "p", "B"), ("B", "q", "C")], TRIPLE_SCHEMA
    )
    got = {(r.subj, r.obj) for r in property_path(triples, "p").collect()}
    assert got == {("A", "B")}


AXIOM_SCHEMA = (
    "pred STRING, symmetric BOOLEAN, inverse_of STRING, transitive BOOLEAN"
)


def test_owl_rules_symmetric_and_inverse(spark):
    triples = spark.createDataFrame(
        [
            ("M", "married_to", "N"),
            ("P", "parent_of", "K"),
            ("G", "child_of", "H"),  # inverse fires both directions
        ],
        TRIPLE_SCHEMA,
    )
    axioms = spark.createDataFrame(
        [
            ("married_to", True, None, False),
            ("parent_of", False, "child_of", False),
        ],
        AXIOM_SCHEMA,
    )
    rows = owl_property_rules(triples, axioms).collect()
    inferred = {(r.subj, r.pred, r.obj) for r in rows if r.inferred}
    asserted = {(r.subj, r.pred, r.obj) for r in rows if not r.inferred}
    assert asserted == {
        ("M", "married_to", "N"),
        ("P", "parent_of", "K"),
        ("G", "child_of", "H"),
    }
    assert inferred == {
        ("N", "married_to", "M"),
        ("K", "child_of", "P"),
        ("H", "parent_of", "G"),
    }


def test_owl_rules_transitive_closure_bounded(spark):
    triples = spark.createDataFrame(
        [
            ("A", "anc", "B"),
            ("B", "anc", "C"),
            ("C", "anc", "D"),
        ],
        TRIPLE_SCHEMA,
    )
    axioms = spark.createDataFrame(
        [("anc", False, None, True)], AXIOM_SCHEMA
    )
    rows = owl_property_rules(triples, axioms, max_depth=2).collect()
    inferred = {(r.subj, r.obj) for r in rows if r.inferred}
    # depth 2 adds the 2-hop pairs but NOT A->D (3 hops)
    assert inferred == {("A", "C"), ("B", "D")}


def test_owl_rules_symmetric_transitive_interplay(spark):
    # sibling_of symmetric AND transitive: A-B, B-C => closure over the
    # mirrored edge set reaches every ordered pair incl. self-loops
    triples = spark.createDataFrame(
        [("A", "sib", "B"), ("B", "sib", "C")], TRIPLE_SCHEMA
    )
    axioms = spark.createDataFrame(
        [("sib", True, None, True)], AXIOM_SCHEMA
    )
    rows = owl_property_rules(triples, axioms, max_depth=4).collect()
    got = {(r.subj, r.obj) for r in rows}
    assert got == {
        (a, b) for a in "ABC" for b in "ABC"
    }
    # asserted rows keep inferred=false even when rules re-derive them
    flags = {(r.subj, r.obj): r.inferred for r in rows}
    assert flags[("A", "B")] is False and flags[("B", "A")] is True


def test_owl_rules_chained_inverse_fixpoint(spark):
    """Chained inverseOf declarations (p inv q, q inv r, r inv w — a
    predicate equivalence chain) must reach a true fixpoint: (s,p,o)
    entails the flipped q/w forms AND the same-orientation r form.
    Regression for the fixed 2+1-mirror-pass schedule that provably
    missed length-3 chains."""
    triples = spark.createDataFrame([("A", "p", "B")], TRIPLE_SCHEMA)
    axioms = spark.createDataFrame(
        [
            ("p", False, "q", False),
            ("q", False, "r", False),
            ("r", False, "w", False),
        ],
        AXIOM_SCHEMA,
    )
    rows = owl_property_rules(triples, axioms).collect()
    inferred = {(r.subj, r.pred, r.obj) for r in rows if r.inferred}
    assert inferred == {
        ("B", "q", "A"),  # p inv q
        ("A", "r", "B"),  # q inv r: even chain, same orientation
        ("B", "w", "A"),  # r inv w
    }


def test_owl_rules_transitive_inverse_symmetric_closure_mirrors(spark):
    """Transitive p with inverse q where q is ALSO symmetric: closure
    pairs of p must surface in BOTH q orientations (the (s,q,o) mirror
    a single final mirror pass used to lose)."""
    triples = spark.createDataFrame(
        [("A", "p", "B"), ("B", "p", "C")], TRIPLE_SCHEMA
    )
    axioms = spark.createDataFrame(
        [("p", False, "q", True), ("q", True, "p", False)],
        AXIOM_SCHEMA,
    )
    rows = owl_property_rules(triples, axioms).collect()
    trips = {(r.subj, r.pred, r.obj) for r in rows}
    # closure pair (A,p,C); its inverse (C,q,A); and q symmetric so
    # also (A,q,C) — and symmetry back through the inverse makes p
    # symmetric in effect: (C,p,A) etc.
    for want in [
        ("A", "p", "C"),
        ("C", "q", "A"),
        ("A", "q", "C"),
        ("C", "p", "A"),
        ("B", "q", "A"),
        ("A", "q", "B"),
    ]:
        assert want in trips, want


def test_owl_rules_no_axioms_is_identity(spark):
    triples = spark.createDataFrame([("A", "p", "B")], TRIPLE_SCHEMA)
    axioms = spark.createDataFrame([], AXIOM_SCHEMA)
    rows = owl_property_rules(triples, axioms).collect()
    assert [(r.subj, r.pred, r.obj, r.inferred) for r in rows] == [
        ("A", "p", "B", False)
    ]


def test_bgp_minus_excludes_subjects_with_negated_pred(spark):
    triples = spark.createDataFrame(
        [
            ("A", "p", "B"),
            ("B", "p", "C"),
            ("C", "p", "D"),
            ("A", "q", "X"),  # A asserts q -> excluded entirely
            ("E", "q", "Y"),  # q-only subject: never in the result
        ],
        TRIPLE_SCHEMA,
    )
    got = {
        (r.subj, r.obj)
        for r in bgp_minus(triples, "p", "q").collect()
    }
    assert got == {("B", "C"), ("C", "D")}


def test_bgp_minus_complement_of_optional_nulls(spark):
    # MINUS survivors == OPTIONAL rows that bound NULL
    triples = spark.createDataFrame(
        [
            ("A", "p", "B"),
            ("B", "p", "C"),
            ("A", "q", "X"),
        ],
        TRIPLE_SCHEMA,
    )
    minus = {
        (r.subj, r.obj)
        for r in bgp_minus(triples, "p", "q").collect()
    }
    opt_nulls = {
        (r.subj, r.obj)
        for r in bgp_optional(triples, "p", "q").collect()
        if r.opt_obj is None
    }
    assert minus == opt_nulls == {("B", "C")}


def _closure_pairs(edges):
    """NumPy-free reference closure for reach_delta tests."""
    reach = set(edges)
    while True:
        add = {
            (a, d)
            for (a, b) in reach
            for (c, d) in reach
            if b == c and (a, d) not in reach
        }
        if not add:
            return reach
        reach |= add


def test_reach_delta_matches_closure_difference(spark):
    old = [("A", "B"), ("B", "C"), ("X", "Y")]
    delta = [("C", "X"), ("Y", "A")]  # creates a cycle through everything
    closure = spark.createDataFrame(
        sorted(_closure_pairs(old)), "subj STRING, obj STRING"
    )
    d_df = spark.createDataFrame(delta, "src STRING, dst STRING")
    got = {
        (r.subj, r.obj)
        for r in reach_delta(closure, d_df, max_rounds=8).collect()
    }
    expected = _closure_pairs(old + delta) - _closure_pairs(old)
    assert got == expected
    # the cycle makes self-reachability new pairs — sanity that the
    # difference is non-trivial
    assert ("A", "A") in got and ("A", "B") not in got


def test_reach_delta_duplicate_and_known_edges(spark):
    # a delta edge already implied by the closure adds nothing
    old = [("A", "B"), ("B", "C")]
    closure = spark.createDataFrame(
        sorted(_closure_pairs(old)), "subj STRING, obj STRING"
    )
    d_df = spark.createDataFrame(
        [("A", "C"), ("A", "C")], "src STRING, dst STRING"
    )
    assert reach_delta(closure, d_df).count() == 0


def test_reach_delta_chains_multiple_new_edges(spark):
    # P -> Q and R -> S both new, old path Q -> R bridges them: P
    # reaches S only via TWO new edges — the B+ rounds must find it
    old = [("Q", "R")]
    closure = spark.createDataFrame(old, "subj STRING, obj STRING")
    d_df = spark.createDataFrame(
        [("P", "Q"), ("R", "S")], "src STRING, dst STRING"
    )
    got = {
        (r.subj, r.obj) for r in reach_delta(closure, d_df).collect()
    }
    assert got == {
        ("P", "Q"),
        ("R", "S"),
        ("P", "R"),
        ("Q", "S"),
        ("P", "S"),
    }


def test_owl_rules_delta_transitive_extension(spark):
    axioms = spark.createDataFrame(
        [("anc", False, None, True)], AXIOM_SCHEMA
    )
    old = spark.createDataFrame([("A", "anc", "B")], TRIPLE_SCHEMA)
    mat = owl_property_rules(old, axioms).select("subj", "pred", "obj")
    delta = spark.createDataFrame([("B", "anc", "C")], TRIPLE_SCHEMA)
    got = {
        (r.subj, r.pred, r.obj, r.inferred)
        for r in owl_rules_delta(mat, axioms, delta).collect()
    }
    assert got == {
        ("B", "anc", "C", False),   # the new assertion itself
        ("A", "anc", "C", True),    # old path extended through it
    }


def test_owl_rules_delta_drops_known_rows(spark):
    axioms = spark.createDataFrame(
        [("knows", True, None, False)], AXIOM_SCHEMA
    )
    old = spark.createDataFrame([("A", "knows", "B")], TRIPLE_SCHEMA)
    mat = owl_property_rules(old, axioms).select("subj", "pred", "obj")
    # (B, knows, A) was only INFERRED before; re-asserting it is not new
    delta = spark.createDataFrame(
        [("B", "knows", "A"), ("A", "knows", "B")], TRIPLE_SCHEMA
    )
    assert owl_rules_delta(mat, axioms, delta).count() == 0


def test_owl_rules_delta_inverse_both_ways(spark):
    axioms = spark.createDataFrame(
        [("parent_of", False, "child_of", False)], AXIOM_SCHEMA
    )
    old = spark.createDataFrame([("P", "parent_of", "K")], TRIPLE_SCHEMA)
    mat = owl_property_rules(old, axioms).select("subj", "pred", "obj")
    delta = spark.createDataFrame([("K", "child_of", "Q")], TRIPLE_SCHEMA)
    got = {
        (r.subj, r.pred, r.obj, r.inferred)
        for r in owl_rules_delta(mat, axioms, delta).collect()
    }
    assert got == {
        ("K", "child_of", "Q", False),
        ("Q", "parent_of", "K", True),
    }


def test_reach_delta_raises_when_rounds_exhausted(spark):
    import pytest

    # a 5-new-edge chain with an empty old closure needs 5 bridge
    # rounds; max_rounds=3 cannot reach fixpoint and must say so
    closure = spark.createDataFrame([], "subj STRING, obj STRING")
    delta = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(6)], "src STRING, dst STRING"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        reach_delta(closure, delta, max_rounds=3)
    # enough rounds: full 21-pair closure of the 6-edge chain
    assert reach_delta(closure, delta, max_rounds=8).count() == 21
