"""Hand-worked goldens for the schema-level KG operators
(operators/kgschema.py): RDFS type entailment, SHACL-style validation,
bounded metapath counts.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ahrd_spark.operators.kgschema import (  # noqa: E402
    infer_types,
    metapath_counts,
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
