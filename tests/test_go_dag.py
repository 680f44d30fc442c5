"""GO-DAG closure + true-path-rule propagation."""

from ahrd_spark.operators.go_transfer import (
    go_dag_closure,
    propagate_go_ancestors,
)


def test_go_dag_closure(spark):
    # a -> b -> c ; d -> c  (child, parent)
    edges = spark.createDataFrame(
        [("GO:a", "GO:b"), ("GO:b", "GO:c"), ("GO:d", "GO:c")],
        "child string, parent string",
    )
    got = {(r["go_term"], r["ancestor"]) for r in go_dag_closure(edges).collect()}
    assert got == {
        ("GO:a", "GO:b"), ("GO:b", "GO:c"), ("GO:d", "GO:c"),
        ("GO:a", "GO:c"),
    }


def test_propagate_go_ancestors(spark):
    edges = spark.createDataFrame(
        [("GO:a", "GO:b"), ("GO:b", "GO:c")], "child string, parent string"
    )
    annos = spark.createDataFrame(
        [("P1", "GO:a"), ("P2", "GO:b"), ("P2", "GO:c")],
        "protein_acc string, go_term string",
    )
    out = {
        (r["protein_acc"], r["go_term"]): r["is_direct"]
        for r in propagate_go_ancestors(annos, edges).collect()
    }
    assert out == {
        ("P1", "GO:a"): True,
        ("P1", "GO:b"): False,
        ("P1", "GO:c"): False,
        ("P2", "GO:b"): True,
        ("P2", "GO:c"): True,  # direct wins over inherited
    }
