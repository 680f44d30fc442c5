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


def test_closure_loops_release_their_caches(spark):
    """Long-lived sessions must not leak executor memory per closure call:
    repeated closure computations leave no extra persisted RDDs behind
    (each call's result keeps at most its own materialized blocks, freed
    when the reference is dropped)."""
    import gc

    from ahrd_spark.operators.interpro_filter import interpro_closure

    edges = spark.createDataFrame(
        [("GO:a", "GO:b"), ("GO:b", "GO:c")], "child string, parent string"
    )
    ipr_db = spark.createDataFrame(
        [("ipr1", None, []), ("ipr2", "ipr1", ["ipr3"]), ("ipr3", None, [])],
        "ipr_id string, parent_id string, contains array<string>",
    )

    def retained():
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    # warm one call of each, drop results
    go_dag_closure(edges).count()
    interpro_closure(ipr_db).count()
    base = retained()
    for _ in range(3):
        go_dag_closure(edges).count()
        interpro_closure(ipr_db).count()
    # loop caches released: repeated calls add nothing beyond transient
    # result blocks the ContextCleaner is still draining
    assert retained() <= base + 2
