"""GO-term transfer (E11/J3) — winner -> reference GO annotations.

Parity: AHRD.java:233-240 — if the winning hit's short accession has entries
in the GOA map, the query protein inherits that full GO set.

Spark shape: the winners table is small relative to the hits (one row per
protein); GOA is pre-filtered to hit accessions (A8 semi-join).  The
transfer is an equi-join on short_acc followed by collect_set; the join
strategy is left to AQE — both sides scale with the input (winners with the
doc count, filtered GOA with the hit-accession vocabulary), so a forced
broadcast would cap the operator at driver memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transfer_go(winners: DataFrame, goa: DataFrame) -> DataFrame:
    """(protein_acc, go_terms ARRAY<STRING> sorted) for proteins whose
    winning hit has reference GO annotations."""
    return (
        winners.select("protein_acc", "short_acc")
        .join(goa, "short_acc")
        .groupBy("protein_acc")
        .agg(F.array_sort(F.collect_set("go_term")).alias("go_terms"))
    )


def go_dag_closure(
    edges: DataFrame, max_iter: int = 32, checkpoint_dir: str | None = None
) -> DataFrame:
    """Transitive closure of a GO is-a DAG given (child, parent) edges ->
    (go_term, ancestor).  Generalizes the InterPro parent-chain recursion
    (InterproResult.java:198-244) to the GO ontology — the reference
    declares a goDB (AHRD.java:40) but never populates it in this version;
    the engine makes DAG propagation a first-class operator.

    The ontology is dictionary-sized -> iterative self-join on the driver's
    Spark session, broadcast downstream.  ``checkpoint_dir`` truncates the
    final lineage to reliable storage (``DataFrame.checkpoint``) for
    cluster fault tolerance; default localCheckpoint is the fast
    single-process mode.  Same option contract AND caveats as
    connected_components: ``setCheckpointDir`` is session-global (share one
    dir across concurrent callers) and reliable checkpoint files need
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (or manual
    cleanup) to be reclaimed."""
    e = edges.toDF("go_term", "ancestor").filter(
        F.col("go_term") != F.col("ancestor")
    ).distinct().cache()
    closure = e
    frontier = e
    cached = [e]
    for _ in range(max_iter):
        nxt = (
            frontier.alias("f")
            .join(e.alias("e"), F.col("f.ancestor") == F.col("e.go_term"))
            .select(
                F.col("f.go_term").alias("go_term"),
                F.col("e.ancestor").alias("ancestor"),
            )
            .distinct()
            .join(closure, ["go_term", "ancestor"], "left_anti")
        )
        nxt = nxt.persist()
        cached.append(nxt)
        if nxt.isEmpty():
            break
        closure = closure.unionByName(nxt)
        frontier = nxt
    # materialize once, release the loop caches (see interpro_closure)
    if checkpoint_dir:
        closure.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        out = closure.checkpoint(eager=True)
    else:
        out = closure.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist(blocking=False)
    return out


def propagate_go_ancestors(
    go_annotations: DataFrame, dag_edges: DataFrame
) -> DataFrame:
    """Expand (protein_acc, go_term) annotations with all DAG ancestors
    (the 'true-path rule'): a protein annotated with a term is implicitly
    annotated with every ancestor.  Output distinct
    (protein_acc, go_term, is_direct)."""
    closure = go_dag_closure(dag_edges)
    direct = go_annotations.select(
        "protein_acc", "go_term", F.lit(True).alias("is_direct")
    )
    inherited = (
        go_annotations.join(F.broadcast(closure), "go_term")
        .select(
            "protein_acc",
            F.col("ancestor").alias("go_term"),
            F.lit(False).alias("is_direct"),
        )
        .join(direct.select("protein_acc", "go_term"),
              ["protein_acc", "go_term"], "left_anti")
        .distinct()
    )
    return direct.unionByName(inherited)
