"""InterPro ancestry/containment closure + most-informative filter (J9).

Parity: InterproResult.java:177-244 + golden
test/ahrd/test/InterproResultTest.java:96-143 — after filtering, a protein
keeps exactly the domains that have NO other of its domains as a transitive
ancestor (parent chain) or transitive container (contains-sets).  (The
golden keeps the roots ipr1/ipr2 and drops all descendants/containees.)

The reference walks the DAG recursively per pair — O(n^2) per protein with
repeated DB lookups (its comment admits the cost).  Spark-first design:

1. Precompute the transitive closure of the (small, broadcastable) InterPro
   DAG ONCE — `closure(ipr_id, superior_id)` where superior is a transitive
   ancestor-or-container.  The InterPro hierarchy is shallow (< 10 levels)
   and the dictionary is tiny versus the hits, so closure is an iterative
   self-join that converges in a handful of rounds.
2. The filter is then one broadcast join + left-anti join per protein —
   linear, not quadratic, and fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interpro_closure(
    interpro_db: DataFrame,
    max_iter: int = 32,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """closure(ipr_id, superior_id): superior_id is a transitive ancestor
    (via parent_id chain) or transitive container (via contains sets,
    inverted to child->container edges) of ipr_id.

    ``checkpoint_dir`` switches the final lineage truncation to reliable
    storage (``DataFrame.checkpoint``) so a long-lived cluster job survives
    executor loss; default localCheckpoint is the fast single-process mode.
    Same option contract AND same caveats as connected_components:
    ``setCheckpointDir`` is session-global (concurrent callers should share
    one dir — files are per-RDD-uuid, so sharing is safe), and reliable
    checkpoint files are only auto-deleted with
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true``; otherwise
    clean the dir after the job."""
    parent_edges = interpro_db.filter(F.col("parent_id").isNotNull()).select(
        F.col("ipr_id"), F.col("parent_id").alias("superior_id")
    )
    contain_edges = interpro_db.select(
        F.explode("contains").alias("ipr_id"),
        F.col("ipr_id").alias("superior_id"),
    )
    edges = parent_edges.unionByName(contain_edges).distinct().cache()

    closure = edges
    frontier = edges
    cached = [edges]
    for _ in range(max_iter):
        # next hop: frontier (a -> b) joined with edges (b -> c) gives a -> c
        nxt = (
            frontier.alias("f")
            .join(
                edges.alias("e"),
                F.col("f.superior_id") == F.col("e.ipr_id"),
            )
            .select(
                F.col("f.ipr_id").alias("ipr_id"),
                F.col("e.superior_id").alias("superior_id"),
            )
            .distinct()
            .join(closure, ["ipr_id", "superior_id"], "left_anti")
        )
        nxt = nxt.cache()
        cached.append(nxt)
        if nxt.isEmpty():
            break
        closure = closure.unionByName(nxt)
        frontier = nxt
    # materialize the (dictionary-sized) closure once, then release every
    # loop cache — a long-lived session must not leak executor memory per
    # call.  The result's own blocks are freed by the ContextCleaner when
    # the caller drops the DataFrame.
    if checkpoint_dir:
        closure.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        out = closure.checkpoint(eager=True)
    else:
        out = closure.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist(blocking=False)
    return out


def filter_most_informative(
    protein_domains: DataFrame, closure: DataFrame
) -> DataFrame:
    """Keep (protein_acc, ipr_id) rows with no OTHER domain of the same
    protein among ipr_id's transitive superiors.

    protein_domains: (protein_acc, ipr_id); closure: from interpro_closure.
    The closure is dictionary-sized -> broadcast; the removal check is a
    semi-join construction + left-anti join, both protein-keyed.
    """
    doomed = (
        protein_domains.alias("d")
        .join(F.broadcast(closure).alias("c"), F.col("d.ipr_id") == F.col("c.ipr_id"))
        .join(
            protein_domains.alias("o"),
            (F.col("o.protein_acc") == F.col("d.protein_acc"))
            & (F.col("o.ipr_id") == F.col("c.superior_id"))
            & (F.col("o.ipr_id") != F.col("d.ipr_id")),
            "left_semi",
        )
        .select(F.col("d.protein_acc").alias("protein_acc"), F.col("d.ipr_id").alias("ipr_id"))
        .distinct()
    )
    return protein_domains.join(doomed, ["protein_acc", "ipr_id"], "left_anti")
