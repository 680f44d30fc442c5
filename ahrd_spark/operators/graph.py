"""Graph analytics over edge tables — PageRank for entity salience.

A knowledge-graph pipeline needs more than canonicalization (connected
components, ``connected_components.py``): once (subj, pred, obj) triples
materialize, ranking entities by link structure is the standard salience
signal (which GO terms / descriptors dominate the graph).  This module
implements damped PageRank as a deterministic, replayable DataFrame loop.

Semantics (classic Brin-Page with uniform dangling redistribution):
- nodes = union of edge endpoints; rank initialized to 1/N;
- per iteration: every node sends rank/out_degree along each out-edge;
  the rank mass of dangling nodes (no out-edges) is redistributed
  uniformly; new_rank = (1-d)/N + d * (in_mass + dangling_mass/N).
  Total rank mass stays 1 every iteration.

Scale shape:
- the edges ⋈ out_degree join happens ONCE, outside the loop (both sides
  keyed by src — one co-partitioned shuffle), and the result is cached;
- each iteration is exactly two shuffles: ranks ⋈ weighted-edges on src,
  then groupBy(dst) sum with map-side partial agg.  The dangling-mass and
  node-count terms are 1-row frames (global agg riding the same ranks
  scan) cross-joined back — never a driver collect;
- the ranks frame is checkpointed per iteration (reliable
  ``checkpoint_dir`` option, localCheckpoint fallback — same contract as
  ``connected_components`` / the closure loops) so the plan stays flat at
  any iteration count;
- no comparisons ride on floats (pure arithmetic), so cross-engine ulp
  noise never flips a row — the DuckDB oracle replays the same unrolled
  iterations and matches at 6-decimal rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """-> (node, rank): damped PageRank after ``iters`` synchronous
    iterations over the DISTINCT edge set (multi-edges collapse to one;
    self-loops count as ordinary edges)."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    spark = edges.sparkSession
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_count = nodes.groupBy().agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    out_deg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("deg")
    )
    # per-edge transfer weight fixed across iterations: join once, cache
    weighted = e.join(out_deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("w")
    )
    weighted = weighted.persist()
    has_out = out_deg.select(F.col("src").alias("node"))

    ranks = nodes.crossJoin(F.broadcast(n_count)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    try:
        for _ in range(iters):
            in_mass = (
                ranks.join(weighted, ranks["node"] == weighted["src"])
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("w")).alias("m"))
                .withColumnRenamed("dst", "node")
            )
            dangling = (
                ranks.join(has_out, "node", "left_anti")
                .groupBy()
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
            )
            ranks = (
                nodes.join(in_mass, "node", "left")
                .crossJoin(F.broadcast(dangling))
                .crossJoin(F.broadcast(n_count))
                .select(
                    "node",
                    (
                        (1.0 - damping) / F.col("n")
                        + damping
                        * (
                            F.coalesce(F.col("m"), F.lit(0.0))
                            + F.col("dm") / F.col("n")
                        )
                    ).alias("rank"),
                )
            )
            ranks = (
                ranks.checkpoint(eager=True)
                if checkpoint_dir
                else ranks.localCheckpoint(eager=True)
            )
    finally:
        weighted.unpersist()
    return ranks
