"""Distributed k-means + SemDeDup-style semantic deduplication over
embedding columns (ARRAY<FLOAT/DOUBLE>).

Training-data curation at corpus scale clusters embeddings first and only
compares documents *within* a cluster (SemDeDup, Abbas et al. 2023,
arXiv:2303.09540): the cluster assignment bounds the otherwise-quadratic
near-dup pair set the same way LSH bands bound it for MinHash
(``dedup.py``).  This module supplies the two pieces:

- ``kmeans_assign``  spherical k-means (cosine argmax assignment,
  arithmetic-mean update) with deterministic lowest-id seeding — no RNG,
  so the result is replayable and oracle-checkable.
- ``semantic_dedup`` within-cluster cosine near-dup with a keep-lowest-id
  policy.

Scale shape (the part that must survive 10^12 rows):

- The centroid set is a k x dim frame (kilobytes) collapsed into ONE
  array-of-structs row and broadcast; assignment is then a shuffle-free
  linear projection — each row folds the centroid array once
  (``F.aggregate``), O(k*dim) per row, whole-stage codegen, no
  corpus-side shuffle and no driver collect.
- The mean update is one shuffle keyed by (cluster_id, pos) with k*dim
  groups; ``avg`` partially aggregates map-side, so the shuffle carries
  ~k*dim*partitions partial rows, not N*dim element rows.
- The loop's centroid frame is checkpointed each round (reliable
  ``checkpoint_dir`` for real clusters, localCheckpoint fallback —
  same contract as ``connected_components`` / ``go_dag_closure``) so plan
  depth stays flat across iterations.
- ``semantic_dedup``'s pair join is keyed by cluster_id: the quadratic
  blow-up is bounded by cluster size, which the caller controls via
  ``n_clusters`` (SemDeDup practice: k scales with corpus so clusters
  stay ~10^3-10^4 docs).  AQE's skew-join split covers outlier clusters.

Determinism: seeding is by lowest id, argmax ties break toward the lowest
cluster_id, and the per-row centroid fold is a sequential left-to-right
reduce — the same order DuckDB's ``list_dot_product`` uses, so the oracle
replay matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ahrd_spark.operators.similarity import cosine_expr, dot_expr, norm_expr


def _centroid_array(cents: DataFrame) -> DataFrame:
    """k-row (cluster_id, cv) frame -> ONE row holding the sorted
    array<struct<cluster_id,cv,cnorm>> — the broadcast payload.  Centroid
    norms ride along so the per-row fold never recomputes them."""
    return cents.groupBy().agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "cluster_id",
                    "cv",
                    norm_expr(F.col("cv")).alias("cnorm"),
                )
            )
        ).alias("cents")
    )


def _assign(c: DataFrame, cents: DataFrame) -> DataFrame:
    """Shuffle-free argmax-cosine assignment: score every centroid once
    (one transform), then fold for the max -> (vid, v, cluster_id, cos).
    Strict ``>`` keeps the earliest (lowest cluster_id) winner on exact
    ties; the array is sorted by cluster_id."""
    init = F.struct(
        F.lit(-1).cast("int").alias("cluster_id"),
        F.lit(-2.0).alias("cos"),
    )
    scored = F.transform(
        F.col("cents"),
        lambda s: F.struct(
            s["cluster_id"].alias("cluster_id"),
            (
                dot_expr(s["cv"], F.col("v"))
                / (s["cnorm"] * F.col("vnorm"))
            ).alias("cos"),
        ),
    )
    best = F.aggregate(
        F.col("scored"),
        init,
        lambda acc, s: F.when(s["cos"] > acc["cos"], s).otherwise(acc),
    )
    return (
        c.crossJoin(F.broadcast(_centroid_array(cents)))
        .withColumn("vnorm", norm_expr(F.col("v")))
        .withColumn("scored", scored)
        .withColumn("best", best)
        .select(
            "vid", "v",
            F.col("best")["cluster_id"].alias("cluster_id"),
            F.col("best")["cos"].alias("cos"),
        )
    )


def _kmeans_loop(
    c: DataFrame,
    n_clusters: int,
    iters: int,
    checkpoint_dir: str | None,
) -> DataFrame:
    """(vid, v, cluster_id, cos) after ``iters`` Lloyd rounds.  A cluster
    that loses every member simply drops out of the centroid set (both the
    engine and the SQL replay drop empty groups the same way)."""
    spark = c.sparkSession
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
    cents = (
        c.orderBy(F.col("vid").asc())
        .limit(n_clusters)
        .select(
            (
                F.row_number().over(Window.orderBy(F.col("vid").asc())) - 1
            ).alias("cluster_id"),
            F.col("v").alias("cv"),
        )
    )
    for _ in range(iters):
        assigned = _assign(c, cents)
        cents = (
            assigned.select(
                "cluster_id", F.posexplode("v").alias("pos", "x")
            )
            .groupBy("cluster_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
        )
        # k x dim rows: checkpointing is cheap and keeps the unrolled plan
        # from deepening linearly with iters
        cents = (
            cents.checkpoint(eager=True)
            if checkpoint_dir
            else cents.localCheckpoint(eager=True)
        )
    return _assign(c, cents)


def _project(corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )


def kmeans_assign(
    corpus: DataFrame,
    n_clusters: int = 10,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """-> (id_col, cluster_id, cosine rounded to 6dp): final spherical
    k-means assignment after ``iters`` rounds, seeded with the
    ``n_clusters`` lowest-id vectors (deterministic; swap trained centroids
    in a real deployment — the plan shape is unchanged)."""
    final = _kmeans_loop(
        _project(corpus, id_col, vec_col), n_clusters, iters, checkpoint_dir
    )
    return final.select(
        F.col("vid").alias(id_col),
        "cluster_id",
        F.round("cos", 6).alias("cosine"),
    )


def semantic_dedup(
    corpus: DataFrame,
    n_clusters: int = 10,
    iters: int = 2,
    threshold: float = 0.97,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """SemDeDup: -> (id_col, cluster_id, keep BOOLEAN).  ``keep`` is false
    iff a SMALLER-id member of the same cluster sits within cosine >=
    ``threshold`` — the lowest id of each near-dup neighborhood survives,
    every later arrival is marked a duplicate.  Pairing never leaves the
    cluster, so the pair set is bounded by cluster size, not corpus size.
    """
    assigned = _kmeans_loop(
        _project(corpus, id_col, vec_col), n_clusters, iters, checkpoint_dir
    )
    keep_side = assigned.select(
        "cluster_id", F.col("vid").alias("vid_a"), F.col("v").alias("va")
    )
    probe_side = assigned.select(
        "cluster_id", F.col("vid").alias("vid_b"), F.col("v").alias("vb")
    )
    dup_ids = (
        probe_side.join(keep_side, "cluster_id")
        .filter(F.col("vid_a") < F.col("vid_b"))
        .filter(cosine_expr(F.col("va"), F.col("vb")) >= F.lit(threshold))
        .select(F.col("vid_b").alias("vid"))
        .distinct()
    )
    return (
        assigned.join(
            dup_ids.withColumn("is_dup", F.lit(True)), "vid", "left"
        )
        .select(
            F.col("vid").alias(id_col),
            "cluster_id",
            F.col("is_dup").isNull().alias("keep"),
        )
    )
