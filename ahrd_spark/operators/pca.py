"""Dominant principal component of an embedding column via distributed
power iteration — the standard spectral diagnostic for training-data
embeddings (anisotropy / dominant-direction removal, ABTT "all-but-the-top"
style, Mu & Viswanath 2018).

The covariance matrix is never materialized: each power-iteration step
uses the identity

    C v = (1/n) * sum_rows (x - mu) * ((x - mu) . v)

so one pass over the table computes the per-row scalar projection
``s = (x - mu) . v`` and dim-averages ``(x_j - mu_j) * s`` — a single
aggregate whose shuffle key is the DIMENSION index (d keys, partial-agg
map-side; d ~ 64-4096 regardless of corpus size).  The iterate ``v`` and
the mean ``mu`` live as 1-row array frames cross-joined broadcast — model
state, never a driver value or a d x d matrix.  Iterations are unrolled
(``iters`` is 3-5 in practice: power iteration on a covariance with a
clear dominant eigenvalue converges geometrically), and every step is
pure ``pyspark.sql.functions`` array arithmetic — no UDFs, and DuckDB
replays the identical unrolled plan (oracle ``pca_loadings``).

Scale note: the table is scanned once per iteration plus once for the
mean (no caching requirement — works when the embedding table exceeds
cluster memory); with ``iters=3`` that is 4 scans total.  The start
vector is the deterministic uniform unit vector (1/sqrt(d), ...), which
is never exactly orthogonal to the dominant eigenvector of a real
covariance; sign is therefore deterministic too.

All rows must share one embedding dimensionality (the contract of every
ANN/dedup operator in ``similarity.py``); NULL embeddings are dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pack(per_dim: DataFrame, val_col: str) -> DataFrame:
    """(dim, val) -> 1-row frame with ``arr`` ordered by dim."""
    return per_dim.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", F.col(val_col)))),
            lambda t: t[val_col],
        ).alias("arr")
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dominant_component(
    emb: DataFrame,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (dim, mu, loading): per-dimension corpus mean and the unit-norm
    dominant principal direction after ``iters`` power-iteration steps.
    ``dim`` is 1-based (matches SQL list subscripts)."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    x = emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda c: c.cast("double")).alias("x"),
    )
    dims = x.select(
        F.posexplode("x").alias("pos", "val")
    ).select((F.col("pos") + 1).alias("dim"), "val")
    mu = dims.groupBy("dim").agg(F.avg("val").alias("mu"))
    mu_arr = _pack(mu, "mu")

    # centered rows; mu_arr is a 1-row model frame -> broadcast
    cx = x.crossJoin(F.broadcast(mu_arr)).select(
        "id", F.zip_with("x", "arr", lambda a, b: a - b).alias("cx")
    )
    # deterministic uniform unit start vector
    v_arr = mu_arr.select(
        F.transform(
            "arr", lambda _: F.lit(1.0) / F.sqrt(F.size("arr"))
        ).alias("arr")
    )
    for _ in range(iters):
        s = cx.crossJoin(F.broadcast(v_arr)).select(
            "cx", _dot(F.col("cx"), F.col("arr")).alias("s")
        )
        w = (
            s.select(F.posexplode(F.transform("cx", lambda c: c * F.col("s")))
                     .alias("pos", "val"))
            .select((F.col("pos") + 1).alias("dim"), "val")
            .groupBy("dim")
            .agg(F.avg("val").alias("w"))
        )
        nrm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        v_arr = _pack(
            w.crossJoin(F.broadcast(nrm)).select(
                "dim", (F.col("w") / F.col("nrm")).alias("v")
            ),
            "v",
        )
    out = mu.join(
        v_arr.select(F.posexplode("arr").alias("pos", "loading"))
        .select((F.col("pos") + 1).alias("dim"), "loading"),
        "dim",
    )
    return out.select("dim", "mu", "loading")


def project_dominant(
    emb: DataFrame,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, proj): each row's centered projection onto the dominant
    component from ``dominant_component`` — the score to threshold or
    subtract (ABTT) when neutralizing the dominant direction."""
    comp = dominant_component(emb, iters=iters, id_col=id_col, vec_col=vec_col)
    mu_arr = _pack(comp, "mu")
    v_arr = _pack(comp, "loading")
    x = emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda c: c.cast("double")).alias("x"),
    )
    return (
        x.crossJoin(F.broadcast(mu_arr.withColumnRenamed("arr", "mu_a")))
        .crossJoin(F.broadcast(v_arr))
        .select(
            "id",
            _dot(
                F.zip_with("x", "mu_a", lambda a, b: a - b), F.col("arr")
            ).alias("proj"),
        )
    )
