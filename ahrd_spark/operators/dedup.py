"""Deduplication operators for training-data pipelines.

Four families, each with a different cost/recall point:
- exact          hash-groupBy on a content hash — one shuffle keyed by the
                 hash (uniform by construction -> no skew)
- minhash + LSH  shingle -> per-seed min-hash -> band buckets -> bucket join;
                 only same-bucket pairs are compared, the standard sub-
                 quadratic near-dup path at corpus scale
- simhash        per-token bit votes -> compact bit signature; hamming-near
                 docs collide on signature prefixes
- n-gram jaccard exact pair similarity (verification step after LSH
                 candidate generation, or direct on small candidate sets)

All hashes are md5-derived (deterministic, engine-independent — the same
values fall out of any SQL engine, which the DuckDB correctness oracle
relies on).  No Python in any path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ahrd_spark.functions.text import tokenize_expr


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
                ) -> DataFrame:
    """-> (content_hash, canonical_id, dup_count): one row per distinct
    content; canonical = min id.  Partial-aggregates map-side; the hash key
    is uniform so the shuffle cannot skew."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("dup_count"),
        )
    )


def shingles_expr(text: Column, k: int = 3) -> Column:
    """Token k-gram shingles (ARRAY<STRING>), distinct."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )


def minhash_signature(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 16, shingle_k: int = 3,
) -> DataFrame:
    """-> (id, sig ARRAY<STRING>[num_hashes]): per seed h, min over shingles
    of md5(shingle + '#h').  String-min of hex digests is a valid uniform
    min-hash and is engine-portable."""
    sh = shingles_expr(F.col(text_col), shingle_k)
    sig = F.array(
        *[
            F.array_min(
                F.transform(sh, lambda s: F.md5(F.concat(s, F.lit(f"#{h}"))))
            )
            for h in range(num_hashes)
        ]
    )
    return df.select(F.col(id_col).alias("doc_id"), sig.alias("sig"))


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures and emit candidate duplicate pairs (a < b) that
    share at least one band bucket.  The join is keyed by (band, bucket
    hash) — bucket sizes are the only skew surface; near-duplicate floods
    (e.g. boilerplate) surface as big buckets, which AQE skew-join splits.
    """
    banded = signatures.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[
                                F.col("sig")[b * rows_per_band + r]
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash_expr(text: Column, bits: int = 16) -> Column:
    """Simhash signature as a LONG: bit i set iff the sum over tokens of
    (+1 / -1) votes from the token hash's i-th nibble parity is positive.
    md5-nibble parity keeps it portable across engines."""
    toks = tokenize_expr(text)
    def bit(i):
        votes = F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + F.when(
                F.ascii(F.substring(F.md5(t), i + 1, 1)) % 2 == 1, F.lit(1)
            ).otherwise(F.lit(-1)),
        )
        return F.when(votes > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long"))
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + bit(i)
    return out


def jaccard_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact token-set Jaccard for given (doc_a, doc_b) candidate pairs.
    Two broadcast-able joins against the token-set projection."""
    toksets = df.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "toks"
        ),
    )
    return (
        pairs.join(toksets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("toks", "toks_a"), "doc_a")
        .join(toksets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("toks", "toks_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
                / F.size(F.array_union("toks_a", "toks_b"))
            ).alias("jaccard"),
        )
    )
