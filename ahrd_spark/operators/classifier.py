"""Hashed-feature linear text classifier (fastText-style quality scoring).

The standard web-scale curation gate (GPT-3 / CCNet lineage): a linear
model over hashed bag-of-words features, scored as

    p(doc) = sigmoid( bias + sum_t w[h(t) mod B] )

with ``h`` a stable hash, ``B`` the bucket count, and ``w`` a learned (or
here, caller-provided) weight vector.  Inference is the part that must run
at 10^12-document scale; training the weights is out of scope (any offline
trainer emits a ``(bucket, weight)`` table).

Scale shape — two formulations behind one result contract:

* weights as a TABLE (the general path, ``hashed_linear_scores``):
  token explode -> bucket -> broadcast-join the weight table (B rows,
  dimension-sized by construction: B is a model constant, never data-
  sized — the no-data-sized-broadcast invariant holds) -> one doc-keyed
  hash aggregation.  The agg key is doc_id, so hot TOKENS never
  concentrate a reducer (they fan out across their docs' partitions), and
  map-side partial aggregation applies.
* the bucket hash is the engine's portable md5 construction
  (first 60 bits of md5, mod B) — same math the dedup/minhash family
  uses, replayable in any SQL engine.

Tokenization is the dedup family's order-preserving lowercase whitespace
split (frequency-sensitive — a token contributes once per occurrence, as
in fastText's bag-of-words), NOT the deduping AHRD T1 tokenizer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_bucket_expr(token: Column, n_buckets: int) -> Column:
    """Stable feature bucket: first 60 bits of md5(token) mod n_buckets
    (the shared portable hash — see functions/hashing.py)."""
    from ahrd_spark.functions.hashing import md5_prefix60

    return md5_prefix60(token) % F.lit(n_buckets)


def hashed_linear_scores(
    df: DataFrame,
    weights: DataFrame,
    n_buckets: int,
    bias: float = 0.0,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document with a hashed linear model; one row per doc:

        (doc_id, n_tokens, score, prob, keep)

    ``weights``  a (bucket: bigint, weight: double) table with at most
                 ``n_buckets`` rows (missing buckets weigh 0.0),
    ``score``    bias + sum of matched bucket weights (token frequency
                 counts: each occurrence contributes),
    ``prob``     sigmoid(score),
    ``keep``     prob >= threshold.

    Plan: explode tokens -> bucket -> LEFT broadcast-join weights ->
    groupBy(doc) sum -> left-join back to the doc spine so token-less
    documents still score (prob = sigmoid(bias)).
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    spine = df.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.trim(F.col(text_col)) == "", F.lit(0))
        .otherwise(F.size(toks)).cast("bigint").alias("n_tokens"),
    )
    tok_rows = (
        df.where(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(toks).alias("tok"),
        )
        .select("doc_id", token_bucket_expr(F.col("tok"), n_buckets).alias("bucket"))
    )
    # B is a model constant (weights has <= n_buckets rows) — broadcast is
    # safe by construction, never data-sized.
    sums = (
        tok_rows.join(F.broadcast(weights), "bucket", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("wsum"))
    )
    score = F.lit(float(bias)) + F.coalesce(F.col("wsum"), F.lit(0.0))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-score))
    return (
        spine.join(sums, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            score.alias("score"),
            prob.alias("prob"),
            (prob >= F.lit(float(threshold))).alias("keep"),
        )
    )
