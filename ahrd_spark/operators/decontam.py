"""Benchmark decontamination: flag training documents that share token
n-grams with a held-out / evaluation set.

The standard LLM-corpus hygiene step (n-gram test-set overlap): a training
document is *contaminated* when at least ``min_matches`` of its DISTINCT
token n-grams also occur anywhere in the benchmark set.  Tokenization is the
dedup family's (split lowercased text on whitespace runs — order-preserving,
NOT the AHRD T1 tokenizer, which sorts/dedupes and would destroy n-grams).

Scale shape (designed for a 100 TB corpus vs a benchmark of millions of
items):

- n-gram generation explodes shingle START POSITIONS with the token array
  carried by the Generate and indexes it with ``try_element_at`` — every
  expression is an ordinary codegen'd builtin (the array-lambda formulation
  evaluates interpreted at ~1 ms/doc; see minhash_signature's measurement
  note in dedup.py).
- both sides dedupe BEFORE the join (map-side partial aggregation), so the
  join is (doc_id, gram) x (gram) with at most one benchmark row per gram —
  output is bounded by the corpus side, never quadratic.
- no broadcast hint on the benchmark grams: a benchmark set is data-sized
  (WMDP/MMLU today, an arbitrary eval suite tomorrow); AQE broadcasts it
  when it is actually small and falls back to a hash join (with skew
  splitting for hot boilerplate grams) when it is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ngram_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """-> (doc_id, gram): one row per token k-gram occurrence (duplicates
    included — callers dedupe where semantics need it).

    Positions run 1..max(n-k+1, 1): a document shorter than ``k`` tokens
    yields its whole token sequence as one (short) gram, so no document is
    silently exempt from the overlap check.  ``try_element_at`` past the
    array end is null and ``concat_ws`` skips nulls, which truncates the
    gram exactly like a list slice.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"),
                     F.size(toks).alias("n"))
    pos = F.explode(
        F.sequence(F.lit(1), F.greatest(F.col("n") - (k - 1), F.lit(1)))
    )
    with_pos = base.select("doc_id", "toks", pos.alias("pos"))
    gram = F.concat_ws(
        " ", *[F.try_element_at("toks", F.col("pos") + i) for i in range(k)]
    )
    return with_pos.select("doc_id", gram.alias("gram"))


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark_text_col: str | None = None,
    k: int = 8,
    min_matches: int = 1,
) -> DataFrame:
    """-> (doc_id, n_ngrams, n_matched, contaminated) — one row per corpus
    document, including documents with zero overlap.

    ``n_ngrams``  distinct k-grams in the document,
    ``n_matched`` how many of those also occur in the benchmark set,
    ``contaminated`` = n_matched >= min_matches.
    """
    bench_col = benchmark_text_col or text_col
    doc_grams = ngram_rows(docs, text_col, id_col, k).distinct()
    bench_grams = (
        ngram_rows(benchmark, bench_col, id_col, k)
        .select("gram").distinct()
    )
    totals = doc_grams.groupBy("doc_id").agg(F.count("*").alias("n_ngrams"))
    matched = (
        doc_grams.join(bench_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matched"))
    )
    return (
        totals.join(matched, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
            (F.coalesce("n_matched", F.lit(0)) >= min_matches).alias(
                "contaminated"
            ),
        )
    )
