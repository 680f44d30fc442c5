"""Evaluation operators (S1-S6) — F-beta scoring of assigned descriptions
against gold references, competitor comparison, highest-possible score.

Parity map (reference file:line, all in
src/ahrd/model/EvaluationScoreCalculator.java):
- S1 true positives      :52-61   |assigned ∩ reference|
- S2 TPR / recall        :72-74
- S3 FPR                 :88-104  |assigned \\ ref| / |allBlastTokens \\ ref|
- S4 F-beta              :133-152 (NaN if no reference tokens; 0 if no TP)
- S5 competitor delta    :175-229 eval - max(best unchanged hit per db,
                                              best Blast2GO annot)
- S6 highest possible    :237-251 max F-beta over all candidate descriptions
- H6 best unchanged hit  :163-168 per (protein, db) by bit score, first
                                  parsed wins ties
- K4 Blast2GO ranking    :259-266

All as array set-operations + hash aggregations — one shuffle per agg, all
keyed by protein.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ahrd_spark.functions.text import tokenize_expr


def fbeta_expr(assigned: Column, reference: Column, beta: float = 1.0) -> Column:
    """S4: F-beta of token sets with the reference's exact edge cases:
    NaN when the reference set is null/empty; 0.0 when there is no overlap
    or the assigned set is null/empty."""
    tp = F.size(F.array_intersect(assigned, reference)).cast("double")
    pr = tp / F.size(assigned)
    rc = tp / F.size(reference)
    b2 = beta * beta
    return (
        F.when(reference.isNull() | (F.size(reference) == 0), F.lit(float("nan")))
        .when(assigned.isNull() | (F.size(assigned) == 0), F.lit(0.0))
        .when(tp == 0, F.lit(0.0))
        .otherwise((1 + b2) * (pr * rc) / (b2 * pr + rc))
    )


def tpr_expr(assigned: Column, reference: Column) -> Column:
    """S2: |assigned ∩ reference| / |reference|."""
    tp = F.size(F.array_intersect(assigned, reference)).cast("double")
    return tp / F.size(reference)


def fpr_expr(assigned: Column, reference: Column, universe: Column) -> Column:
    """S3: |assigned \\ reference| / |universe \\ reference| (0 if the
    denominator is 0)."""
    fp = F.size(F.array_except(assigned, reference)).cast("double")
    an = F.size(F.array_except(universe, reference)).cast("double")
    return F.when(an == 0, F.lit(0.0)).otherwise(fp / an)


def eval_tokens_expr(description: Column, tokens: Column,
                     evaluate_valid_tokens: bool) -> Column:
    """T3 (BlastResult.java:450-455): evaluation tokens are the blacklisted
    tokens when ``evaluate_valid_tokens`` (default), else a fresh
    tokenization with an empty blacklist."""
    if evaluate_valid_tokens:
        return tokens
    return tokenize_expr(description)


def best_unchanged_hits(raw_with_desc: DataFrame, db_filters: dict) -> DataFrame:
    """H6: per (protein, db) the max-bitScore hit from the RAW parse (before
    blacklist/validity gating), its description passed through the per-db
    filter regexes (C3) and tokenized WITHOUT the token blacklist
    (BlastResult.java:492-504).

    raw_with_desc: hits already joined with the subject DB (columns
    protein_acc, db, hit_acc, bit_score, description, line_no).
    db_filters: db name -> tuple of filter regexes.
    """
    from ahrd_spark.functions.text import apply_filter_regexes

    filtered = F.col("description")
    for db, regs in db_filters.items():
        filtered = F.when(
            F.col("db") == db, apply_filter_regexes(F.col("description"), regs)
        ).otherwise(filtered)
    df = raw_with_desc.withColumn("filtered_desc", filtered)
    best = df.groupBy("protein_acc", "db").agg(
        F.max_by(
            F.struct("hit_acc", "description", "filtered_desc"),
            F.struct(F.col("bit_score"), (-F.col("line_no"))),
        ).alias("b")
    )
    return best.select(
        "protein_acc",
        "db",
        F.col("b.hit_acc").alias("hit_acc"),
        F.col("b.description").alias("raw_description"),
        F.col("b.filtered_desc").alias("description"),
        tokenize_expr(F.col("b.filtered_desc")).alias("eval_tokens"),
    )


def token_universe(topk: DataFrame) -> DataFrame:
    """The FPR denominator universe: distinct (blacklisted) tokens of the
    top-k candidate hits — the reference's tokenScores keySet."""
    return (
        topk.select("protein_acc", F.explode("tokens").alias("token"))
        .groupBy("protein_acc")
        .agg(F.collect_set("token").alias("universe"))
    )


def highest_possible_scores(
    topk: DataFrame, references: DataFrame, beta: float,
    evaluate_valid_tokens: bool = True,
) -> DataFrame:
    """S6: per protein the max F-beta over all candidate hits."""
    cand = topk.select(
        "protein_acc",
        eval_tokens_expr(
            F.col("description"), F.col("tokens"), evaluate_valid_tokens
        ).alias("eval_tokens"),
    )
    joined = cand.join(
        references.select(
            F.col("accession").alias("protein_acc"),
            F.col("tokens").alias("ref_tokens"),
        ),
        "protein_acc",
    )
    scored = joined.select(
        "protein_acc",
        fbeta_expr(F.col("eval_tokens"), F.col("ref_tokens"), beta).alias("f"),
    )
    # the reference starts the running max at 0.0 -> floor at 0, NaN ignored
    return scored.groupBy("protein_acc").agg(
        F.greatest(F.max(F.when(~F.isnan("f"), F.col("f"))), F.lit(0.0)).alias(
            "highest_possible_score"
        )
    )
