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


def link_prediction_metrics(
    scores: DataFrame,
    k_values: tuple[int, ...] = (1, 3, 10),
    query_col: str = "query_id",
    cand_col: str = "candidate",
    score_col: str = "score_r",
    gold_col: str = "is_gold",
) -> DataFrame:
    """Link-prediction ranking evaluation -> ONE row
    ``(n_gold, mrr_r, hits1_r, hits3_r, hits10_r, ...)``: the standard
    KG-embedding metrics (Bordes et al., NIPS 2013 protocol) computed
    over a scored candidate table — downstream of the embedding-prep
    pipeline once a model scores (query, candidate) pairs.

    ``scores``: (query, candidate) rows with a rounded score and an
    ``is_gold`` flag; several golds per query are allowed (each is
    ranked against ALL of its query's candidates, gold or not).
    Duplicate (query, candidate) rows are collapsed FIRST — max score,
    OR of the gold flags — so the operator is well-defined on any
    input (a duplicated gold row must not both undercount n_gold and
    inflate the equal-tie count; the panel is a set of candidates, not
    a multiset).

    Tie protocol: the REALISTIC (mean) rank —
    ``1 + #{stronger} + #{equal-scored others}/2`` — the convention that
    neither rewards (optimistic) nor punishes (pessimistic) a model for
    emitting ties; deterministic, and computed on the ROUND-6 score so
    engine ulp noise cannot flip a rank.  Hits@k counts golds with
    realistic rank <= k.

    No reference analog (AHRD evaluates token F-beta, S1-S6); this
    serves the KG-embedding training loop.

    Scale shape: one query-keyed equi-join of the gold slice against
    the full candidate table (both sides hash-partitioned by query;
    fan-out bounded by candidates-per-query, the caller's panel size),
    one (query, gold) aggregate, then a 1-row global aggregate.
    """
    q = F.col(query_col)
    s = F.round(F.col(score_col), 6)
    base = (
        scores.select(
            q.alias("q"), F.col(cand_col).alias("c"), s.alias("s"),
            F.col(gold_col).cast("boolean").alias("g"),
        )
        .groupBy("q", "c")
        .agg(F.max("s").alias("s"), F.bool_or("g").alias("g"))
    )
    gold = base.where("g").select(
        F.col("q"), F.col("c").alias("gc"), F.col("s").alias("gs")
    )
    ranked = (
        gold.join(base.select("q", "c", "s"), "q")
        .groupBy("q", "gc", "gs")
        .agg(
            F.sum(F.when(F.col("s") > F.col("gs"), 1).otherwise(0)).alias(
                "higher"
            ),
            (
                F.sum(
                    F.when(F.col("s") == F.col("gs"), 1).otherwise(0)
                )
                - 1
            ).alias("equal_others"),
        )
        .select(
            (
                F.lit(1.0)
                + F.col("higher")
                + F.col("equal_others") / F.lit(2.0)
            ).alias("rank")
        )
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_gold"),
        F.round(F.avg(F.lit(1.0) / F.col("rank")), 6).alias("mrr_r"),
    ]
    for k in k_values:
        aggs.append(
            F.round(
                F.avg(
                    F.when(F.col("rank") <= k, 1.0).otherwise(0.0)
                ),
                6,
            ).alias(f"hits{k}_r")
        )
    return ranked.agg(*aggs)


def calibration_bins(
    preds: DataFrame,
    n_bins: int = 10,
    prob_col: str = "prob_r",
    label_col: str = "label",
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier ->
    ``(bin, n, conf_r, acc_r, ece_r)``: equal-width probability bins
    (prob 1.0 folds into the top bin), each with its count, mean
    predicted probability (confidence), and empirical positive rate
    (accuracy); ``ece_r`` repeats the scalar Expected Calibration Error
    ``sum n_b/N * |acc_b - conf_b|`` on every row (Naeini et al., AAAI
    2015) — the quality-classifier health check a curation pipeline
    monitors before trusting thresholds.

    Probabilities are consumed at ROUND-6 (the repo's float-gate
    convention), so bin membership cannot flip on engine ulp noise.

    Scale shape: one n_bins-row hash aggregate with map-side partials,
    then a 1-row ECE aggregate joined back — output bounded by n_bins.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    p = F.round(F.col(prob_col), 6)
    b = F.least(
        F.floor(p * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    per_bin = (
        preds.select(
            b.alias("bin"),
            p.alias("p"),
            F.col(label_col).cast("double").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg("p"), 6).alias("conf_r"),
            F.round(F.avg("y"), 6).alias("acc_r"),
        )
    )
    ece = per_bin.agg(
        F.round(
            F.sum(
                F.col("n") * F.abs(F.col("acc_r") - F.col("conf_r"))
            )
            / F.sum("n"),
            6,
        ).alias("ece_r")
    )
    return per_bin.crossJoin(ece)
