"""The evaluator run — Evaluator.main (§3.2) as one declarative plan.

Produces, per query protein, the reference's evaluator output columns as
data (OutputWriter.java:35-38,64-66,134-178):
  winner columns + hrd_length, ref_description, ref_length, eval_score,
  diff_to_best_competitor, tpr, fpr,
  best_hits ARRAY<STRUCT<db, hit_acc, description, length, eval_score>>
  (the per-db 'best unchanged blast hit' competitors),
  b2g_description, b2g_length, b2g_score (best Blast2GO annotation),
  highest_possible_score (when find_highest_possible_evaluation_score).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ahrd_spark.config import AhrdConfig
from ahrd_spark.operators.evaluation import (
    best_unchanged_hits,
    eval_tokens_expr,
    fbeta_expr,
    fpr_expr,
    highest_possible_scores,
    token_universe,
    tpr_expr,
)
from ahrd_spark.operators.scoring import select_winners, with_overlap
from ahrd_spark.plans.annotate import (
    load_candidate_hits,
    load_raw_hits_with_desc,
    score_candidates,
)
from ahrd_spark.sources.blast2go import read_blast2go
from ahrd_spark.sources.fasta import read_query_fasta, read_references_fasta


def run_evaluate(spark: SparkSession, cfg: AhrdConfig) -> DataFrame:
    beta = cfg.f_measure_beta_parameter

    proteins = read_query_fasta(spark, cfg.proteins_fasta).select(
        F.col("accession").alias("protein_acc")
    )
    refs = read_references_fasta(
        spark,
        cfg.references_fasta,
        description_blacklist=cfg.references_description_blacklist,
        description_filter=cfg.references_description_filter,
        token_blacklist=cfg.references_token_blacklist,
    ).select(
        F.col("accession").alias("protein_acc"),
        F.col("description").alias("ref_description"),
        F.col("tokens").alias("ref_tokens"),
    )

    hits = load_candidate_hits(spark, cfg)
    scored = score_candidates(hits, cfg)  # top-k with tokens + desc scores
    winners = select_winners(with_overlap(scored))

    # AHRD's own evaluation tokens (T3)
    winner_eval = winners.select(
        "protein_acc",
        "hit_acc",
        "description",
        eval_tokens_expr(
            F.col("description"), F.col("tokens"), cfg.evaluate_valid_tokens
        ).alias("eval_tokens"),
    )
    universe = token_universe(scored)

    ahrd_scores = (
        winner_eval.join(refs, "protein_acc")
        .join(universe, "protein_acc", "left")
        .select(
            "protein_acc",
            F.size("eval_tokens").cast("bigint").alias("hrd_length"),
            "ref_description",
            F.size("ref_tokens").cast("bigint").alias("ref_length"),
            fbeta_expr(F.col("eval_tokens"), F.col("ref_tokens"), beta).alias(
                "eval_score"
            ),
            tpr_expr(F.col("eval_tokens"), F.col("ref_tokens")).alias("tpr"),
            fpr_expr(
                F.col("eval_tokens"),
                F.col("ref_tokens"),
                F.coalesce("universe", F.array().cast("array<string>")),
            ).alias("fpr"),
        )
    )

    # competitors: best unchanged hit per db (H6) ...
    raw = load_raw_hits_with_desc(spark, cfg)
    unchanged = best_unchanged_hits(
        raw, {d.name: d.filter for d in cfg.blast_dbs}
    )
    unchanged_scored = unchanged.join(refs, "protein_acc").select(
        "protein_acc",
        "db",
        "hit_acc",
        "raw_description",
        F.size("eval_tokens").cast("bigint").alias("length"),
        fbeta_expr(F.col("eval_tokens"), F.col("ref_tokens"), beta).alias(
            "eval_score"
        ),
    )
    best_hits = unchanged_scored.groupBy("protein_acc").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "db", "hit_acc",
                    F.col("raw_description").alias("description"),
                    "length", "eval_score",
                )
            )
        ).alias("best_hits"),
        F.max(F.when(~F.isnan("eval_score"), F.col("eval_score"))).alias(
            "__best_unchanged"
        ),
    )

    # ... and Blast2GO (A10 + K4)
    b2g_best = None
    if cfg.blast2go:
        b2g = read_blast2go(spark, cfg.blast2go)
        b2g_scored = b2g.join(refs, "protein_acc").select(
            "protein_acc",
            "description",
            F.size("eval_tokens").cast("bigint").alias("length"),
            fbeta_expr(F.col("eval_tokens"), F.col("ref_tokens"), beta).alias(
                "eval_score"
            ),
        )
        b2g_best = b2g_scored.groupBy("protein_acc").agg(
            F.max_by(
                F.struct("description", "length", "eval_score"),
                F.struct(F.col("eval_score"), F.col("description")),
            ).alias("b")
        ).select(
            "protein_acc",
            F.col("b.description").alias("b2g_description"),
            F.col("b.length").alias("b2g_length"),
            F.col("b.eval_score").alias("b2g_score"),
        )

    out = (
        proteins.join(
            winners.select("protein_acc", "hit_acc", "description"),
            "protein_acc",
            "left",
        )
        .join(ahrd_scores.drop("hit_acc", "description"), "protein_acc", "left")
        .join(best_hits, "protein_acc", "left")
    )
    if b2g_best is not None:
        out = out.join(b2g_best, "protein_acc", "left")
    else:
        out = (
            out.withColumn("b2g_description", F.lit(None).cast("string"))
            .withColumn("b2g_length", F.lit(None).cast("bigint"))
            .withColumn("b2g_score", F.lit(None).cast("double"))
        )
    # S5: eval - max(competitors); the running max starts at 0.0
    best_comp = F.greatest(
        F.coalesce(F.col("__best_unchanged"), F.lit(0.0)),
        F.coalesce(
            F.when(~F.isnan("b2g_score"), F.col("b2g_score")), F.lit(0.0)
        ),
        F.lit(0.0),
    )
    out = out.withColumn(
        "diff_to_best_competitor",
        F.when(
            F.col("eval_score").isNotNull(), F.col("eval_score") - best_comp
        ),
    ).drop("__best_unchanged")

    if cfg.find_highest_possible_evaluation_score:
        hp = highest_possible_scores(
            scored,
            refs.select(F.col("protein_acc").alias("accession"),
                        F.col("ref_tokens").alias("tokens")),
            beta,
            cfg.evaluate_valid_tokens,
        )
        out = out.join(hp, "protein_acc", "left")
    else:
        out = out.withColumn(
            "highest_possible_score", F.lit(None).cast("double")
        )
    return out
