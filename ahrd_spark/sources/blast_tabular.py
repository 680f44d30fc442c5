"""Tabular sequence-similarity-search scan (BLAST8 / BLAT) + HSP dedup.

Parity:
- A3 scan   BlastResult.java:194-227 — line-at-a-time; skip lines fully
  matching the comment regex; split on the configured separator; pick fields
  by configured 0-based column index; repair 'e-105' -> '1e-105'.
- A4 dedup  BlastResult.java:240-275 — per (query, subject) keep only the
  max-bitScore HSP; on ties the FIRST parsed line wins (the reference
  replaces only on strictly-greater bit score), which we reproduce with the
  file line number as tie-break.

Scale: this is a plain splittable text scan -> projection -> one partial
aggregation (max_by) keyed by (protein_acc, hit_acc).  The groupBy is
map-side combinable; no wide row explosion before the dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ahrd_spark.config import AhrdConfig
from ahrd_spark.functions.text import repair_double_expr


def read_seq_sim_table(
    spark: SparkSession, cfg: AhrdConfig, db_name: str, path: str | None = None
) -> DataFrame:
    """raw_hits(db, protein_acc, hit_acc, q_start, q_end, s_start, s_end,
    e_value, bit_score, line_no) — HSP-deduplicated (A4 applied).

    ``line_no`` is the per-file physical order used for deterministic
    tie-breaks mirroring the reference's parse order.
    """
    if path is None:
        path = cfg.db(db_name).seq_sim_table
    df = spark.read.text(path)
    # monotonically_increasing_id is increasing in file order within a scan
    # of a single file — our stand-in for the reference's parse order.
    df = df.withColumn("line_no", F.monotonically_increasing_id())
    comment_re = cfg.seq_sim_search_table_comment_line_regex
    if comment_re:
        # Reference uses Matcher.matches() — whole-line match
        df = df.filter(~F.col("value").rlike(f"^(?:{comment_re})$"))
    df = df.filter(F.trim(F.col("value")) != "")
    parts = F.split(F.col("value"), cfg.seq_sim_search_table_sep)
    hits = df.select(
        F.lit(db_name).alias("db"),
        parts[cfg.seq_sim_search_table_query_col].alias("protein_acc"),
        parts[cfg.seq_sim_search_table_subject_col].alias("hit_acc"),
        parts[cfg.seq_sim_search_table_query_start_col].cast("int").alias("q_start"),
        parts[cfg.seq_sim_search_table_query_end_col].cast("int").alias("q_end"),
        parts[cfg.seq_sim_search_table_subject_start_col].cast("int").alias("s_start"),
        parts[cfg.seq_sim_search_table_subject_end_col].cast("int").alias("s_end"),
        repair_double_expr(parts[cfg.seq_sim_search_table_e_value_col])
        .cast("double")
        .alias("e_value"),
        parts[cfg.seq_sim_search_table_bit_score_col].cast("double").alias("bit_score"),
        F.col("line_no"),
    )
    return dedup_hsps(hits)


def dedup_hsps(hits: DataFrame) -> DataFrame:
    """A4: per (db, protein_acc, hit_acc) keep the max-bitScore HSP; ties ->
    lowest line_no (first parsed).  Expressed as max_by over a struct so it
    runs as a partial+final hash aggregation (no window shuffle-sort)."""
    payload = F.struct(
        *[F.col(c) for c in hits.columns if c not in ("db", "protein_acc", "hit_acc")]
    )
    # order key: bit_score DESC then line_no ASC == max_by(struct(bit, -line))
    best = hits.groupBy("db", "protein_acc", "hit_acc").agg(
        F.max_by(
            payload, F.struct(F.col("bit_score"), (-F.col("line_no")).alias("neg_line"))
        ).alias("p")
    )
    return best.select("db", "protein_acc", "hit_acc", "p.*")
