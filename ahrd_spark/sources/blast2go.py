"""Blast2GO .annot scan (A10, evaluation competitor).

Parity: Blast2GoAnnot.fromBlast2GoEntry (Blast2GoAnnot.java:15-31) — tab
split, col 0 = accession, col 2 = description (col 1, the GO term, ignored
here); duplicate descriptions per accession collapse; evaluation tokens are
tokenized WITHOUT any blacklist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ahrd_spark.functions.text import tokenize_expr


def read_blast2go(spark: SparkSession, path: str) -> DataFrame:
    """blast2go(protein_acc, description, eval_tokens) — distinct per
    (accession, description)."""
    df = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    return (
        df.select(
            F.trim(F.get(parts, 0)).alias("protein_acc"),
            F.trim(F.get(parts, 2)).alias("description"),
        )
        .filter(
            F.col("protein_acc").isNotNull()
            & (F.col("protein_acc") != "")
            & F.col("description").isNotNull()
            & (F.col("description") != "")
        )
        .distinct()
        .withColumn("eval_tokens", tokenize_expr(F.col("description")))
    )
