"""Skew mitigation: salted two-phase aggregation for hot keys.

Inside the scoring core every shuffle is keyed by protein (see scoring.py
scale notes), so hot descriptor tokens never form a hot reduce key there.
The place token skew DOES strike is corpus-level descriptor statistics —
document frequency, global token counts over 10^12 docs — where "protein"/
"kinase" dwarf the long tail.  The standard fix: salt the hot key space
into ``salt_buckets`` sub-keys, partially aggregate, then merge the small
per-salt partials (north rule; AQE's skew-join handling covers joins, this
covers aggregations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list[Column],
    merge_aggs: list[Column],
    salt_buckets: int = 32,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase aggregation over a possibly-skewed ``key``:

    phase 1: groupBy(key, salt) with ``aggs``   (hot key spread over
             salt_buckets reducers, map-side combine still applies)
    phase 2: groupBy(key) with ``merge_aggs``   (at most salt_buckets rows
             per key — trivially small)

    ``aggs`` aggregate the raw rows; ``merge_aggs`` combine the phase-1
    partial columns (refer to them by their phase-1 aliases).  The salt is
    derived from ``salt_source`` (a column name; defaults to
    spark_partition_id so it is uniform and costs nothing).
    """
    salt = (
        (F.xxhash64(F.col(salt_source)) % salt_buckets)
        if salt_source
        else (F.spark_partition_id() % salt_buckets)
    )
    partial = df.withColumn("__salt", salt).groupBy(key, "__salt").agg(*aggs)
    return partial.groupBy(key).agg(*merge_aggs)


def token_document_frequency(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt_buckets: int = 32,
) -> DataFrame:
    """(token, doc_freq): number of documents containing each token —
    salted so web-scale stopwords don't pin a single reducer.

    Tokens are already distinct per document (the tokenizer returns a set),
    so counting rows counts documents."""
    from ahrd_spark.functions.text import tokenize_expr

    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_expr(F.col(text_col))).alias("token"),
    )
    return salted_agg(
        exploded,
        key="token",
        aggs=[F.count("*").alias("partial_count")],
        merge_aggs=[F.sum("partial_count").cast("bigint").alias("doc_freq")],
        salt_buckets=salt_buckets,
        salt_source="doc_id",
    )
