"""Salted two-phase aggregation correctness + plan shape."""

from pyspark.sql import functions as F

from ahrd_spark.operators.skew import salted_agg, token_document_frequency


def test_token_document_frequency(spark):
    docs = spark.createDataFrame(
        [(1, "kinase alpha"), (2, "kinase beta"), (3, "kinase kinase gamma")],
        "doc_id bigint, text string",
    )
    out = {r["token"]: r["doc_freq"]
           for r in token_document_frequency(docs, salt_buckets=4).collect()}
    # per-doc distinct tokens -> kinase counts documents, not occurrences
    assert out["kinase"] == 3
    assert out["alpha"] == 1 and out["beta"] == 1 and out["gamma"] == 1


def test_salted_agg_matches_plain(spark):
    df = spark.range(10000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") % 13).alias("v")
    )
    salted = {
        r["k"]: (r["total"], r["n"])
        for r in salted_agg(
            df,
            key="k",
            aggs=[F.sum("v").alias("s"), F.count("*").alias("c")],
            merge_aggs=[
                F.sum("s").alias("total"),
                F.sum("c").cast("bigint").alias("n"),
            ],
            salt_buckets=8,
            salt_source="v",
        ).collect()
    }
    plain = {
        r["k"]: (r["total"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count("*").alias("n"))
        .collect()
    }
    assert salted == plain


def test_salted_agg_two_exchanges(spark):
    """Plan shape: two aggregations keyed (k, salt) then (k)."""
    df = spark.range(100).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    out = salted_agg(
        df, "k",
        aggs=[F.sum("v").alias("s")],
        merge_aggs=[F.sum("s").alias("total")],
        salt_buckets=4, salt_source="v",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 4  # partial+final per phase
