"""One-shot corpus admission report — the go/no-go artifact a data
pipeline emits before a delivered document table joins the training
mixture.

Composes the engine's census operators over ONE SparkSession and prints
a single JSON object:

- per-column profile (nulls / cardinality / ranges) — ``table_profile``;
- exact duplicate rate (content-hash) — the first dedup gate;
- language distribution — ``lang_id_expr``;
- quality-score distribution (mean + interpolated quartiles);
- token volume (whitespace tokens, the budget currency).

Usage: ``python tools/admission_report.py [sf_dir]``

Every number is a Spark aggregate; nothing is collected except the
final per-column/per-language summaries (bounded by schema width and
language count, not data size).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def build_report(spark, sf_dir: str) -> dict:
    from ahrd_spark.operators.profile import group_quantiles, table_profile
    from ahrd_spark.operators.textstats import (
        lang_id_expr,
        quality_score_expr,
        ws_token_count_expr,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    profile = [r.asDict() for r in table_profile(docs).collect()]

    scored = docs.select(
        F.md5("text").alias("h"),
        lang_id_expr(F.col("text")).alias("lang"),
        quality_score_expr(F.col("text")).alias("q"),
        ws_token_count_expr(F.col("text")).alias("toks"),
    )
    totals = scored.agg(
        F.count(F.lit(1)).alias("docs"),
        F.count_distinct("h").alias("distinct_docs"),
        F.round(F.avg("q"), 6).alias("mean_quality"),
        F.sum("toks").alias("total_tokens"),
    ).collect()[0]
    langs = {
        r["lang"]: r["n"]
        for r in scored.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    quartiles = {
        f"q{int(r['q'] * 100)}": round(r["quantile"], 6)
        for r in group_quantiles(
            scored.withColumn("_g", F.lit(1)), ["_g"], "q",
            [0.25, 0.5, 0.75],
        ).collect()
    }
    docs_n = totals["docs"]
    return {
        "sf_dir": sf_dir,
        "docs": docs_n,
        "exact_dup_rate": round(
            1.0 - totals["distinct_docs"] / docs_n, 6
        ) if docs_n else None,
        "total_tokens": totals["total_tokens"],
        "mean_quality": totals["mean_quality"],
        "quality_quartiles": quartiles,
        "languages": langs,
        "columns": profile,
    }


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    from ahrd_spark.session import get_spark

    spark = get_spark(app_name="ahrd_spark_admission")
    print(json.dumps(build_report(spark, sf_dir), default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
