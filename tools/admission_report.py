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
        "interleaved": interleaved_section(spark, sf_dir),
    }


def interleaved_section(spark, sf_dir: str) -> dict:
    """Interleaved-corpus admission block over the span-table view of the
    same documents (the BASELINE input_hint shape): structural integrity
    (offset-order violations), media/text composition, gate pass rate
    with per-reason counts, content-fingerprint dup rate, and cross-doc
    media sharing.  All Spark aggregates; the only collected frames are
    the bounded reason/summary rows."""
    import __spark_entry__ as entry
    from ahrd_spark.operators.interleaved import (
        media_ref_dedup,
        media_text_gate,
        span_fingerprint,
        span_stats,
    )

    idocs = entry.interleaved_docs(spark, sf_dir)
    stats = span_stats(idocs)
    s = stats.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_spans").alias("spans"),
        F.sum("n_media").alias("media_spans"),
        F.round(F.avg("media_ratio"), 6).alias("mean_media_ratio"),
        F.sum(
            (F.col("offset_violations") > 0).cast("int")
        ).alias("docs_with_offset_violations"),
    ).collect()[0]
    gate = media_text_gate(idocs, max_media_ratio=0.5, min_text_chars=60)
    reasons = {
        r["drop_reason"]: r["n"]
        for r in gate.filter(~F.col("keep"))
        .groupBy("drop_reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kept = gate.filter(F.col("keep")).count()
    fp = span_fingerprint(idocs).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("span_fp").alias("distinct_fp"),
    ).collect()[0]
    shared = media_ref_dedup(idocs, min_docs=2).agg(
        F.count(F.lit(1)).alias("shared_refs"),
        F.coalesce(F.max("n_docs"), F.lit(0)).alias("hottest_ref_docs"),
    ).collect()[0]
    return {
        "docs": s["docs"],
        "spans": s["spans"],
        "media_spans": s["media_spans"],
        "mean_media_ratio": s["mean_media_ratio"],
        "docs_with_offset_violations": s["docs_with_offset_violations"],
        "gate_pass_rate": round(kept / s["docs"], 6) if s["docs"] else None,
        "gate_drop_reasons": reasons,
        "span_fp_dup_rate": round(
            1.0 - fp["distinct_fp"] / fp["n"], 6
        ) if fp["n"] else None,
        "shared_media_refs": shared["shared_refs"],
        "hottest_ref_docs": shared["hottest_ref_docs"],
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
