"""JSONL ingestion quarantine + physical-layout maintenance tests."""

import os

from pyspark.sql import functions as F


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    from ahrd_spark.sources.jsonl import read_jsonl

    p = tmp_path / "docs.jsonl"
    lines = [
        '{"doc_id": 1, "text": "alpha"}',
        '{"doc_id": 2, "text": "beta"}',
        '{"doc_id": 3, "text": "gam',            # truncated write
        "not json at all",
        '{"doc_id": 4, "text": "delta"}',
    ]
    p.write_text("\n".join(lines) + "\n")
    good, bad = read_jsonl(spark, str(p))
    rows = {r["doc_id"]: r["text"] for r in good.collect()}
    assert rows == {1: "alpha", 2: "beta", 4: "delta"}
    assert good.columns == ["doc_id", "text"]
    quarantined = sorted(r["raw"] for r in bad.collect())
    assert quarantined == sorted(['{"doc_id": 3, "text": "gam',
                                  "not json at all"])


def test_write_partitioned_prunes_and_sorts(spark, tmp_path):
    from ahrd_spark.plans.layout import write_partitioned

    df = spark.createDataFrame(
        [(k, i, float(i % 7)) for k in ("a", "b") for i in range(50)],
        "part string, id bigint, v double",
    )
    out = str(tmp_path / "t")
    write_partitioned(df, out, ["part"], sort_cols=["id"])
    # hive layout on disk
    assert sorted(
        d for d in os.listdir(out) if d.startswith("part=")
    ) == ["part=a", "part=b"]
    back = spark.read.parquet(out)
    assert back.count() == 100
    # partition pruning visible in the scan
    plan = back.filter(F.col("part") == "a")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "part=a" in plan or "PartitionFilters" in plan
    assert back.filter(F.col("part") == "a").count() == 50


def test_compact_parquet_hits_file_target(spark, tmp_path):
    from ahrd_spark.plans.layout import compact_parquet, parquet_bytes

    src = str(tmp_path / "many")
    dst = str(tmp_path / "few")
    # 40 tiny files
    spark.range(0, 4000).repartition(40).write.parquet(src)
    n_small = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_small == 40
    total = parquet_bytes(src)
    assert total > 0
    n = compact_parquet(spark, src, dst, target_bytes=total)
    assert n == 1
    n_big = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_big == 1
    assert spark.read.parquet(dst).count() == 4000


def test_sqlsh_registers_views_and_runs(spark):
    from ahrd_spark.sqlsh import register_views, run_sql

    names = register_views(spark, "/root/testdata/sf0.001")
    assert {"lineitem", "documents", "events"} <= set(names)
    df = run_sql(
        spark,
        "/root/testdata/sf0.001",
        "SELECT l_returnflag, count(*) AS n FROM lineitem "
        "GROUP BY l_returnflag",
    )
    rows = {r["l_returnflag"]: r["n"] for r in df.collect()}
    assert sum(rows.values()) == spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet"
    ).count()


def test_admission_report_shape(spark):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from admission_report import build_report

    rep = build_report(spark, "/root/testdata/sf0.001")
    assert rep["docs"] == 500
    assert 0.0 <= rep["exact_dup_rate"] <= 1.0
    assert rep["total_tokens"] > 0
    assert set(rep["quality_quartiles"]) == {"q25", "q50", "q75"}
    assert sum(rep["languages"].values()) == 500
    cols = {c["col_name"] for c in rep["columns"]}
    assert {"doc_id", "text"} <= cols
