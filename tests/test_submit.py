"""The north-rule deployment path: spark-submit --py-files with the engine
packaged as a zip, primary script outside the package tree.

This is a real end-to-end subprocess run — a fresh JVM + fresh Python driver
whose only route to ``ahrd_spark`` is the --py-files artifact (PYTHONPATH is
scrubbed and the primary script lives in tools/, not the repo root).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_pipeline(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_pyfiles import build

    zip_path = build(str(tmp_path / "ahrd_spark.zip"))

    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                                "spark-submit")
    assert os.path.exists(spark_submit)

    env = os.environ.copy()
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    out = str(tmp_path / "triples")
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_pipeline.py"),
            "--synth", "300", "--partitions", "4",
            "--out", out, "--workdir", str(tmp_path / "ckpt"),
        ],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=str(tmp_path),  # not the repo root -> no accidental local import
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    report = None
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            report = json.loads(line)
            break
    assert report is not None, proc.stdout[-2000:]
    assert report["triples"] > 0
    assert set(report["stages"]) == {
        "mention_detect", "link_score", "canonicalize", "materialize"
    }

    # the written triples table is readable and carries the graph schema
    import duckdb

    cols = {
        r[0]
        for r in duckdb.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{out}/*.parquet')"
        ).fetchall()
    }
    assert {"subj", "pred", "obj", "obj_kind", "score", "src_db",
            "src_hit"} <= cols
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out}/*.parquet')"
    ).fetchone()[0]
    assert n == report["triples"]


def test_committed_pyfiles_artifact_is_fresh(tmp_path):
    """The committed dist/ahrd_spark.zip must be byte-identical to a
    fresh deterministic build of the source tree — a stale artifact
    makes the documented spark-submit --py-files path ImportError on
    operators added after the last rebuild (regeneration rule:
    `python tools/make_pyfiles.py` in the same commit as any
    ahrd_spark/ source change)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_pyfiles import build

    committed = os.path.join(REPO, "dist", "ahrd_spark.zip")
    assert os.path.exists(committed), (
        "dist/ahrd_spark.zip missing — run python tools/make_pyfiles.py"
    )
    fresh = build(str(tmp_path / "fresh.zip"))
    with open(committed, "rb") as a, open(fresh, "rb") as b:
        assert a.read() == b.read(), (
            "dist/ahrd_spark.zip is stale vs the source tree — "
            "regenerate with python tools/make_pyfiles.py"
        )
