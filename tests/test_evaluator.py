"""Evaluator parity: unit goldens from EvaluationScoreCalculatorTest + full
E2E comparison against the reference Evaluator's output on
evaluator_example.yml (tests/fixtures/golden_evaluator.tsv, produced by
running the compiled reference)."""

import csv

import pytest
from pyspark.sql import functions as F

from ahrd_spark.config import load_config
from ahrd_spark.operators.evaluation import fbeta_expr, fpr_expr, tpr_expr
from ahrd_spark.plans.evaluate import run_evaluate

REF = "/root/reference"
FIXDIR = "/root/repo/tests/fixtures"


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def arr(*xs):
    return F.array(*[F.lit(x) for x in xs])


def test_fbeta_goldens(spark):
    # EvaluationScoreCalculatorTest: identical sets -> 1.0; half-overlap
    f = lambda a, r: one(spark, fbeta_expr(a, r, 1.0))  # noqa: E731
    assert f(arr("a", "b"), arr("a", "b")) == 1.0
    # assigned {a}, ref {a,b}: pr=1, rc=0.5 -> 2*0.5/1.5 = 2/3
    assert f(arr("a"), arr("a", "b")) == pytest.approx(2 / 3, abs=1e-12)
    # assigned {a,b}, ref {a,c,d,e}: pr=.5, rc=.25 -> 1/3... check formula
    assert f(arr("a", "b"), arr("a", "c", "d", "e")) == pytest.approx(
        2 * 0.5 * 0.25 / 0.75, abs=1e-12
    )
    # no reference -> NaN; no overlap -> 0
    import math

    assert math.isnan(f(arr("a"), F.array().cast("array<string>")))
    assert f(arr("x"), arr("a")) == 0.0


def test_tpr_fpr(spark):
    assert one(spark, tpr_expr(arr("a", "x"), arr("a", "b"))) == 0.5
    # fp=1 (x), universe\ref = {x,y} -> 0.5
    assert one(
        spark, fpr_expr(arr("a", "x"), arr("a", "b"), arr("a", "b", "x", "y"))
    ) == 0.5
    assert one(spark, fpr_expr(arr("a"), arr("a"), arr("a"))) == 0.0


def load_golden_eval():
    """Positional parse — the reference header repeats 'Length' and
    'Evaluation-Score' for each per-db best-hit block."""
    with open(f"{FIXDIR}/golden_evaluator.tsv") as fh:
        lines = [ln.rstrip("\n") for ln in fh
                 if ln.strip() and not ln.startswith("#")]
    rows = list(csv.reader(lines, delimiter="\t"))
    cols = [
        "Protein-Accession", "Blast-Hit-Accession", "AHRD-Quality-Code",
        "Human-Readable-Description", "Interpro", "GO", "HRD-Length",
        "Reference-Description", "Ref-Lenght", "Evaluation-Score",
        "Diff-to-bestCompetitor", "TPR", "FPR",
        "Best BlastHit against 'tair'", "tair-Length", "tair-Score",
        "Best BlastHit against 'swissprot'", "swissprot-Length",
        "swissprot-Score",
        "Best BlastHit against 'trembl'", "trembl-Length", "trembl-Score",
        "Highest-Blast-Hit-Evaluation-Score",
    ]
    assert rows[0][:4] == cols[:4]
    return [dict(zip(cols, r)) for r in rows[1:]]


@pytest.fixture(scope="module")
def eval_result(spark):
    cfg = load_config(f"{REF}/evaluator_example.yml", base_dir=REF)
    out = run_evaluate(spark, cfg)
    return {r["protein_acc"]: r for r in out.collect()}


def test_evaluator_e2e_matches_reference(eval_result):
    golden_rows = load_golden_eval()
    assert len(golden_rows) == len(eval_result)
    for g in golden_rows:
        acc = g["Protein-Accession"]
        r = eval_result[acc]
        assert r["hit_acc"] == g["Blast-Hit-Accession"], acc
        assert r["description"] == g["Human-Readable-Description"], acc
        assert r["hrd_length"] == int(g["HRD-Length"]), acc
        assert r["ref_description"] == g["Reference-Description"], acc
        assert r["ref_length"] == int(g["Ref-Lenght"]), acc
        assert r["eval_score"] == pytest.approx(
            float(g["Evaluation-Score"]), abs=5e-4), acc
        assert r["diff_to_best_competitor"] == pytest.approx(
            float(g["Diff-to-bestCompetitor"]), abs=5e-4), acc
        assert r["tpr"] == pytest.approx(float(g["TPR"]), abs=5e-4), acc
        assert r["fpr"] == pytest.approx(float(g["FPR"]), abs=5e-4), acc
        assert r["highest_possible_score"] == pytest.approx(
            float(g["Highest-Blast-Hit-Evaluation-Score"]), abs=5e-4), acc


def test_evaluator_best_unchanged_hits(eval_result):
    """Per-db competitor goldens from the reference output: lengths and
    scores of the best unchanged blast hits."""
    golden = {g["Protein-Accession"]: g for g in load_golden_eval()}
    for acc, g in golden.items():
        by_db = {b["db"]: b for b in eval_result[acc]["best_hits"]}
        for db in ("tair", "swissprot", "trembl"):
            cell = g[f"Best BlastHit against '{db}'"].strip('"')
            exp_hit = cell.split(" ")[0]
            assert by_db[db]["hit_acc"] == exp_hit, (acc, db)
