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


def load_golden_eval(fname="golden_evaluator.tsv"):
    """Positional parse — the reference header repeats 'Length' and
    'Evaluation-Score' for each per-db best-hit block."""
    with open(f"{FIXDIR}/{fname}") as fh:
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


def load_golden_filter_refs():
    """Golden from running the compiled reference Evaluator on
    test/resources/evaluator_filter_references_example_input.yml — the config
    that exercises references_description_blacklist / _filter /
    _token_blacklist (ReferenceDescription.java:30-45).  Differs from
    golden_evaluator.tsv on Ref-Lenght / Evaluation-Score rows, so it pins the
    knobs, not just the shared plumbing.  Same header/column layout as
    golden_evaluator.tsv (verified identical header line)."""
    return load_golden_eval("golden_evaluator_filter_refs.tsv")


def test_evaluator_filter_references_e2e(spark):
    cfg = load_config(
        f"{REF}/test/resources/evaluator_filter_references_example_input.yml",
        base_dir=REF,
    )
    assert cfg.references_description_blacklist  # knobs actually parsed
    assert cfg.references_description_filter
    assert cfg.references_token_blacklist
    out = {r["protein_acc"]: r for r in run_evaluate(spark, cfg).collect()}
    golden = load_golden_filter_refs()
    assert len(golden) == len(out)
    for g in golden:
        r = out[g["Protein-Accession"]]
        acc = g["Protein-Accession"]
        assert r["hit_acc"] == g["Blast-Hit-Accession"], acc
        assert r["description"] == g["Human-Readable-Description"], acc
        assert r["ref_description"] == g["Reference-Description"], acc
        assert r["ref_length"] == int(g["Ref-Lenght"]), acc
        assert r["eval_score"] == pytest.approx(
            float(g["Evaluation-Score"]), abs=5e-4), acc
        assert r["diff_to_best_competitor"] == pytest.approx(
            float(g["Diff-to-bestCompetitor"]), abs=5e-4), acc
        assert r["tpr"] == pytest.approx(float(g["TPR"]), abs=5e-4), acc
        assert r["fpr"] == pytest.approx(float(g["FPR"]), abs=5e-4), acc


def test_reference_filter_knob_semantics(spark):
    """ReferenceDescription.java:30-45 nesting: blacklist fail -> "" (row
    kept, empty tokens); filter applies ONLY when a blacklist is configured
    AND passes; empty blacklist -> no filtering even if a filter is set."""
    from ahrd_spark.sources.fasta import read_references_fasta

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "refs.fasta")
        with open(p, "w") as fh:
            fh.write(">P1 Putative kinase protein\nMA\n")
            fh.write(">P2 Uncharacterized protein fragment\nMA\n")
        rows = {
            r["accession"]: r
            for r in read_references_fasta(
                spark, p,
                description_blacklist=("[Uu]ncharacterized",),
                description_filter=(r"\b[Pp]utative\b",),
                token_blacklist=(r"^protein$",),
            ).collect()
        }
        # P2 fails the blacklist -> blanked, empty token set
        assert rows["P2"]["description"] == ""
        assert rows["P2"]["tokens"] == []
        # P1 passes -> filter strips "Putative", token blacklist drops protein
        assert rows["P1"]["description"] == "kinase protein"
        assert rows["P1"]["tokens"] == ["kinase"]

        # empty blacklist -> filter NOT applied
        rows2 = {
            r["accession"]: r
            for r in read_references_fasta(
                spark, p, description_filter=(r"\b[Pp]utative\b",),
            ).collect()
        }
        assert rows2["P1"]["description"] == "Putative kinase protein"
