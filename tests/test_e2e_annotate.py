"""End-to-end parity: run_annotate on the reference's own example configs and
compare against golden outputs produced by compiling and running the
reference Java on the same inputs (tests/fixtures/golden_*.csv).

The BASELINE gate is triple-extraction P/R >= 0.95 against these goldens; we
assert full equality here (P/R = 1.0 on the fixture set)."""

import csv

import pytest
from pyspark.sql import functions as F

from ahrd_spark.config import load_config
from ahrd_spark.plans.annotate import run_annotate

REF = "/root/reference"
FIXDIR = "/root/repo/tests/fixtures"


def load_golden(name):
    """Parse a reference output CSV -> {protein: row-dict}."""
    with open(f"{FIXDIR}/{name}") as fh:
        lines = [ln.rstrip("\n") for ln in fh if ln.strip() and not ln.startswith("#")]
    rdr = csv.DictReader(lines, delimiter="\t")
    return {r["Protein-Accession"]: r for r in rdr}


def run(spark, yml):
    cfg = load_config(f"{REF}/{yml}", base_dir=REF)
    out = run_annotate(spark, cfg)
    return {r["protein_acc"]: r for r in out.collect()}


def golden_triples(golden):
    """(subj, pred, obj) set from a reference output CSV."""
    triples = set()
    for acc, row in golden.items():
        desc = row["Human-Readable-Description"]
        if desc and desc != "Unknown protein":
            triples.add((acc, "hasDescription", desc))
        for go in filter(None, (row.get("Gene-Ontology-Term") or "").split(", ")):
            triples.add((acc, "hasGOTerm", go))
        ipr_cell = row.get("Interpro-ID (Description)") or ""
        # entries are "IPR000536 (name, may, contain, commas)", comma-joined
        import re

        for ipr_id in re.findall(r"IPR\d{6}", ipr_cell):
            triples.add((acc, "hasDomain", ipr_id))
    return triples


def result_triples(result):
    triples = set()
    for acc, r in result.items():
        if r["description"] and r["description"] != "Unknown protein":
            triples.add((acc, "hasDescription", r["description"]))
        for go in r["go_terms"] or []:
            triples.add((acc, "hasGOTerm", go))
        for ipr in r["interpro"] or []:
            triples.add((acc, "hasDomain", ipr["ipr_id"]))
    return triples


@pytest.mark.parametrize(
    "yml,golden_file",
    [
        ("ahrd_example_input.yml", "golden_example.csv"),
        ("ahrd_example_input_go_prediction.yml", "golden_go.csv"),
        ("test/resources/ahrd_input_test_run.yml", "golden_test_run.csv"),
    ],
)
def test_e2e_matches_reference(spark, yml, golden_file):
    golden = load_golden(golden_file)
    result = run(spark, yml)
    assert set(result) == set(golden)
    expected = golden_triples(golden)
    got = result_triples(result)
    missing = expected - got
    extra = got - expected
    assert not missing and not extra, (
        f"missing={sorted(missing)} extra={sorted(extra)}"
    )
    # winner hit accession + quality code parity
    for acc, row in golden.items():
        if row["Human-Readable-Description"] == "Unknown protein":
            assert result[acc]["hit_acc"] is None
        else:
            assert result[acc]["hit_acc"] == row["Blast-Hit-Accession"], acc
            assert result[acc]["quality_code"] == row["AHRD-Quality-Code"], acc


def test_unknown_protein_row(spark):
    result = run(spark, "test/resources/ahrd_input_test_run.yml")
    nb = result["NoBlastResults"]
    assert nb["description"] == "Unknown protein"
    assert nb["go_terms"] == [] and nb["interpro"] == []
