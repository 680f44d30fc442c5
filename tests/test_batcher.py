"""Batcher-style directory ingestion (Batcher.java:70-114 pairing semantics,
re-expressed as one unioned, doc_id-partitioned docs table)."""

import os
import shutil

import pytest
import yaml
from pyspark.sql import functions as F

from ahrd_spark.config import load_config
from ahrd_spark.plans.batcher import (
    build_docs_batched,
    discover_batches,
    find_batch_file,
)
from ahrd_spark.plans.docs import build_docs

REF = "/root/reference"
RES = f"{REF}/test/resources"


def test_find_batch_file_pairing_semantics(tmp_path):
    d = tmp_path / "results"
    d.mkdir()
    for n in ("Batch001.PAIRWISE", "batch002.txt", "other.txt"):
        (d / n).write_text("")
    # case-insensitive, extension-stripped match (Batcher.java:93-114)
    assert find_batch_file(str(d), "batch001.fasta").endswith("Batch001.PAIRWISE")
    assert find_batch_file(str(d), "BATCH002.fa").endswith("batch002.txt")
    assert find_batch_file(str(d), "batch999.fasta") is None
    # ambiguity -> error
    (d / "batch002.csv").write_text("")
    with pytest.raises(ValueError):
        find_batch_file(str(d), "batch002.fasta")


def test_discover_batches_on_reference_layout():
    """The reference's own batcher example: 3 batches, each paired with its
    per-DB results, GO, and InterPro files."""
    cfgs = discover_batches(f"{REF}/batcher_input_example.yml", base_dir=REF)
    assert len(cfgs) == 3
    for i, cfg in enumerate(cfgs, start=1):
        assert cfg.proteins_fasta.endswith(f"batch00{i}.fasta")
        for db in ("swissprot", "tair", "trembl"):
            assert cfg.db(db).seq_sim_table.endswith(f"batch00{i}.pairwise")
        assert cfg.gene_ontology_result.endswith(f"batch00{i}.csv")
        assert cfg.interpro_result.endswith(f"batch00{i}.raw")


@pytest.fixture()
def batched_layout(tmp_path):
    """Split the 2-protein ahrd_example fixture set into 2 batches: one
    protein + its blast hits per batch; subject DBs shared."""
    accs = ["gene:chr01.502:mRNA:chr01.502", "gene:chr01.1056:mRNA:chr01.1056"]
    pdir = tmp_path / "proteins"
    pdir.mkdir()
    with open(f"{RES}/proteins.fasta") as fh:
        records = ["" + r for r in fh.read().split(">") if r.strip()]
    for i, acc in enumerate(accs, start=1):
        rec = next(r for r in records if r.startswith(acc))
        (pdir / f"batch00{i}.fasta").write_text(">" + rec)

    raw = yaml.safe_load(open(f"{REF}/ahrd_example_input.yml"))
    for db, m in raw["blast_dbs"].items():
        ddir = tmp_path / f"{db}_results"
        ddir.mkdir()
        src = os.path.join(REF, m.pop("file").lstrip("./"))
        lines = open(src).read().splitlines(keepends=True)
        for i, acc in enumerate(accs, start=1):
            (ddir / f"batch00{i}.blast8").write_text(
                "".join(ln for ln in lines if ln.startswith(acc))
            )
        m["dir"] = str(ddir)
        m["database"] = os.path.join(REF, m["database"].lstrip("./"))
        for k in ("blacklist", "filter", "token_blacklist"):
            m[k] = os.path.join(REF, m[k].lstrip("./"))
    raw["proteins_dir"] = str(pdir)
    del raw["proteins_fasta"]
    yml = tmp_path / "batcher.yml"
    yml.write_text(yaml.safe_dump(raw))
    return str(yml)


def test_build_docs_batched_equals_single_run(spark, batched_layout, tmp_path):
    """The unioned batched docs table carries the same docs and the same
    per-doc span multiset as one unbatched build over the full files."""
    batched = build_docs_batched(spark, batched_layout, num_partitions=4)
    single = build_docs(
        spark, load_config(f"{REF}/ahrd_example_input.yml", base_dir=REF)
    )

    def doc_kinds(df):
        return {
            r["doc_id"]: sorted(s["kind"] for s in r["spans"])
            for r in df.collect()
        }

    b, s = doc_kinds(batched.drop("batch")), doc_kinds(single)
    assert set(b) == set(s) and len(b) == 2
    for k in b:
        assert b[k] == s[k]
    # provenance column maps each doc to its own batch
    batches = {
        r["doc_id"]: r["batch"]
        for r in batched.select("doc_id", "batch").distinct().collect()
    }
    assert batches["gene:chr01.502:mRNA:chr01.502"] == "batch001"
    assert batches["gene:chr01.1056:mRNA:chr01.1056"] == "batch002"
