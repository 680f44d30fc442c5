"""Source-scan tests against the REAL reference fixture files
(/root/reference/test/resources), goldens from the JUnit suite."""

import pytest
from pyspark.sql import functions as F

from ahrd_spark.config import load_config
from ahrd_spark.sources.blast_tabular import read_seq_sim_table
from ahrd_spark.sources.fasta import read_query_fasta, read_subject_fasta_db
from ahrd_spark.sources.goa import read_goa
from ahrd_spark.sources.interpro import read_interpro_db, read_interpro_raw

REF = "/root/reference"


@pytest.fixture(scope="module")
def junit_cfg():
    return load_config(f"{REF}/test/resources/ahrd_input.yml", base_dir=REF)


def test_read_query_fasta(spark, ref_resources):
    df = read_query_fasta(spark, f"{ref_resources}/proteins.fasta")
    rows = {r["accession"]: r["seq_len"] for r in df.collect()}
    # FIXTURES.md / ProteinTest: 2 proteins with lengths 108 and 829
    assert rows == {
        "gene:chr01.502:mRNA:chr01.502": 108,
        "gene:chr01.1056:mRNA:chr01.1056": 829,
    }


def test_read_seq_sim_table_tair(spark, junit_cfg):
    """BlastResultTest.testParseBlastResults goldens: 207 distinct hits after
    HSP-dedup; AT3G03300.2 bit 94.4, e 2e-20, q 1-99, s 969-1067."""
    df = read_seq_sim_table(spark, junit_cfg, "tair").cache()
    assert df.select("hit_acc").distinct().count() == 207
    r = df.filter(
        (F.col("hit_acc") == "AT3G03300.2")
        & (F.col("protein_acc") == "gene:chr01.502:mRNA:chr01.502")
    ).first()
    assert r["bit_score"] == pytest.approx(94.4, abs=1e-7)
    assert abs(r["e_value"] - 1e-20) <= 1e-21
    assert (r["q_start"], r["q_end"], r["s_start"], r["s_end"]) == (1, 99, 969, 1067)


def test_read_subject_fasta_db_tair(spark, junit_cfg):
    """BlastResultTest.testParseBlastDatabase goldens: subject lengths
    AT3G03300.2 -> 1375, AT3G45420.1 -> 668."""
    db_cfg = junit_cfg.db("tair")
    df = read_subject_fasta_db(
        spark, db_cfg.fasta_db, "tair", db_cfg.fasta_header_regex
    ).cache()
    lens = {
        r["hit_acc"]: r["s_len"]
        for r in df.filter(
            F.col("hit_acc").isin("AT3G03300.2", "AT3G45420.1")
        ).collect()
    }
    assert lens == {"AT3G03300.2": 1375, "AT3G45420.1": 668}
    # headers carry descriptions
    d = df.filter(F.col("hit_acc") == "AT3G03300.2").first()["description"]
    assert "DCL2" in d


def test_read_subject_fasta_db_swissprot_default_regex(spark, junit_cfg):
    db_cfg = junit_cfg.db("swissprot")
    df = read_subject_fasta_db(
        spark, db_cfg.fasta_db, "swissprot", db_cfg.fasta_header_regex
    )
    r = df.filter(F.col("hit_acc") == "sp|Q3EBC8|DCL2_ARATH").first()
    assert r is not None
    assert r["description"].startswith("Endoribonuclease Dicer homolog 2")


def test_read_goa(spark, junit_cfg):
    """ReferenceGoAnnotationsTest goldens: filtered to hit short-accessions
    there are 4 annotated accessions; AT1G01040.1 has GO:0003824+GO:0003870."""
    goa = read_goa(
        spark,
        f"{REF}/test/resources/reference_gene_ontology_annotations_uniprotKB_GOA.txt",
    ).cache()
    gos = {
        r["go_term"]
        for r in goa.filter(F.col("short_acc") == "AT1G01040.1").collect()
    }
    assert {"GO:0003824", "GO:0003870"} <= gos


def test_read_interpro_db(spark):
    """InterproResultTest.testInitialisationOfInterproDb goldens."""
    db = read_interpro_db(spark, f"{REF}/test/resources/interpro_31.xml").cache()
    assert db.count() > 0
    r = db.filter(F.col("ipr_id") == "IPR000003").first()
    assert r["parent_id"] == "IPR001723"
    assert r["short_name"] == "Retinoid-X_rcpt"
    assert r["type"] == "Family"
    assert r["name"] == "Retinoid X receptor"
    r1 = db.filter(F.col("ipr_id") == "IPR000001").first()
    assert r1["short_name"] == "Kringle"
    ids = {x["ipr_id"] for x in db.select("ipr_id").collect()}
    assert {"IPR000535", "IPR000536"} <= ids


def test_read_interpro_raw(spark):
    """InterproResultTest.testParseInterproResults goldens: p502 -> IPR000535;
    p1056 -> IPR000006 + IPR000536 (of ids present in the DB)."""
    raw = read_interpro_raw(spark, f"{REF}/test/resources/interpro_result.raw")
    db = read_interpro_db(spark, f"{REF}/test/resources/interpro_31.xml")
    known = raw.join(db.select("ipr_id"), "ipr_id", "left_semi")
    got = {
        (r["protein_acc"], r["ipr_id"]) for r in known.collect()
    }
    assert ("gene:chr01.502:mRNA:chr01.502", "IPR000535") in got
    assert ("gene:chr01.1056:mRNA:chr01.1056", "IPR000006") in got
    assert ("gene:chr01.1056:mRNA:chr01.1056", "IPR000536") in got
    p502 = [g for g in got if g[0] == "gene:chr01.502:mRNA:chr01.502"]
    p1056 = [g for g in got if g[0] == "gene:chr01.1056:mRNA:chr01.1056"]
    assert len(p502) == 1 and len(p1056) == 2
