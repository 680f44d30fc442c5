"""The mapInArrow mention-detect formulation must be row-identical to the
expression formulation — on clean synthetic docs AND on a crafted corpus
that exercises every gate branch (blacklists, ordered filters, token
blacklist, malformed rows, bad numerics, unknown dbs, non-blast spans,
short-accession fallback)."""

import pytest
from pyspark.sql import functions as F

from ahrd_spark.config import AhrdConfig, BlastDbConfig
from ahrd_spark.plans.mention_arrow import detect_mentions_arrow, re2_compatible
from ahrd_spark.plans.pipeline import detect_mentions

SPAN_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _sig(df):
    r = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*df.columns)).alias("x"),
    ).collect()[0]
    return r["n"], r["x"]


def _hit(db, acc, qs=1, qe=50, ss=2, se=60, ev="1.0E-30", bit="200.5",
         slen="300", desc="binding protein kinase"):
    return f"{acc}\t{qs}\t{qe}\t{ss}\t{se}\t{ev}\t{bit}\t{slen}\t{desc}"


def test_arrow_parity_on_synthetic(spark):
    from ahrd_spark.plans.docs import synthesize_docs
    from bench import _pipeline_cfg

    cfg = _pipeline_cfg()
    assert re2_compatible(cfg)
    docs = synthesize_docs(spark, 400, hits_per_doc=10).cache()
    expr = detect_mentions(docs, cfg).drop("media_ref", "tokens")
    arrow = detect_mentions_arrow(docs, cfg)
    assert expr.columns == arrow.columns
    assert _sig(expr) == _sig(arrow)
    assert expr.count() > 0


def test_arrow_parity_on_gate_edge_cases(spark):
    cfg = AhrdConfig(blast_dbs=(
        BlastDbConfig(
            name="swissprot", weight=100,
            description_score_bit_score_weight=0.5,
            blacklist=("(?i)hypothetical", "^predicted"),
            filter=(r"\bOS=.*$", r"(?i)fragment"),
            token_blacklist=(r"^\d+$", "(?i)^protein$"),
        ),
        BlastDbConfig(
            name="trembl", weight=50,
            description_score_bit_score_weight=0.4,
        ),
    ))
    assert re2_compatible(cfg)
    mk = lambda db: f"blast_hit:{db}"  # noqa: E731
    rows = [
        # survivors + every drop reason, mixed with non-blast spans so
        # line_no (original span index) is exercised
        ("p1", [
            (mk("swissprot"), _hit("swissprot", "sp|Q123|YFG1",
                                   desc="Kinase fragment OS=Arabidopsis"),
             None, 0),
            ("query", ">p1 hdr\nMKV\nLLL", None, 1),
            (mk("swissprot"), _hit("swissprot", "sp|Q124|YFG2",
                                   desc="hypothetical protein"), None, 2),
            (mk("trembl"), _hit("trembl", "tr|A1|A1_X"), "img://x", 3),
        ]),
        ("p2", [
            ("query", ">p2\nMK", None, 0),
            # token blacklist kills every token -> dropped in swissprot,
            # but trembl (no blacklist) keeps the same text
            (mk("swissprot"), _hit("swissprot", "sp|B1|B", desc="42 Protein"),
             None, 1),
            (mk("trembl"), _hit("trembl", "plainacc", desc="42 Protein"),
             None, 2),
            # malformed: 6 fields only
            (mk("trembl"), "acc\t1\t50\t2\t60\t1e-5", None, 3),
            # bad numerics -> dropped
            (mk("trembl"), _hit("trembl", "tr|C1|C", ev="not_a_number"),
             None, 4),
            (mk("trembl"), _hit("trembl", "tr|D1|D", qs="oops"), None, 5),
            # unknown db -> dropped
            (mk("pdb"), _hit("pdb", "x|Y|z"), None, 6),
            # empty description -> dropped
            (mk("trembl"), _hit("trembl", "tr|E1|E", desc=""), None, 7),
            # q_start == q_end -> dropped
            (mk("trembl"), _hit("trembl", "tr|F1|F", qs=5, qe=5), None, 8),
        ]),
        # doc with no blast spans at all
        ("p3", [("query", ">p3\nM", None, 0)]),
    ]
    docs = spark.createDataFrame(rows, SPAN_SCHEMA).repartition(3).cache()
    expr = detect_mentions(docs, cfg).drop("media_ref", "tokens")
    arrow = detect_mentions_arrow(docs, cfg)
    e = {tuple(r) for r in expr.collect()}
    a = {tuple(r) for r in arrow.collect()}
    assert e == a
    kept = {(r[0], r[3]) for r in e}
    assert kept == {
        ("p1", "sp|Q123|YFG1"), ("p1", "tr|A1|A1_X"), ("p2", "plainacc"),
    }
    # C3 filter applied + C8 short accession extracted vs fallback
    by_acc = {r[3]: r for r in e}
    assert by_acc["sp|Q123|YFG1"][11] == "Kinase"
    assert by_acc["sp|Q123|YFG1"][13] == "Q123"
    assert by_acc["plainacc"][13] == "plainacc"  # no pipe -> fallback
    # line_no preserves ORIGINAL span index (non-blast spans counted)
    assert by_acc["tr|A1|A1_X"][12] == 3


def test_arrow_parity_on_reference_fixtures(spark):
    """The reference's REAL regex batteries (10 blacklists, 10-14 ordered
    filters, 26 token blacklists per db) are RE2-compatible and must shred
    its real BLAST fixture data identically to the expression path."""
    from ahrd_spark.config import load_config
    from ahrd_spark.plans.docs import build_docs

    cfg = load_config("/root/reference/test/resources/ahrd_input.yml",
                      base_dir="/root/reference")
    assert re2_compatible(cfg)
    docs = build_docs(spark, cfg).cache()
    expr = detect_mentions(docs, cfg).drop("media_ref", "tokens")
    arrow = detect_mentions_arrow(docs, cfg)
    e = {tuple(r) for r in expr.collect()}
    a = {tuple(r) for r in arrow.collect()}
    assert e == a
    assert len(e) > 100


def test_re2_gate_rejects_lookbehind():
    cfg = AhrdConfig(blast_dbs=(
        BlastDbConfig(
            name="db0", weight=100, description_score_bit_score_weight=0.5,
            blacklist=(r"(?<=foo)bar",),  # lookbehind: java-only dialect
        ),
    ))
    assert not re2_compatible(cfg)


@pytest.mark.parametrize("env", ["0", "1"])
def test_pipeline_env_toggle_same_triples(spark, tmp_path, env, monkeypatch):
    """AHRD_ARROW_SHRED routes the mention stage through the Arrow shred;
    the materialized triples must be identical either way."""
    from ahrd_spark.plans.docs import synthesize_docs
    from ahrd_spark.plans.pipeline import run_pipeline
    from bench import _pipeline_cfg

    monkeypatch.setenv("AHRD_ARROW_SHRED", env)
    docs = synthesize_docs(spark, 120, hits_per_doc=6)
    out = run_pipeline(spark, docs, _pipeline_cfg(),
                       str(tmp_path / f"wd{env}"))
    rows = {tuple(r) for r in out.collect()}
    assert len(rows) == 120
    # pin one deterministic row set signature across both paths
    sig = _sig(out.select(sorted(out.columns)))
    cache = getattr(test_pipeline_env_toggle_same_triples, "_sig", None)
    if cache is None:
        test_pipeline_env_toggle_same_triples._sig = sig
    else:
        assert cache == sig
