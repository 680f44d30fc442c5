"""Docs->triples pipeline tests: golden parity, span-sequence invariant,
checkpoint lineage + exact resume, connected-components canonicalization."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from ahrd_spark.config import load_config
from ahrd_spark.operators.connected_components import (
    canonical_map,
    connected_components,
)
from ahrd_spark.plans.docs import build_docs, docs_to_hits, span_fingerprint
from ahrd_spark.plans.pipeline import (
    detect_mentions,
    gate_candidates_multi,
    run_pipeline,
)

from test_e2e_annotate import golden_triples, load_golden

REF = "/root/reference"


@pytest.fixture(scope="module")
def test_run_cfg():
    return load_config(f"{REF}/test/resources/ahrd_input_test_run.yml", base_dir=REF)


@pytest.fixture(scope="module")
def docs(spark, test_run_cfg):
    return build_docs(spark, test_run_cfg).cache()


def test_docs_shape_and_roundtrip(spark, docs, test_run_cfg):
    rows = {r["doc_id"]: r["spans"] for r in docs.collect()}
    assert set(rows) == {
        "NoBlastResults",
        "gene:chr01.502:mRNA:chr01.502",
        "gene:chr01.1056:mRNA:chr01.1056",
    }
    spans502 = rows["gene:chr01.502:mRNA:chr01.502"]
    assert spans502[0]["kind"] == "query"
    assert [s["offset"] for s in spans502] == list(range(len(spans502)))
    kinds = {s["kind"] for s in spans502}
    assert {"blast_hit:swissprot", "blast_hit:tair", "blast_hit:trembl",
            "interpro_hit"} <= kinds
    # shredding docs back into hits reproduces the direct-scan row counts:
    hits = docs_to_hits(docs)
    assert hits.filter(F.col("db") == "tair").count() == 207
    # qlen recovered from the query span sequence text
    qlens = {
        r["protein_acc"]: r["qlen"]
        for r in hits.select("protein_acc", "qlen").distinct().collect()
    }
    assert qlens["gene:chr01.502:mRNA:chr01.502"] == 108
    assert qlens["gene:chr01.1056:mRNA:chr01.1056"] == 829


def test_detect_mentions_matches_composed_gate(spark, docs, test_run_cfg):
    """The fused pre-explode formulation (detect_mentions) must be row-equal
    to the relational twin gate_candidates_multi(docs_to_hits(docs)) —
    same rows, same schema, same column order.  This is the parity pin the
    production pipeline relies on (pipeline.py uses the fused path; the
    oracles were written against the composed semantics)."""
    fused = detect_mentions(docs, test_run_cfg)
    composed = gate_candidates_multi(docs_to_hits(docs), test_run_cfg)
    assert fused.columns == composed.columns
    assert [f.dataType for f in fused.schema.fields] == [
        f.dataType for f in composed.schema.fields
    ]
    key = lambda r: (r["protein_acc"], r["line_no"])  # noqa: E731
    f_rows = sorted((r.asDict(recursive=True) for r in fused.collect()), key=key)
    c_rows = sorted(
        (r.asDict(recursive=True) for r in composed.collect()), key=key
    )
    assert f_rows == c_rows
    assert len(f_rows) > 200  # non-trivial fixture coverage


def test_detect_mentions_synthetic_parity(spark):
    """Parity on the synthetic docs generator too (multi-db configs with
    differing blacklist/filter/token settings), so the fused when()-branch
    grouping is exercised beyond the reference fixture's three DBs."""
    from ahrd_spark.config import AhrdConfig, BlastDbConfig
    from ahrd_spark.plans.docs import synthesize_docs

    cfg = AhrdConfig(
        blast_dbs=(
            BlastDbConfig(
                name="db0", weight=100,
                description_score_bit_score_weight=0.2,
            ),
            BlastDbConfig(
                name="db1",
                weight=50,
                description_score_bit_score_weight=0.4,
                blacklist=("(?i)unknown protein",),
                filter=("\\sOS=.*$",),
                token_blacklist=("(?i)^\\d+$",),
            ),
            BlastDbConfig(
                name="db2", weight=10,
                description_score_bit_score_weight=0.4,
            ),
        )
    )
    docs = synthesize_docs(spark, n_docs=300)
    fused = detect_mentions(docs, cfg)
    composed = gate_candidates_multi(docs_to_hits(docs), cfg)
    assert fused.columns == composed.columns
    key = lambda r: (r["protein_acc"], r["line_no"])  # noqa: E731
    f_rows = sorted((r.asDict(recursive=True) for r in fused.collect()), key=key)
    c_rows = sorted(
        (r.asDict(recursive=True) for r in composed.collect()), key=key
    )
    assert f_rows == c_rows and len(f_rows) > 500


def test_pipeline_golden_parity_and_resume(spark, docs, test_run_cfg, tmp_path):
    workdir = str(tmp_path / "ckpt")
    triples = run_pipeline(spark, docs, test_run_cfg, workdir)
    got = {
        (r["subj"], r["pred"], r["obj"]) for r in triples.collect()
    }
    expected = golden_triples(load_golden("golden_test_run.csv"))
    assert got == expected

    # span-sequence invariant: the docs table is untouched by the run
    fp1 = {r["doc_id"]: r["span_hash"] for r in span_fingerprint(docs).collect()}
    docs2 = build_docs(spark, test_run_cfg)
    fp2 = {r["doc_id"]: r["span_hash"] for r in span_fingerprint(docs2).collect()}
    assert fp1 == fp2

    # lineage sidecars exist with per-partition metrics
    for stage in ("mention_detect", "link_score", "canonicalize", "materialize"):
        with open(os.path.join(workdir, stage, "_lineage.json")) as fh:
            lin = json.load(fh)
        assert lin["total_rows"] == sum(p["rows"] for p in lin["partitions"])
        assert lin["fingerprint"]

    # exact resume: nuke the last two stages, rerun -> identical triples,
    # and the earlier checkpoints are reused (sidecar timestamps unchanged)
    t_mention = json.load(
        open(os.path.join(workdir, "mention_detect", "_lineage.json"))
    )["written_at_ms"]
    import shutil

    shutil.rmtree(os.path.join(workdir, "canonicalize"))
    shutil.rmtree(os.path.join(workdir, "materialize"))
    triples2 = run_pipeline(spark, docs, test_run_cfg, workdir)
    got2 = {(r["subj"], r["pred"], r["obj"]) for r in triples2.collect()}
    assert got2 == got
    t_mention2 = json.load(
        open(os.path.join(workdir, "mention_detect", "_lineage.json"))
    )["written_at_ms"]
    assert t_mention2 == t_mention  # stage was NOT recomputed

    # config change invalidates resume
    cfg2 = test_run_cfg.with_(token_score_bit_score_weight=0.4,
                              token_score_database_score_weight=0.4)
    triples3 = run_pipeline(spark, docs, cfg2, workdir)
    assert triples3.count() > 0
    t_mention3 = json.load(
        open(os.path.join(workdir, "mention_detect", "_lineage.json"))
    )["written_at_ms"]
    assert t_mention3 != t_mention  # recomputed under new config


def test_connected_components(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("x", "a")], "u string, v string"
    )
    cc = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert cc["a"] == cc["b"] == cc["c"] == cc["x"] == "a"
    assert cc["d"] == cc["e"] == "d"


def test_canonical_map_identity_without_edges(spark):
    nodes = spark.createDataFrame([("GO:1",), ("GO:2",)], "obj string")
    m = {r["node"]: r["canonical"] for r in canonical_map(None, nodes).collect()}
    assert m == {"GO:1": "GO:1", "GO:2": "GO:2"}


def test_canonical_map_collapses_synonyms(spark):
    nodes = spark.createDataFrame([("GO:2",), ("GO:9",)], "obj string")
    edges = spark.createDataFrame([("GO:2", "GO:1")], "u string, v string")
    m = {r["node"]: r["canonical"] for r in canonical_map(edges, nodes).collect()}
    assert m == {"GO:2": "GO:1", "GO:9": "GO:9"}


def test_fingerprint_is_content_addressed(spark, tmp_path):
    """Byte-identical re-writes must yield the SAME stage fingerprint —
    part-file names embed the write job's UUID and must stay out of the
    hash, or every upstream re-run (even unchanged) would invalidate all
    downstream checkpoints."""
    from ahrd_spark.plans.checkpoint import CheckpointManager

    df = spark.range(100).select(
        F.col("id").cast("string").alias("k"), (F.col("id") * 3).alias("v")
    )
    m1 = CheckpointManager(spark, str(tmp_path / "a"), config_obj={"c": 1})
    m2 = CheckpointManager(spark, str(tmp_path / "b"), config_obj={"c": 1})
    m1.write(df, "s", key="k", sort_keys=["k"])
    m2.write(df, "s", key="k", sort_keys=["k"])
    fp1, fp2 = m1.fingerprint("s"), m2.fingerprint("s")
    assert fp1 and fp1 == fp2
    # different content -> different fingerprint
    m3 = CheckpointManager(spark, str(tmp_path / "c"), config_obj={"c": 1})
    m3.write(df.filter(F.col("v") != 3), "s", key="k", sort_keys=["k"])
    assert m3.fingerprint("s") != fp1


def test_connected_components_reliable_checkpoint_mode(spark, tmp_path):
    """checkpoint_dir switches lineage truncation to reliable storage
    (DataFrame.checkpoint): same components as the localCheckpoint mode,
    and the checkpoint files actually land in the directory — the mode a
    real cluster needs to survive executor loss."""
    import os

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "p")], "u string, v string"
    )
    base = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    ckdir = str(tmp_path / "cc_ckpt")
    reliable = {
        (r["node"], r["component"])
        for r in connected_components(edges, checkpoint_dir=ckdir).collect()
    }
    assert reliable == base == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")
    }
    found = []
    for root, _dirs, files in os.walk(ckdir):
        found += files
    assert found, "no reliable checkpoint files written"


def test_connected_components_local_contraction_parity(spark):
    """The two-level (partition-local NumPy contraction + replica-graph
    iteration) path must produce exactly the pure iterative path's
    components on a graph whose nodes replicate across many partitions."""
    e = (
        spark.range(20000)
        .select(
            F.concat(F.lit("n"), (F.col("id") % 5000).cast("string")).alias("u"),
            F.concat(
                F.lit("n"), (F.abs(F.xxhash64("id")) % 5000).cast("string")
            ).alias("v"),
        )
        .distinct()
    )
    pure = {
        (r["node"], r["component"])
        for r in connected_components(e, local_contraction=False).collect()
    }
    contracted = {
        (r["node"], r["component"])
        for r in connected_components(e, local_contraction=True).collect()
    }
    auto = {
        (r["node"], r["component"])
        for r in connected_components(e).collect()  # size-based choice
    }
    assert contracted == pure == auto
    assert len(pure) == 5000


@pytest.mark.parametrize(
    "yml,golden_file",
    [
        ("ahrd_example_input.yml", "golden_example.csv"),
        ("ahrd_example_input_go_prediction.yml", "golden_go.csv"),
    ],
)
def test_pipeline_golden_parity_batch_examples(spark, tmp_path, yml, golden_file):
    """North-star P/R pin on the reference's own batch example configs
    (ahrd_example_input / ahrd_example_input_go_prediction): the 4-stage
    checkpointed docs->triples pipeline emits exactly the reference's
    (subj, pred, obj) set — P = R = 1.0 ≥ 0.95.  Complements the
    test-run-config parity above; together every reference example config
    runs end-to-end through the pipeline, not just run_annotate."""
    cfg = load_config(f"{REF}/{yml}", base_dir=REF)
    docs = build_docs(spark, cfg)
    triples = run_pipeline(spark, docs, cfg, str(tmp_path / "ckpt"))
    got = {(r["subj"], r["pred"], r["obj"]) for r in triples.collect()}
    expected = golden_triples(load_golden(golden_file))
    assert got == expected and len(expected) > 0
