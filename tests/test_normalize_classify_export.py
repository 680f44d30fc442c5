"""Tests for the round-3 curation additions: text normalization / C4 line
filter, hashed linear classifier, and the N-Triples graph export."""

import math

import pytest
from pyspark.sql import functions as F

from ahrd_spark.operators.classifier import hashed_linear_scores, token_bucket_expr
from ahrd_spark.operators.normalize import (
    c4_line_filter,
    clean_text_expr,
    nfc_normalize,
)
from ahrd_spark.plans.graph_export import to_ntriples, write_ntriples


# ---------------------------------------------------------------- normalize
def test_clean_text_strips_controls_and_collapses_ws(spark):
    rows = [
        (0, "a\x00b\x01c"),                       # controls removed, no space
        (1, "  spaced\t\tout \n lines \x0b ok "),  # \x0b is a control here
        (2, ""),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", clean_text_expr(F.col("text")).alias("c")
        ).collect()
    }
    assert out[0] == "abc"
    assert out[1] == "spaced out lines ok"
    assert out[2] == ""
    assert out[3] is None


def test_nfc_normalize_composes_and_fast_paths(spark):
    decomposed = "Café"          # e + combining acute
    composed = "Café"
    rows = [(0, decomposed), (1, composed), (2, "plain ascii"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r["text"] for r in nfc_normalize(df, ["text"]).collect()
    }
    assert out[0] == composed
    assert out[1] == composed
    assert out[2] == "plain ascii"
    assert out[3] is None


def test_nfc_normalize_unknown_column_raises(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        nfc_normalize(df, ["nope"])


def test_c4_line_filter_rules(spark):
    doc0 = "\n".join(
        [
            "This line is a proper sentence.",   # kept
            "too short.",                        # < 3 words
            "No terminal punctuation here",      # no punct
            "Please enable javascript to view.", # blocklist
            'She said it was "fine."',           # kept (quote terminal)
        ]
    )
    doc1 = "function f() { return 1; }"          # doc-level reject: '{'
    doc2 = "Lorem Ipsum dolor sit amet."         # doc-level reject
    df = spark.createDataFrame(
        [(0, doc0), (1, doc1), (2, doc2)], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in c4_line_filter(df).collect()}
    assert out[0]["clean_text"] == (
        'This line is a proper sentence.\nShe said it was "fine."'
    )
    assert out[0]["n_lines"] == 5 and out[0]["n_lines_kept"] == 2
    assert not out[0]["doc_rejected"]
    for d in (1, 2):
        assert out[d]["doc_rejected"]
        assert out[d]["clean_text"] == "" and out[d]["n_lines_kept"] == 0


# --------------------------------------------------------------- classifier
def _bucket(tok: str, n: int) -> int:
    import hashlib

    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % n


def test_token_bucket_matches_python_md5(spark):
    toks = ["kinase", "the", "protein", "ünïcode"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {
        r["tok"]: r["b"]
        for r in df.select(
            "tok", token_bucket_expr(F.col("tok"), 64).alias("b")
        ).collect()
    }
    for t in toks:
        assert got[t] == _bucket(t, 64)


def test_hashed_linear_scores_hand_math(spark):
    n_buckets, bias = 16, -0.5
    docs = spark.createDataFrame(
        [(0, "good good text"), (1, ""), (2, "bad")],
        "doc_id bigint, text string",
    )
    wmap = {_bucket("good", n_buckets): 1.0, _bucket("bad", n_buckets): -2.0}
    # collision would make hand-math ambiguous; the chosen words don't collide
    assert _bucket("good", n_buckets) != _bucket("text", n_buckets)
    weights = spark.createDataFrame(
        [(b, w) for b, w in wmap.items()], "bucket bigint, weight double"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in hashed_linear_scores(
            docs, weights, n_buckets, bias=bias
        ).collect()
    }
    # doc0: two 'good' occurrences (frequency counts) + 'text' (weight 0)
    z0 = bias + 2 * 1.0 + 0.0
    assert out[0]["n_tokens"] == 3
    assert out[0]["score"] == pytest.approx(z0)
    assert out[0]["prob"] == pytest.approx(1 / (1 + math.exp(-z0)))
    assert out[0]["keep"] is True
    # doc1: token-less -> sigmoid(bias)
    assert out[1]["n_tokens"] == 0
    assert out[1]["score"] == pytest.approx(bias)
    assert out[1]["keep"] is False
    # doc2: one 'bad'
    assert out[2]["score"] == pytest.approx(bias - 2.0)
    assert out[2]["keep"] is False


# ------------------------------------------------------------------- export
def test_ntriples_escaping_and_object_forms(spark):
    triples = spark.createDataFrame(
        [
            ("P1", "hasDescription", 'say "hi"\\\n\tdone', "description"),
            ("P 2", "hasGOTerm", "GO:0006355", "go_term"),
        ],
        "subj string, pred string, obj string, obj_kind string",
    )
    lines = sorted(r["line"] for r in to_ntriples(triples).collect())
    assert lines[0] == (
        "<urn:ahrd:protein:P%202> <urn:ahrd:pred:hasGOTerm> "
        "<urn:ahrd:entity:GO:0006355> ."
    )
    assert lines[1] == (
        "<urn:ahrd:protein:P1> <urn:ahrd:pred:hasDescription> "
        '"say \\"hi\\"\\\\\\n\\tdone" .'
    )


def test_ntriples_interpro_kind_is_iri_and_null_term_fails(spark):
    triples = spark.createDataFrame(
        [("P1", "hasDomain", "IPR000123", "interpro")],
        "subj string, pred string, obj string, obj_kind string",
    )
    # the pipeline's 'interpro' obj_kind must render as an IRI by default
    assert to_ntriples(triples).collect()[0]["line"] == (
        "<urn:ahrd:protein:P1> <urn:ahrd:pred:hasDomain> "
        "<urn:ahrd:entity:IPR000123> ."
    )

    bad = spark.createDataFrame(
        [("P1", "hasGOTerm", None, "go_term")],
        "subj string, pred string, obj string, obj_kind string",
    )
    with pytest.raises(Exception) as ei:
        to_ntriples(bad).collect()
    assert "NULL term" in str(ei.value)


def test_write_ntriples_roundtrip(spark, tmp_path):
    triples = spark.createDataFrame(
        [("P1", "hasGOTerm", f"GO:{i:07d}", "go_term") for i in range(10)],
        "subj string, pred string, obj string, obj_kind string",
    )
    path = str(tmp_path / "graph.nt")
    write_ntriples(triples, path, compression=None)
    back = spark.read.text(path)
    assert back.count() == 10
    assert all(r["value"].endswith(" .") for r in back.collect())
