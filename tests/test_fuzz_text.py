"""Property-based robustness: arbitrary unicode through the text ops.

Web-scale inputs contain everything — empty strings, lone surrogates'
neighbors, RTL marks, 10k-char tokens, NULs.  These properties assert
the text operators never throw and keep their structural invariants on
ANY input, using one Spark job per property (hypothesis drives the
example list, Spark evaluates them as one DataFrame batch — per-example
Spark jobs would take minutes).
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# printable-ish unicode incl. whitespace and controls, no surrogates
TEXTS = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        max_size=200,
    ),
    min_size=1,
    max_size=30,
)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=TEXTS)
def test_text_exprs_never_throw_and_hold_invariants(_spark, texts):
    from ahrd_spark.functions.text import tokenize_expr
    from ahrd_spark.operators.textstats import (
        lang_id_expr,
        quality_score_expr,
        ws_token_count_expr,
    )

    df = _spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    rows = df.select(
        "doc_id",
        tokenize_expr(F.col("text")).alias("toks"),
        ws_token_count_expr(F.col("text")).alias("ws"),
        quality_score_expr(F.col("text")).alias("q"),
        lang_id_expr(F.col("text")).alias("lang"),
        F.md5("text").alias("h"),
    ).collect()
    assert len(rows) == len(texts)
    for r in rows:
        assert r["ws"] >= 0
        assert 0.0 <= r["q"] <= 1.0
        assert isinstance(r["lang"], str) and r["lang"]
        # tokenize: sorted, deduped, no empties
        toks = r["toks"]
        assert toks == sorted(set(toks))
        assert "" not in toks
        assert len(r["h"]) == 32


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=TEXTS)
def test_exact_dedup_partitions_corpus(_spark, texts):
    from ahrd_spark.operators.dedup import exact_dedup

    df = _spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    out = exact_dedup(df).collect()
    # groups partition the corpus: counts sum to N, one canonical each
    assert sum(r["dup_count"] for r in out) == len(texts)
    assert len({r["canonical_id"] for r in out}) == len(out)
    assert len(out) == len(set(texts))
