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


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["u1", "u2", "u3"]),
            st.sampled_from(["a", "b", "c", "x"]),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_funnel_matches_python_reference(_spark, events):
    """Anchored-funnel property: the distributed operator equals a
    straightforward per-key Python simulation on arbitrary event sets."""
    from ahrd_spark.operators.events import funnel_counts

    steps, within = ["a", "b", "c"], 20
    # make timestamps unique per key so ordering is total (the operator's
    # documented contract: ties need a tiebreaker)
    seen, rows = set(), []
    for k, t, ts in events:
        while (k, ts) in seen:
            ts += 100
        seen.add((k, ts))
        rows.append((k, t, ts))

    def simulate():
        per = {}
        for k, t, ts in rows:
            per.setdefault(k, []).append((ts, t))
        counts = [0, 0, 0]
        for k, evs in per.items():
            evs.sort()
            t1 = min((ts for ts, t in evs if t == steps[0]), default=None)
            if t1 is None:
                continue
            counts[0] += 1
            prev = t1
            for i, s in enumerate(steps[1:], start=1):
                nxt = min(
                    (ts for ts, t in evs
                     if t == s and ts > prev and ts <= t1 + within),
                    default=None,
                )
                if nxt is None:
                    break
                counts[i] += 1
                prev = nxt
        return counts

    df = _spark.createDataFrame(rows, "k string, t string, ts long")
    got = {r["step_idx"]: r["keys_cnt"]
           for r in funnel_counts(df, "k", "ts", "t", steps, within).collect()}
    expect = simulate()
    # ungrouped agg: even an empty funnel yields the three step rows
    assert [got[1], got[2], got[3]] == expect
