"""Property-based checks for the interleaved-span operators: random span
sequences vs straightforward Python reference models.  The greedy chunk
walk and the stats/gate arithmetic have boundary cases (empty docs,
all-media docs, NULL text, exact-budget hits) that unit examples
under-sample."""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SCHEMA = (
    "doc_id bigint, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)
SEP1, SEP2, NUL = chr(1), chr(2), chr(3)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


def span_strat():
    text = st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(
                min_codepoint=32, max_codepoint=126
            ),
            max_size=12,
        ),
    )
    return st.one_of(
        st.tuples(st.just("text"), text, st.none()),
        st.tuples(
            st.just("media"),
            st.none(),
            st.sampled_from(["m1", "m2", "m3", None]),
        ),
    )


DOCS = st.lists(
    st.lists(span_strat(), max_size=12), min_size=1, max_size=8
)


def _rows(docs):
    return [
        (
            i,
            [
                {"kind": k, "text": t, "media_ref": m, "offset": j}
                for j, (k, t, m) in enumerate(spans)
            ],
        )
        for i, spans in enumerate(docs)
    ]


def _greedy_ref(spans, max_chars, max_media):
    """Pure-Python greedy walk: the reference model for both impls."""
    chunks = []
    chunk = {"n": 0, "m": 0, "c": 0, "buf": []}
    for k, t, m in spans:
        cost = 0 if k == "media" else (len(t) if t is not None else 0)
        med = 1 if k == "media" else 0
        if chunk["n"] > 0 and (
            chunk["c"] + cost > max_chars or chunk["m"] + med > max_media
        ):
            chunks.append(chunk)
            chunk = {"n": 0, "m": 0, "c": 0, "buf": []}
        chunk["n"] += 1
        chunk["m"] += med
        chunk["c"] += cost
        chunk["buf"].append(
            SEP2.join(
                (
                    k if k is not None else NUL,
                    t if t is not None else NUL,
                    m if m is not None else NUL,
                )
            )
        )
    if chunk["n"]:
        chunks.append(chunk)
    return [
        (
            ci,
            c["n"],
            c["m"],
            c["c"],
            hashlib.md5(SEP1.join(c["buf"]).encode("utf-8")).hexdigest(),
        )
        for ci, c in enumerate(chunks)
    ]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=DOCS,
    budgets=st.sampled_from([(1, 1), (5, 2), (12, 1), (100, 100)]),
)
def test_chunk_interleaved_matches_python_model(_spark, docs, budgets):
    from ahrd_spark.operators.interleaved import chunk_interleaved

    max_chars, max_media = budgets
    df = _spark.createDataFrame(_rows(docs), SCHEMA)
    expected = sorted(
        (i, ci, n, m, c, fp)
        for i, spans in enumerate(docs)
        for (ci, n, m, c, fp) in _greedy_ref(spans, max_chars, max_media)
    )
    for impl in ("expr", "arrow"):
        got = sorted(
            (
                r["doc_id"], r["chunk_id"], r["n_spans"],
                r["n_media"], r["text_chars"], r["chunk_fp"],
            )
            for r in chunk_interleaved(
                df, max_chars, max_media, impl=impl
            ).collect()
        )
        assert got == expected, impl


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=DOCS)
def test_span_stats_matches_python_model(_spark, docs):
    from ahrd_spark.operators.interleaved import span_stats

    df = _spark.createDataFrame(_rows(docs), SCHEMA)
    got = {r["doc_id"]: r.asDict() for r in span_stats(df).collect()}
    for i, spans in enumerate(docs):
        n = len(spans)
        media = sum(1 for k, _, _ in spans if k == "media")
        chars = sum(
            len(t) for k, t, _ in spans if k != "media" and t is not None
        )
        # generator assigns offset = position, so violations == 0 here
        row = got[i]
        assert row["n_spans"] == n
        assert row["n_media"] == media
        assert row["n_text"] == n - media
        assert row["text_chars"] == chars
        assert row["offset_violations"] == 0
        if n:
            assert row["media_ratio"] == pytest.approx(media / n)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=DOCS)
def test_media_contexts_matches_python_model(_spark, docs):
    from ahrd_spark.operators.interleaved import media_contexts

    df = _spark.createDataFrame(_rows(docs), SCHEMA)
    got = {
        (r["doc_id"], r["span_idx"]): (r["prev_text"], r["next_text"])
        for r in media_contexts(df).collect()
    }
    expected = {}
    for i, spans in enumerate(docs):
        for j, (k, _, _) in enumerate(spans):
            if k != "media":
                continue
            # ignorenulls semantics: a text span with NULL text has no
            # text to contribute, so the window skips past it (same in
            # the DuckDB oracle)
            prev = next(
                (
                    t
                    for kk, t, _ in reversed(spans[:j])
                    if kk != "media" and t is not None
                ),
                None,
            )
            nxt = next(
                (
                    t
                    for kk, t, _ in spans[j + 1:]
                    if kk != "media" and t is not None
                ),
                None,
            )
            expected[(i, j)] = (prev, nxt)
    assert got == expected


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=DOCS)
def test_fingerprint_chunks_reassemble_to_doc(_spark, docs):
    """Span-sequence conservation: chunking with an unbounded budget
    yields exactly one chunk per non-empty doc whose fingerprint equals
    the doc's own span fingerprint — and under ANY budget the chunk
    sizes partition the doc's span count."""
    from pyspark.sql import functions as F

    from ahrd_spark.operators.interleaved import (
        chunk_interleaved,
        span_fingerprint,
    )

    df = _spark.createDataFrame(_rows(docs), SCHEMA)
    one = chunk_interleaved(df, 10**9, 10**9)
    fp = span_fingerprint(df).select("doc_id", "span_fp")
    for r in one.join(fp, "doc_id").collect():
        assert r["chunk_fp"] == r["span_fp"]
    parts = (
        chunk_interleaved(df, 5, 1)
        .groupBy("doc_id")
        .agg(F.sum("n_spans").alias("total"))
        .collect()
    )
    sizes = {r["doc_id"]: r["total"] for r in parts}
    for i, spans in enumerate(docs):
        assert sizes.get(i, 0) == len(spans)
