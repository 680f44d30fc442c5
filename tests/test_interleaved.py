"""Unit tests for the interleaved-span operators, sorted-neighborhood
blocking, per-key caps, and HITS — round-4 additions."""

import numpy as np
import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from ahrd_spark.operators.ranking import (
    global_dense_rank,
    sorted_neighborhood_pairs,
)
from ahrd_spark.operators.graph import hits_scores
from ahrd_spark.operators.interleaved import (
    media_ref_dedup,
    media_text_gate,
    span_fingerprint,
    span_stats,
)
from ahrd_spark.operators.sampling import cap_per_key


def _span(kind, text=None, media_ref=None, offset=0):
    return Row(kind=kind, text=text, media_ref=media_ref, offset=offset)


SPAN_SCHEMA = (
    "doc_id BIGINT, spans ARRAY<STRUCT<kind:STRING, text:STRING, "
    "media_ref:STRING, offset:INT>>"
)


@pytest.fixture(scope="module")
def idocs(spark):
    rows = [
        # doc 1: 2 text + 1 media, ordered offsets
        Row(doc_id=1, spans=[
            _span("text", text="hello", offset=0),
            _span("media", media_ref="m1", offset=1),
            _span("text", text="world", offset=2),
        ]),
        # doc 2: all media (no_text), shares m1, repeats m2 twice
        Row(doc_id=2, spans=[
            _span("media", media_ref="m1", offset=0),
            _span("media", media_ref="m2", offset=1),
            _span("media", media_ref="m2", offset=2),
        ]),
        # doc 3: one long text span; offset violation (3 then 3)
        Row(doc_id=3, spans=[
            _span("text", text="x" * 100, offset=3),
            _span("text", text="y", offset=3),
        ]),
        # doc 4: single short text span
        Row(doc_id=4, spans=[_span("text", text="tiny", offset=0)]),
    ]
    return spark.createDataFrame(rows, SPAN_SCHEMA)


def test_span_stats_counts_and_violations(idocs):
    got = {r["doc_id"]: r.asDict() for r in span_stats(idocs).collect()}
    assert got[1]["n_spans"] == 3
    assert got[1]["n_text"] == 2
    assert got[1]["n_media"] == 1
    assert got[1]["media_ratio"] == pytest.approx(1 / 3)
    assert got[1]["text_chars"] == 10
    assert got[1]["offset_violations"] == 0
    assert got[2]["n_text"] == 0
    assert got[2]["media_ratio"] == 1.0
    assert got[2]["text_chars"] == 0
    assert got[3]["offset_violations"] == 1  # 3 -> 3 not increasing
    assert got[4]["n_spans"] == 1
    assert got[4]["offset_violations"] == 0  # single span, guard path


def test_media_text_gate_reason_precedence(idocs):
    got = {
        r["doc_id"]: (r["keep"], r["drop_reason"])
        for r in media_text_gate(
            idocs, max_media_ratio=0.5, min_text_chars=20
        ).collect()
    }
    assert got[1] == (False, "too_short")  # 10 chars < 20
    assert got[2] == (False, "no_text")  # precedence over media_heavy
    assert got[3] == (True, None)
    assert got[4] == (False, "too_short")


def test_media_ref_dedup_distinct_doc_counting(idocs):
    got = {r["media_ref"]: r.asDict() for r in media_ref_dedup(idocs).collect()}
    # m1 in docs 1 and 2 -> shared; m2 only in doc 2 (twice) -> NOT shared
    assert set(got) == {"m1"}
    assert got["m1"]["n_docs"] == 2
    assert got["m1"]["n_spans"] == 2
    assert got["m1"]["canonical_doc"] == 1
    # lowering min_docs surfaces m2 with its in-doc span count
    all_refs = {
        r["media_ref"]: r.asDict()
        for r in media_ref_dedup(idocs, min_docs=1).collect()
    }
    assert all_refs["m2"]["n_docs"] == 1
    assert all_refs["m2"]["n_spans"] == 2


def test_span_fingerprint_order_sensitive_offset_insensitive(spark):
    base = [_span("text", text="a", offset=0), _span("media", media_ref="m", offset=1)]
    swapped = list(reversed(base))
    renumbered = [
        _span("text", text="a", offset=10),
        _span("media", media_ref="m", offset=99),
    ]
    df = spark.createDataFrame(
        [Row(doc_id=1, spans=base), Row(doc_id=2, spans=swapped),
         Row(doc_id=3, spans=renumbered)],
        SPAN_SCHEMA,
    )
    fp = {r["doc_id"]: r["span_fp"] for r in span_fingerprint(df).collect()}
    assert fp[1] != fp[2]  # order matters
    assert fp[1] == fp[3]  # offsets don't


def test_span_fingerprint_null_vs_empty(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, spans=[_span("text", text=None)]),
         Row(doc_id=2, spans=[_span("text", text="")])],
        SPAN_SCHEMA,
    )
    fp = {r["doc_id"]: r["span_fp"] for r in span_fingerprint(df).collect()}
    assert fp[1] != fp[2]


def test_global_dense_rank_matches_single_window(spark):
    rows = [Row(doc_id=i, k=f"key{i % 7:02d}") for i in range(200)]
    df = spark.createDataFrame(rows)
    got = {
        r["doc_id"]: r["rank"]
        for r in global_dense_rank(df, ["k", "doc_id"], partitions=5).collect()
    }
    want = {
        r["doc_id"]: r["rank"]
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy("k", "doc_id"))
        ).collect()
    }
    assert got == want
    # more partitions than rows: still a dense 1..N ranking
    tiny = spark.createDataFrame([Row(doc_id=i, k="z") for i in range(3)])
    ranks = sorted(
        r["rank"]
        for r in global_dense_rank(tiny, ["k", "doc_id"], partitions=64).collect()
    )
    assert ranks == [1, 2, 3]


def test_sorted_neighborhood_pairs_bruteforce(spark):
    rows = [Row(doc_id=i, blk=f"b{(i * 37) % 11:02d}") for i in range(40)]
    df = spark.createDataFrame(rows)
    got = {
        (r["doc_a"], r["doc_b"], r["rank_gap"])
        for r in sorted_neighborhood_pairs(
            df, key_col="blk", window=3, partitions=4
        ).collect()
    }
    order = [d for d, _ in sorted(((r.doc_id, r.blk) for r in rows),
                                  key=lambda t: (t[1], t[0]))]
    want = set()
    for i, a in enumerate(order):
        for gap in (1, 2):
            if i + gap < len(order):
                want.add((a, order[i + gap], gap))
    assert got == want
    # linear candidate-count guarantee: (window-1) pairs per row minus tail
    assert len(got) == 2 * len(order) - 3


def test_cap_per_key_exact_and_skew_safe(spark):
    # one hot key with 5000 rows, two cold keys
    rows = [Row(doc_id=i, key="hot", v=float(i % 97)) for i in range(5000)]
    rows += [Row(doc_id=10_000 + i, key=f"cold{i % 2}", v=float(i))
             for i in range(20)]
    df = spark.createDataFrame(rows)
    got = cap_per_key(
        df, key_col="key", order_cols=[F.col("v").desc()], n=7
    ).collect()
    want = {
        (r["key"], r["doc_id"]): r["rank"]
        for r in df.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("key").orderBy(F.col("v").desc(), "doc_id")
            ),
        ).filter(F.col("rank") <= 7).collect()
    }
    assert {(r["key"], r["doc_id"]): r["key_rank"] for r in got} == want
    by_key = {}
    for r in got:
        by_key.setdefault(r["key"], []).append(r["key_rank"])
    assert sorted(by_key["hot"]) == list(range(1, 8))


def _hits_numpy(edge_list, iters=8):
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for u, v in edge_list:
        adj[idx[u], idx[v]] = 1.0
    hub = np.ones(n)
    auth = np.ones(n)
    for _ in range(iters):
        auth = adj.T @ hub
        auth = auth / max(auth.max(), 1.0) if auth.max() > 0 else auth
        hub = adj @ auth
        hub = hub / max(hub.max(), 1.0) if hub.max() > 0 else hub
    return {n: (hub[idx[n]], auth[idx[n]]) for n in nodes}


def test_hits_scores_matches_numpy_power_iteration(spark):
    edges = [(f"n{i}", f"n{(i * 3 + 1) % 10}") for i in range(10)]
    edges += [("n0", "n5"), ("n1", "n5"), ("n2", "n5")]  # n5: authority
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src STRING, dst STRING")
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits_scores(df, iters=8).collect()
    }
    want = _hits_numpy(sorted(set(edges)), iters=8)
    assert set(got) == set(want)
    for node in want:
        assert got[node][0] == pytest.approx(want[node][0], abs=1e-9)
        assert got[node][1] == pytest.approx(want[node][1], abs=1e-9)


def test_hits_scores_star_graph_extremes(spark):
    # hub h points at 5 leaves; leaves point nowhere
    edges = [("h", f"l{i}") for i in range(5)]
    df = spark.createDataFrame(edges, "src STRING, dst STRING")
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits_scores(df, iters=4).collect()
    }
    assert got["h"] == (1.0, 0.0)
    for i in range(5):
        assert got[f"l{i}"] == (0.0, 1.0)


def test_media_contexts_nearest_text(idocs):
    from ahrd_spark.operators.interleaved import media_contexts

    got = {
        (r["doc_id"], r["span_idx"]): (r["prev_text"], r["next_text"])
        for r in media_contexts(idocs).collect()
    }
    # doc 1: media between two texts
    assert got[(1, 1)] == ("hello", "world")
    # doc 2: all media -> no text either side, and nearest-TEXT skips
    # the neighbouring media spans
    assert got[(2, 0)] == (None, None)
    assert got[(2, 1)] == (None, None)
    assert got[(2, 2)] == (None, None)
    assert len(got) == 4


def test_media_contexts_skips_media_neighbors(spark):
    from ahrd_spark.operators.interleaved import media_contexts

    df = spark.createDataFrame(
        [Row(doc_id=9, spans=[
            _span("text", text="a", offset=0),
            _span("media", media_ref="m1", offset=1),
            _span("media", media_ref="m2", offset=2),
            _span("text", text="b", offset=3),
        ])],
        SPAN_SCHEMA,
    )
    got = {
        r["span_idx"]: (r["prev_text"], r["next_text"])
        for r in media_contexts(df).collect()
    }
    # both media spans see the same nearest TEXT spans, not each other
    assert got[1] == ("a", "b")
    assert got[2] == ("a", "b")


def test_chunk_interleaved_budgets_and_order(spark):
    from ahrd_spark.operators.interleaved import (
        chunk_interleaved,
        span_fingerprint,
    )

    doc = Row(doc_id=7, spans=[
        _span("text", text="aaaa", offset=0),     # 4 chars
        _span("media", media_ref="m1", offset=1),
        _span("text", text="bbbbbb", offset=2),   # 6 -> 10 > 8: new chunk
        _span("media", media_ref="m2", offset=3),
        _span("media", media_ref="m3", offset=4),  # media 2 > 1: new chunk
        _span("text", text="cc", offset=5),
    ])
    df = spark.createDataFrame([doc], SPAN_SCHEMA)
    chunks = (
        chunk_interleaved(df, max_text_chars=8, max_media=1)
        .orderBy("chunk_id")
        .collect()
    )
    assert [c["n_spans"] for c in chunks] == [2, 2, 2]
    assert [c["n_media"] for c in chunks] == [1, 1, 1]
    assert [c["text_chars"] for c in chunks] == [4, 6, 2]
    # no span dropped
    assert sum(c["n_spans"] for c in chunks) == 6
    # an unsplit doc's single chunk carries the doc's own fingerprint
    one = chunk_interleaved(df, max_text_chars=10**6, max_media=10**6)
    fp = span_fingerprint(df).select("doc_id", "span_fp")
    j = one.join(fp, "doc_id").collect()
    assert len(j) == 1 and j[0]["chunk_fp"] == j[0]["span_fp"]


def test_chunk_interleaved_oversized_span_own_chunk(spark):
    from ahrd_spark.operators.interleaved import chunk_interleaved

    df = spark.createDataFrame(
        [Row(doc_id=1, spans=[
            _span("text", text="x" * 50, offset=0),
            _span("text", text="y" * 50, offset=1),
        ])],
        SPAN_SCHEMA,
    )
    chunks = chunk_interleaved(df, max_text_chars=8, max_media=4).collect()
    # each oversized span still lands in its own chunk, none dropped
    assert sorted(c["text_chars"] for c in chunks) == [50, 50]
    assert all(c["n_spans"] == 1 for c in chunks)


def test_span_drift_statuses(spark, idocs):
    from ahrd_spark.operators.interleaved import span_drift

    new = (
        idocs.filter(F.col("doc_id") != 2)  # removed
        .withColumn(
            "spans",
            F.when(
                F.col("doc_id") == 1,
                F.slice("spans", 1, 2),  # changed (last span dropped)
            ).otherwise(F.col("spans")),
        )
        .union(
            spark.createDataFrame(
                [Row(doc_id=99, spans=[_span("text", text="n", offset=0)])],
                SPAN_SCHEMA,
            )
        )
    )
    got = {r["doc_id"]: r["status"] for r in span_drift(idocs, new).collect()}
    assert got == {
        1: "changed", 2: "removed", 3: "unchanged",
        4: "unchanged", 99: "added",
    }


def test_pack_interleaved_budget_and_determinism(spark):
    from ahrd_spark.operators.interleaved import pack_interleaved

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, spans=[
                _span("text", text="w" * 40, offset=0),
                _span("media", media_ref=f"m{i}", offset=1),
                _span("text", text="v" * 40, offset=2),
            ])
            for i in range(1, 21)
        ],
        SPAN_SCHEMA,
    )
    packed = pack_interleaved(
        docs, budget=64, chars_per_token=4, media_tokens=8,
        max_text_chars=100, max_media=4, buckets=2, salt="t",
    ).collect()
    # every doc fits one chunk: 80 chars/4 + 1*8 = 28 tokens
    assert all(r["n_tokens"] == 28 for r in packed)
    assert len(packed) == 20
    # cumulative fill: within a bucket, packs hold floor-div groups of
    # the running total -> pack sizes of 2-3 chunks under a 64 budget
    from collections import Counter

    sizes = Counter((r["bucket"], r["pack_id"]) for r in packed)
    assert all(1 <= v <= 3 for v in sizes.values())
    # pure function of inputs: same call replays identically
    again = pack_interleaved(
        docs, budget=64, chars_per_token=4, media_tokens=8,
        max_text_chars=100, max_media=4, buckets=2, salt="t",
    ).collect()
    assert sorted(map(tuple, packed)) == sorted(map(tuple, again))
    # no chunk dropped or duplicated
    assert sorted(r["doc_id"] for r in packed) == list(range(1, 21))


def test_interleaved_to_text_placeholders_and_order(spark, idocs):
    from ahrd_spark.operators.interleaved import (
        interleaved_to_text,
        span_stats,
    )

    flat = {r["doc_id"]: r.asDict()
            for r in interleaved_to_text(idocs).collect()}
    assert flat[1]["flat_text"] == "hello <|image|> world"
    assert flat[2]["flat_text"] == "<|image|> <|image|> <|image|>"
    assert flat[4]["flat_text"] == "tiny"
    # placeholder count reconciles with span_stats.n_media for every doc
    stats = {r["doc_id"]: r["n_media"] for r in span_stats(idocs).collect()}
    for d, row in flat.items():
        assert row["n_media"] == stats[d]
        assert row["flat_text"].count("<|image|>") == stats[d]
        assert row["flat_chars"] == len(row["flat_text"])


def test_interleaved_to_text_null_text_span(spark):
    from ahrd_spark.operators.interleaved import interleaved_to_text

    df = spark.createDataFrame(
        [Row(doc_id=1, spans=[
            _span("text", text=None, offset=0),
            _span("text", text="b", offset=1),
        ])],
        SPAN_SCHEMA,
    )
    got = interleaved_to_text(df).collect()[0]
    # NULL text flattens to empty, not NULL-poisoning the whole string
    assert got["flat_text"] == " b"


def test_chunk_interleaved_arrow_parity(spark, idocs):
    from ahrd_spark.operators.interleaved import chunk_interleaved

    for budgets in [(8, 1), (10**6, 10**6), (5, 4)]:
        a = sorted(
            map(tuple, chunk_interleaved(
                idocs, *budgets, impl="expr").collect())
        )
        b = sorted(
            map(tuple, chunk_interleaved(
                idocs, *budgets, impl="arrow").collect())
        )
        assert a == b, budgets


def test_chunk_interleaved_bad_impl(idocs):
    import pytest as _pytest

    from ahrd_spark.operators.interleaved import chunk_interleaved

    with _pytest.raises(ValueError):
        chunk_interleaved(idocs, impl="nope")


def test_normalize_spans_repairs_reversed_doc(spark):
    from ahrd_spark.operators.interleaved import (
        normalize_spans,
        span_fingerprint,
        span_stats,
    )

    orig = spark.createDataFrame(
        [Row(doc_id=1, spans=[
            _span("text", text="a", offset=0),
            _span("media", media_ref="m1", offset=1),
            _span("text", text="b", offset=2),
        ])],
        SPAN_SCHEMA,
    )
    corrupted = orig.select(
        "doc_id", F.reverse("spans").alias("spans")
    )
    fixed = normalize_spans(corrupted)
    # canonical offsets, zero violations
    st = span_stats(fixed).collect()[0]
    assert st["offset_violations"] == 0
    got = fixed.collect()[0]["spans"]
    assert [s["offset"] for s in got] == [0, 1, 2]
    # content order restored exactly (offsets were unique)
    fp_orig = span_fingerprint(orig).collect()[0]["span_fp"]
    fp_fixed = span_fingerprint(fixed).collect()[0]["span_fp"]
    assert fp_fixed == fp_orig


def test_normalize_spans_stable_on_duplicate_offsets(spark):
    from ahrd_spark.operators.interleaved import normalize_spans

    df = spark.createDataFrame(
        [Row(doc_id=1, spans=[
            _span("text", text="first", offset=5),
            _span("text", text="second", offset=5),
            _span("text", text="zero", offset=0),
        ])],
        SPAN_SCHEMA,
    )
    got = normalize_spans(df).collect()[0]["spans"]
    # ties keep arrival order; lower offset sorts first; renumbered
    assert [(s["text"], s["offset"]) for s in got] == [
        ("zero", 0), ("first", 1), ("second", 2),
    ]
