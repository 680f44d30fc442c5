"""KMV / Count-Min sketch goldens and properties (operators/sketches.py).

The estimates are deterministic functions of md5 prefixes, so every test
can recompute the expected value independently with hashlib — the same
arithmetic the DuckDB oracle replays in SQL.
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ahrd_spark.operators.sketches import (  # noqa: E402
    HASH_SPACE,
    countmin_freqs,
    kmv_distinct,
    kmv_merge,
)


def _h(value: str) -> str:
    return hashlib.md5(value.encode()).hexdigest()[:15]


def _kmv_expected(values, k):
    hashes = sorted({_h(v) for v in values})[:k]
    n = len(hashes)
    kth = hashes[-1]
    if n < k:
        est = n
    else:
        est = int((k - 1) * HASH_SPACE / float(int(kth, 16)))
    return hashes, n, kth, est


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [(v,) for v in ["a", "b", "c", "a", "b"]], "v STRING"
    )
    row = kmv_distinct(df, "v", k=8).collect()[0]
    assert row.n_seen == 3 and row.est_distinct == 3
    assert row.hashes == sorted(_h(v) for v in "abc")


def test_kmv_estimator_matches_hashlib_replay(spark):
    values = [f"tok{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in values * 2], "v STRING")
    row = kmv_distinct(df, "v", k=32).collect()[0]
    hashes, n, kth, est = _kmv_expected(values, 32)
    assert row.hashes == hashes
    assert (row.n_seen, row.kth_hash, row.est_distinct) == (n, kth, est)
    # sanity: the estimate lands within 40% of the truth for k=32
    assert 300 <= row.est_distinct <= 700


def test_kmv_ungrouped_layout_independent(spark):
    """The ungrouped build's two-level bottom-k (per-partition local
    bottom-k, then global) must equal the plain replay whatever the
    input partitioning — the global bottom-k is contained in the union
    of local bottom-ks for ANY layout."""
    values = [f"tok{i}" for i in range(300)]
    base = spark.createDataFrame([(v,) for v in values], "v STRING")
    want = _kmv_expected(values, 16)
    for parts in (1, 7, 32):
        row = kmv_distinct(base.repartition(parts), "v", k=16).collect()[0]
        assert row.hashes == want[0], parts
        assert (row.n_seen, row.kth_hash, row.est_distinct) == want[1:], (
            parts
        )


def test_kmv_groups_and_null_exclusion(spark):
    rows = [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", None)]
    df = spark.createDataFrame(rows, "g STRING, v STRING")
    got = {
        r.g: (r.n_seen, r.est_distinct)
        for r in kmv_distinct(df, "v", k=4, group_cols=["g"]).collect()
    }
    assert got == {"g1": (2, 2), "g2": (1, 1)}


def test_kmv_merge_equals_sketch_of_union(spark):
    a = [f"A{i}" for i in range(80)]
    b = [f"B{i}" for i in range(90)] + a[:40]  # overlapping halves
    k = 16
    df_a = spark.createDataFrame([("a", v) for v in a], "part STRING, v STRING")
    df_b = spark.createDataFrame([("b", v) for v in b], "part STRING, v STRING")
    parts = kmv_distinct(
        df_a.unionByName(df_b), "v", k=k, group_cols=["part"]
    )
    merged = kmv_merge(parts, k=k).collect()[0]
    direct = kmv_distinct(
        spark.createDataFrame([(v,) for v in set(a) | set(b)], "v STRING"),
        "v",
        k=k,
    ).collect()[0]
    assert merged.hashes == direct.hashes
    assert merged.est_distinct == direct.est_distinct


def test_countmin_exact_when_no_collisions(spark):
    rows = [("x",)] * 5 + [("y",)] * 3 + [("z",)] * 1
    df = spark.createDataFrame(rows, "v STRING")
    probes = spark.createDataFrame([("x",), ("y",), ("absent",)], "probe STRING")
    got = {
        r.probe: r.est_count
        for r in countmin_freqs(df, "v", probes, width=4096, depth=4).collect()
    }
    # wide sketch + 3 values -> collision-free: estimates are exact, and
    # the absent probe hits empty buckets -> 0
    assert got == {"x": 5, "y": 3, "absent": 0}


def test_countmin_is_upper_bound(spark):
    values = [f"v{i % 37}" for i in range(1000)]
    df = spark.createDataFrame([(v,) for v in values], "v STRING")
    probes = spark.createDataFrame(
        [(f"v{i}",) for i in range(37)], "probe STRING"
    )
    truth = {f"v{i}": len([v for v in values if v == f"v{i}"]) for i in range(37)}
    # deliberately tiny width to force collisions
    got = {
        r.probe: r.est_count
        for r in countmin_freqs(df, "v", probes, width=16, depth=3).collect()
    }
    assert set(got) == set(truth)
    assert all(got[p] >= truth[p] for p in truth)


def test_countmin_matches_hashlib_replay(spark):
    values = [f"t{i % 11}" for i in range(200)]
    width, depth = 32, 3
    df = spark.createDataFrame([(v,) for v in values], "v STRING")
    probes = spark.createDataFrame([("t3",), ("t7",)], "probe STRING")
    got = {
        r.probe: r.est_count
        for r in countmin_freqs(
            df, "v", probes, width=width, depth=depth
        ).collect()
    }

    def bucket(j, v):
        return int(hashlib.md5(f"{j}|{v}".encode()).hexdigest()[:15], 16) % width

    counts = {}
    for v in values:
        for j in range(depth):
            key = (j, bucket(j, v))
            counts[key] = counts.get(key, 0) + 1
    for p in ("t3", "t7"):
        expected = min(
            counts.get((j, bucket(j, p)), 0) for j in range(depth)
        )
        assert got[p] == expected


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

if HAVE_HYP:
    import pytest

    @pytest.fixture(scope="module")
    def _spark(spark):
        return spark

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        values=st.lists(
            st.text(
                alphabet=st.characters(
                    min_codepoint=32, max_codepoint=126
                ),
                max_size=8,
            ),
            min_size=1,
            max_size=60,
        ),
        cut=st.integers(0, 59),
        k=st.sampled_from([2, 4, 16]),
    )
    def test_kmv_fuzz_replay_and_split_merge(_spark, values, cut, k):
        """Random value multisets: the sketch equals the hashlib replay,
        and merging the sketches of ANY two-way split equals the sketch
        of the whole — the associativity the streaming rollup rests
        on."""
        cut = min(cut, len(values))
        left, right = values[:cut], values[cut:]
        df = _spark.createDataFrame([(v,) for v in values], "v STRING")
        whole = kmv_distinct(df, "v", k=k).collect()[0]
        hashes, n, kth, est = _kmv_expected(values, k)
        assert whole.hashes == hashes
        assert (whole.n_seen, whole.kth_hash, whole.est_distinct) == (
            n, kth, est,
        )
        parts = []
        for tag, chunk in (("l", left), ("r", right)):
            if chunk:
                parts.append(
                    kmv_distinct(
                        _spark.createDataFrame(
                            [(tag, v) for v in chunk], "part STRING, v STRING"
                        ),
                        "v",
                        k=k,
                        group_cols=["part"],
                    )
                )
        merged_src = parts[0]
        for p in parts[1:]:
            merged_src = merged_src.unionByName(p)
        merged = kmv_merge(merged_src, k=k).collect()[0]
        assert merged.hashes == whole.hashes
        assert merged.est_distinct == whole.est_distinct


def test_countmin_merge_equals_table_of_union(spark):
    from ahrd_spark.operators.sketches import (
        countmin_merge,
        countmin_query,
        countmin_table,
    )

    a = [("x",)] * 5 + [("y",)] * 2
    b = [("x",)] * 3 + [("z",)] * 4
    w, d = 64, 3
    t_a = countmin_table(spark.createDataFrame(a, "v STRING"), "v", w, d)
    t_b = countmin_table(spark.createDataFrame(b, "v STRING"), "v", w, d)
    merged = countmin_merge(t_a.unionByName(t_b))
    direct = countmin_table(
        spark.createDataFrame(a + b, "v STRING"), "v", w, d
    )
    got = {(r.j, r.bucket): r.c for r in merged.collect()}
    want = {(r.j, r.bucket): r.c for r in direct.collect()}
    assert got == want
    probes = spark.createDataFrame([("x",), ("z",)], "probe STRING")
    est = {
        r.probe: r.est_count
        for r in countmin_query(merged, probes, w, d).collect()
    }
    assert est == {"x": 8, "z": 4}
