"""Property-based checks for the relational operators: random inputs vs
straightforward Python references / self-validating invariants.  The
funnel fuzz (test_fuzz_text.py) caught a real ANSI divide-by-zero;
these cover the bin-boundary and fixpoint cases unit examples miss."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


FLOATS = st.floats(
    min_value=-50.0, max_value=50.0, allow_nan=False, allow_infinity=False
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=st.lists(st.tuples(FLOATS, FLOATS), min_size=1, max_size=15),
    b=st.lists(st.tuples(FLOATS, FLOATS), min_size=1, max_size=15),
    width=st.sampled_from([0.5, 1.0, 3.0, 7.0]),
)
def test_interval_join_equals_naive_on_random_intervals(_spark, a, b, width):
    from ahrd_spark.operators.rangejoin import interval_join

    ai = [(i, min(x, y), max(x, y)) for i, (x, y) in enumerate(a)]
    bi = [(j, min(x, y), max(x, y)) for j, (x, y) in enumerate(b)]
    left = _spark.createDataFrame(ai, "id_a bigint, lo_a double, hi_a double")
    right = _spark.createDataFrame(bi, "id_b bigint, lo_b double, hi_b double")
    out = interval_join(left, right, bin_width=width).collect()
    got = sorted((r["id_a"], r["id_b"]) for r in out)
    naive = sorted(
        (i, j)
        for i, lo_a, hi_a in ai
        for j, lo_b, hi_b in bi
        if lo_a <= hi_b and lo_b <= hi_a
    )
    # exact pair set AND no duplicate pair from multi-bin meetings
    assert got == naive


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=30,
    ),
    k=st.integers(min_value=1, max_value=3),
)
def test_kcore_fixpoint_invariant(_spark, edges, k):
    """Every surviving node's degree within the survivors is >= k, and
    the result equals the classic sequential peel."""
    from ahrd_spark.operators.graph import kcore

    df = _spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in edges], "src string, dst string"
    )
    got = {r["node"]: r["deg"] for r in kcore(df, k=k).collect()}
    # sequential reference peel
    adj = {}
    for x, y in edges:
        if x == y:
            continue
        adj.setdefault(f"n{x}", set()).add(f"n{y}")
        adj.setdefault(f"n{y}", set()).add(f"n{x}")
    changed = True
    while changed:
        doomed = [n for n, ns in adj.items() if len(ns) < k]
        changed = bool(doomed)
        for n in doomed:
            for m in adj.pop(n):
                adj[m].discard(n)
    assert got == {n: len(ns) for n, ns in adj.items()}
    assert all(d >= k for d in got.values())


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seq=st.lists(
        st.sampled_from(["a", "b", None]), min_size=1, max_size=25
    )
)
def test_scd2_runs_match_python_rle(_spark, seq):
    from ahrd_spark.operators.sequences import scd2_intervals

    rows = [("k", i, i, v) for i, v in enumerate(seq)]
    df = _spark.createDataFrame(
        rows, "k string, t long, eid long, attr string"
    )
    out = scd2_intervals(df, ["k"], ["t", "eid"], "attr").collect()
    got = sorted(
        (r["valid_from"], r["attr"], r["valid_to"], r["n_events"])
        for r in out
    )
    # python run-length encoding reference
    runs, start = [], 0
    for i in range(1, len(seq) + 1):
        if i == len(seq) or seq[i] != seq[start]:
            runs.append((start, seq[start], i - start))
            start = i
    expect = sorted(
        (s, v, (s + n) if (s + n) < len(seq) else None, n)
        for s, v, n in runs
    )
    assert got == expect


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ts=st.lists(st.integers(0, 100), min_size=1, max_size=25),
    w=st.sampled_from([1, 5, 20]),
)
def test_rolling_features_match_python_window(_spark, ts, w):
    from ahrd_spark.operators.sequences import rolling_window_features

    rows = [("k", t, float(i)) for i, t in enumerate(ts)]
    df = _spark.createDataFrame(rows, "k string, t long, v double")
    out = rolling_window_features(df, ["k"], "t", windows_s=[w],
                                  value_col="v").collect()
    for r in out:
        # RANGE semantics: every row with ts in [t-w, t] is in the frame,
        # including same-timestamp peers
        inside = [(t, v) for (_, t, v) in rows if r["t"] - w <= t <= r["t"]]
        assert r[f"cnt_{w}s"] == len(inside)
        assert abs(r[f"sum_{w}s"] - sum(v for _, v in inside)) < 1e-9
