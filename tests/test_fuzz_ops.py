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


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(st.sampled_from(["u", "v", "w"]), st.integers(0, 99)),
        min_size=1,
        max_size=30,
    ),
    period=st.sampled_from([7, 10, 25]),
)
def test_cohort_retention_matches_python(_spark, events, period):
    from ahrd_spark.operators.events import cohort_retention

    df = _spark.createDataFrame(events, "k string, ts long")
    got = {(r["cohort_period"], r["period_offset"]): r["active_cnt"]
           for r in cohort_retention(df, "k", "ts", period=period).collect()}
    first = {}
    for k, ts in events:
        p = ts // period
        first[k] = min(first.get(k, p), p)
    cells = {}
    for k, ts in set(events):
        cell = (first[k], ts // period - first[k])
        cells.setdefault(cell, set()).add(k)
    assert got == {c: len(ks) for c, ks in cells.items()}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seq=st.lists(st.sampled_from("abcd"), min_size=1, max_size=25)
)
def test_novelty_curve_matches_python(_spark, seq):
    from ahrd_spark.operators.sequences import novelty_curve

    rows = [("k", i, i, s) for i, s in enumerate(seq)]
    df = _spark.createDataFrame(rows, "k string, t long, eid long, s string")
    got = {r["eid"]: (r["is_new"], r["distinct_so_far"])
           for r in novelty_curve(df, ["k"], ["t", "eid"], "s").collect()}
    seen = set()
    for i, s in enumerate(seq):
        new = int(s not in seen)
        seen.add(s)
        assert got[i] == (new, len(seen))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=20),
        min_size=1,
        max_size=20,
    ),
    cap=st.sampled_from([1, 3, 10]),
)
def test_inverted_index_cap_is_prefix_of_uncapped(_spark, docs, cap):
    """The salted two-phase cap must equal the global first-N prefix for
    ANY doc distribution (the merge-of-salted-minima argument)."""
    from ahrd_spark.operators.retrieval import inverted_index

    df = _spark.createDataFrame(
        list(enumerate(docs)), "doc_id bigint, text string"
    )
    full = {r["term"]: (r["df"], r["postings"])
            for r in inverted_index(df).collect()}
    capped = {r["term"]: (r["df"], r["postings"])
              for r in inverted_index(df, max_postings=cap).collect()}
    assert set(full) == set(capped)
    for term, (n, postings) in full.items():
        cn, cp = capped[term]
        assert cn == n
        assert cp == postings[:cap]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(st.sampled_from(["u", "v"]), st.sampled_from("abc")),
        min_size=1,
        max_size=25,
    ),
    gap=st.sampled_from([1, 3, 10]),
)
def test_session_paths_match_python(_spark, events, gap):
    from ahrd_spark.operators.sequences import session_paths

    # timestamps = index*2 so gaps of 2 are constant; vary gap threshold
    rows = [(k, i * 2, i, s) for i, (k, s) in enumerate(events)]
    df = _spark.createDataFrame(rows, "k string, t long, eid long, s string")
    got = {r["path"]: r["n_sessions"]
           for r in session_paths(df, ["k"], ["t", "eid"], "s",
                                  gap=gap).collect()}
    per = {}
    for k, t, _i, s in rows:
        per.setdefault(k, []).append((t, s))
    paths = {}
    for k, evs in per.items():
        evs.sort()
        cur, prev_t = [], None
        for t, s in evs:
            if prev_t is not None and t - prev_t > gap:
                p = ">".join(cur)
                paths[p] = paths.get(p, 0) + 1
                cur = []
            cur.append(s)
            prev_t = t
        p = ">".join(cur)
        paths[p] = paths.get(p, 0) + 1
    assert got == paths


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=2,
        max_size=30,
    )
)
def test_winsorize_bounds_and_identity_inside_band(_spark, vals):
    from ahrd_spark.operators.profile import winsorize

    df = _spark.createDataFrame([("g", float(v)) for v in vals],
                                "k string, v double")
    out = winsorize(df, ["k"], "v", lo_q=0.1, hi_q=0.9).collect()
    assert len(out) == len(vals)
    lo = min(r["clipped"] for r in out)
    hi = max(r["clipped"] for r in out)
    for r in out:
        assert lo <= r["clipped"] <= hi
        if r["was_clipped"] == 0:
            assert r["clipped"] == r["v"]
        else:
            assert r["clipped"] in (lo, hi) or abs(r["v"]) >= abs(r["clipped"])
    # clipping never widens the range
    assert lo >= min(vals) and hi <= max(vals)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.tuples(st.sampled_from(["g", "h"]), st.sampled_from("abcd")),
        min_size=1,
        max_size=30,
    )
)
def test_group_mode_matches_python(_spark, vals):
    from collections import Counter

    from ahrd_spark.operators.profile import group_mode

    df = _spark.createDataFrame(vals, "k string, v string")
    got = {r["k"]: (r["mode_value"], r["n"])
           for r in group_mode(df, ["k"], "v").collect()}
    per = {}
    for k, v in vals:
        per.setdefault(k, []).append(v)
    for k, vs in per.items():
        c = Counter(vs)
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        assert got[k] == best


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    iv=st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 20)),
        min_size=1,
        max_size=25,
    )
)
def test_merge_intervals_matches_python(_spark, iv):
    from ahrd_spark.operators.intervals import merge_intervals

    rows = [("k", lo, lo + ln) for lo, ln in iv]
    df = _spark.createDataFrame(rows, "k string, lo long, hi long")
    got = sorted(
        (r["lo"], r["hi"], r["n_merged"])
        for r in merge_intervals(df, ["k"]).collect()
    )
    ivs = sorted((lo, hi) for _, lo, hi in rows)
    blocks = []
    for lo, hi in ivs:
        if blocks and lo <= blocks[-1][1]:
            blocks[-1][1] = max(blocks[-1][1], hi)
            blocks[-1][2] += 1
        else:
            blocks.append([lo, hi, 1])
    assert got == sorted((lo, hi, n) for lo, hi, n in blocks)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lts=st.lists(st.integers(0, 50), min_size=1, max_size=15),
    rts=st.lists(st.integers(0, 50), min_size=1, max_size=15),
)
def test_asof_join_matches_python(_spark, lts, rts):
    from ahrd_spark.operators.asof import asof_join

    left = _spark.createDataFrame(
        [("k", t, i) for i, t in enumerate(lts)],
        "k string, ts long, lid bigint",
    )
    # unique right timestamps: latest-preceding is then unambiguous
    right = _spark.createDataFrame(
        [("k", t, float(t)) for t in sorted(set(rts))],
        "k string, ts long, payload double",
    )
    out = asof_join(left, right, keys=["k"]).collect()
    rset = sorted(set(rts))
    for r in out:
        preceding = [t for t in rset if t <= r["ts"]]
        if preceding:
            assert r["asof_ts"] == preceding[-1]
            assert r["asof_payload"] == float(preceding[-1])
        else:
            assert r["asof_ts"] is None and r["asof_payload"] is None
    assert len(out) == len(lts)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seqs=st.dictionaries(
        st.sampled_from(["u", "v"]),
        st.lists(st.sampled_from("abc"), min_size=1, max_size=15),
        min_size=1,
    )
)
def test_transition_matrix_matches_python(_spark, seqs):
    from collections import Counter

    from ahrd_spark.operators.sequences import transition_matrix

    rows = [(k, i, i, s)
            for k, seq in seqs.items() for i, s in enumerate(seq)]
    df = _spark.createDataFrame(rows, "k string, t long, eid long, s string")
    got = {(r["from_state"], r["to_state"]): (r["n"], r["p"])
           for r in transition_matrix(df, ["k"], ["t", "eid"],
                                      state_col="s").collect()}
    c = Counter()
    for seq in seqs.values():
        for a, b in zip(seq, seq[1:]):
            c[(a, b)] += 1
    row_tot = Counter()
    for (a, _b), n in c.items():
        row_tot[a] += n
    assert set(got) == set(c)
    for (a, b), n in c.items():
        gn, gp = got[(a, b)]
        assert gn == n and abs(gp - n / row_tot[a]) < 1e-12


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 100),
                  st.floats(min_value=-10, max_value=10, allow_nan=False)),
        min_size=1,
        max_size=20,
    ),
    hl=st.sampled_from([5.0, 20.0]),
)
def test_decayed_sum_matches_python(_spark, pts, hl):
    from ahrd_spark.operators.sequences import decayed_sum

    df = _spark.createDataFrame([("k", t, v) for t, v in pts],
                                "k string, t long, v double")
    r = decayed_sum(df, ["k"], "t", "v", half_life=hl).collect()[0]
    last = max(t for t, _ in pts)
    expect = sum(v * 0.5 ** ((last - t) / hl) for t, v in pts)
    assert r["last_ts"] == last and r["n"] == len(pts)
    assert abs(r["decayed_value"] - expect) < 1e-9


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    act=st.lists(
        st.tuples(st.sampled_from("abcde"), st.integers(0, 15)),
        min_size=1,
        max_size=30,
    ),
    w=st.sampled_from([1, 3, 7]),
)
def test_active_users_matches_python(_spark, act, w):
    from ahrd_spark.operators.events import active_users_window

    df = _spark.createDataFrame(act, "k string, day bigint")
    got = {r["day"]: (r["dau"], r["wau"])
           for r in active_users_window(df, "k", "day",
                                        window_days=w).collect()}
    days = {d for _, d in act}
    max_day = max(days)
    for d in range(min(days), max_day + 1):
        dau = len({k for k, dd in act if dd == d})
        wau = len({k for k, dd in act if d - w + 1 <= dd <= d})
        if wau == 0:
            assert d not in got
        else:
            assert got[d] == (dau, wau)
    assert max(got) <= max_day


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.floats(min_value=-30, max_value=130, allow_nan=False),
        min_size=1,
        max_size=30,
    )
)
def test_fixed_histogram_matches_python(_spark, vals):
    from collections import Counter

    from ahrd_spark.operators.profile import fixed_histogram

    df = _spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = {r["bin"]: r["n"]
           for r in fixed_histogram(df, "v", lo=0.0, width=10.0,
                                    n_bins=10).collect()}
    ref = Counter(min(max(int(v // 10), 0), 9) for v in vals)
    assert got == dict(ref)
    assert sum(got.values()) == len(vals)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    baskets=st.lists(
        st.tuples(st.integers(0, 6), st.sampled_from("pqrs")),
        min_size=1,
        max_size=30,
    )
)
def test_cooccurrence_matches_python(_spark, baskets):
    from collections import Counter
    from itertools import combinations

    from ahrd_spark.operators.graph import cooccurrence_projection

    df = _spark.createDataFrame(baskets, "g bigint, i string")
    got = {(r["item_a"], r["item_b"]): r["n"]
           for r in cooccurrence_projection(df, "g", "i").collect()}
    per = {}
    for g, i in set(baskets):
        per.setdefault(g, set()).add(i)
    ref = Counter()
    for items in per.values():
        for a, b in combinations(sorted(items), 2):
            ref[(a, b)] += 1
    assert got == dict(ref)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=1,
        max_size=25,
    ),
    k=st.sampled_from([2.0, 3.5]),
)
def test_mad_outliers_matches_python(_spark, vals, k):
    import statistics

    from ahrd_spark.operators.profile import mad_outliers

    df = _spark.createDataFrame([("g", float(v)) for v in vals],
                                "k string, v double")
    out = mad_outliers(df, ["k"], "v", k=k).collect()
    med = statistics.median(vals)
    mad = statistics.median(abs(v - med) for v in vals)
    for r in out:
        assert abs(r["med"] - med) < 1e-9
        assert abs(r["mad"] - mad) < 1e-9
        if mad > 0:
            import math

            mz = 0.6745 * (r["v"] - med) / mad
            # subnormal MADs overflow to inf identically on both sides
            if math.isinf(mz):
                assert r["mad_z"] == mz
            else:
                assert abs(r["mad_z"] - mz) < 1e-9 * max(1.0, abs(mz))
            assert r["is_outlier"] == int(abs(mz) > k)
        else:
            assert r["mad_z"] is None and r["is_outlier"] == 0


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(
        st.tuples(st.sampled_from(["g", "h"]), st.sampled_from("xyz")),
        min_size=1,
        max_size=25,
    )
)
def test_pivot_counts_matches_python(_spark, counts):
    from collections import Counter

    from ahrd_spark.operators.events import pivot_counts

    df = _spark.createDataFrame(counts, "k string, t string")
    got = {r["k"]: (r["n_x"], r["n_y"], r["n_z"])
           for r in pivot_counts(df, ["k"], "t", ["x", "y", "z"]).collect()}
    ref = Counter(counts)
    for k in {k for k, _ in counts}:
        assert got[k] == (ref[(k, "x")], ref[(k, "y")], ref[(k, "z")])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=25),
        min_size=2,
        max_size=10,
    )
)
def test_containment_matches_python(_spark, texts):
    from ahrd_spark.operators.dedup import containment_pairs

    docs = _spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    pairs = _spark.createDataFrame(
        [(i, i + 1) for i in range(len(texts) - 1)],
        "doc_a bigint, doc_b bigint",
    )
    out = containment_pairs(docs, pairs).collect()

    def toks(t):
        # mirror the operator: split lower(trim) on \s+ (empty text -> {''})
        import re
        return set(re.split(r"\s+", t.strip().lower()))

    for r in out:
        a, b = toks(texts[r["doc_a"]]), toks(texts[r["doc_b"]])
        inter = len(a & b)
        assert abs(r["containment_a"] - inter / len(a)) < 1e-12
        assert abs(r["containment_b"] - inter / len(b)) < 1e-12
        assert abs(r["jaccard"] - inter / len(a | b)) < 1e-12
    assert len(out) == len(texts) - 1
