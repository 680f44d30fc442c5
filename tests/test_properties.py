"""Property-based tests (hypothesis) for the pure-function core.

The reference pins behavior with example-based JUnit tests; these
properties cover the input space those examples sample.  Spark-backed
properties batch ~40 generated strings into ONE DataFrame per example and
keep max_examples small — a hypothesis example per Spark job would take
minutes for no extra coverage.
"""

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from ahrd_spark.plans.trainer import _round_n, normalize_token_weights

# printable ASCII only: Java's \s is ASCII [ \t\n\x0B\f\r] while Python's
# re \s is unicode-aware — the model below must match the JVM regex
ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)


@given(
    st.floats(0.01, 10.0), st.floats(0.01, 10.0), st.floats(0.01, 10.0)
)
def test_normalize_token_weights_sums_to_one(b, d, o):
    """Parameters.normalizeTokenScoreWeights: outputs are 4dp-rounded and
    sum to 1 within the rounding granularity, preserving ratios.

    The bound is exact, not a guess: the reference divides by the
    4dp-ROUNDED sum (s_r), so nb+nd+no = s/s_r plus three per-quotient
    4dp rounding errors (<= 5e-5 each).  A fixed 2e-4 bound is too tight
    when the raw sum is small — e.g. b=d=o=0.03125: s=0.09375 rounds UP
    to 0.0938, each quotient becomes 0.3332, and the total lands at
    0.9996 (4e-4 off) while still being exactly the reference's answer."""
    nb, nd, no = normalize_token_weights(b, d, o)
    s = b + d + o
    s_r = _round_n(s, 4)
    bound = abs(s - s_r) / s_r + 3 * 5e-5 + 1e-9
    assert abs(nb + nd + no - 1.0) <= bound
    for v in (nb, nd, no):
        assert 0.0 < v < 1.0 or v in (0.0, 1.0)
        assert round(v, 4) == v  # 4dp-rounded exactly
    # ratio preservation (up to rounding): nb/nd tracks b/d
    if min(b, d) > 0.1:
        assert abs(nb / nd - b / d) < 0.05 * (b / d) + 0.05


@given(st.floats(-1e6, 1e6), st.integers(0, 6))
def test_round_n_is_java_half_up(x, n):
    """Utils.roundToNDecimalPlaces == Math.round(x * 10^n) / 10^n —
    half-UP on positives (Python's round() half-even would differ)."""
    f = 10.0 ** n
    expected = math.floor(x * f + 0.5) / f
    assert _round_n(x, n) == expected
    # idempotent
    assert _round_n(_round_n(x, n), n) == _round_n(x, n)


@settings(max_examples=5, deadline=None)
@given(st.lists(ASCII_TEXT, min_size=1, max_size=40))
def test_tokenize_matches_python_model(spark, texts):
    """T1 tokenize (Spark, TOKEN_SPLITTER_FAST char class) == the obvious
    Python model: lowercase, split on the delimiter class, dedupe, drop
    empties, sort.  One DataFrame per hypothesis example."""
    from pyspark.sql import functions as F

    from ahrd_spark.functions.text import tokenize_expr

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    )
    got = {
        r["i"]: r["toks"]
        for r in df.select(
            "i", tokenize_expr(F.col("text")).alias("toks")
        ).collect()
    }
    splitter = re.compile(r"[-/;\\,:\"'.|()\s]+")
    for i, t in enumerate(texts):
        want = sorted({tok for tok in splitter.split(t.lower()) if tok})
        assert got[i] == want, (t, got[i], want)


@settings(max_examples=5, deadline=None)
@given(st.lists(ASCII_TEXT.filter(lambda s: s.strip()), min_size=2, max_size=20))
def test_minhash_properties(spark, texts):
    """MinHash signature invariants: identical text -> identical signature
    (duplicate detection soundness); every value in [0, P); length is the
    requested seed count."""
    from ahrd_spark.operators.dedup import MINHASH_P, minhash_signature

    rows = [(f"a{i}", t) for i, t in enumerate(texts)]
    rows += [(f"b{i}", t) for i, t in enumerate(texts)]  # exact duplicates
    df = spark.createDataFrame(rows, "doc_id string, text string")
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signature(df).collect()}
    for i in range(len(texts)):
        assert sigs[f"a{i}"] == sigs[f"b{i}"]
        assert len(sigs[f"a{i}"]) == 16
        assert all(0 <= v < MINHASH_P for v in sigs[f"a{i}"])


import pytest  # noqa: E402
from hypothesis import HealthCheck  # noqa: E402


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=1, max_size=6
        ),
        min_size=2,
        max_size=12,
    ),
    theta=st.sampled_from([0.34, 0.5, 0.67, 0.8, 1.0]),
)
def test_setsim_join_fuzz_no_false_negatives(_spark, docs, theta):
    """Random small-alphabet token sets at awkward thresholds: the
    prefix-filter join must equal the brute-force all-pairs answer —
    in BOTH directions (no false negatives AND no spurious pairs)."""
    import itertools

    from ahrd_spark.operators.dedup import setsim_join

    rows = [(str(i), toks) for i, toks in enumerate(docs)]
    df = _spark.createDataFrame(rows, "doc_id STRING, toks ARRAY<STRING>")
    got = {
        (r.id_a, r.id_b): r.jaccard_r
        for r in setsim_join(
            df, theta, allow_low_threshold=True
        ).collect()
    }
    sets = {i: set(t) for i, t in rows}
    want = {}
    for x, y in itertools.combinations(sorted(sets), 2):
        j = round(len(sets[x] & sets[y]) / len(sets[x] | sets[y]), 6)
        if j >= round(theta, 6):
            want[(x, y)] = j
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    scores=st.lists(
        st.tuples(
            st.integers(0, 3),            # query
            st.integers(0, 6),            # candidate id
            st.integers(0, 5),            # score bucket (forces ties)
            st.booleans(),                # gold flag
        ),
        min_size=1,
        max_size=30,
    ),
)
def test_link_prediction_fuzz_matches_reference(_spark, scores):
    """Random scored panels with deliberate ties: MRR/Hits@k equal a
    plain-Python realistic-rank reference."""
    from ahrd_spark.operators.evaluation import link_prediction_metrics

    rows = [
        (f"q{q}", f"c{c}", round(s / 5.0, 6), g)
        for q, c, s, g in scores
    ]
    if not any(g for *_x, g in rows):
        rows.append(("q0", "cg", 0.4, True))
    df = _spark.createDataFrame(
        rows, "query_id STRING, candidate STRING, score_r DOUBLE,"
        " is_gold BOOLEAN"
    )
    row = link_prediction_metrics(df).collect()[0]

    # the operator's contract: duplicate (query, candidate) rows
    # collapse first (max score, OR gold) — the panel is a set
    dedup: dict = {}
    for q, c, s, g in rows:
        ps, pg = dedup.get((q, c), (float("-inf"), False))
        dedup[(q, c)] = (max(ps, s), pg or g)
    by_q: dict = {}
    for (q, c), (s, g) in dedup.items():
        by_q.setdefault(q, []).append((c, s, g))
    ranks = []
    for q, cands in by_q.items():
        for gc, gs, g in cands:
            if not g:
                continue
            higher = sum(1 for _c, s, _g in cands if s > gs)
            equal = sum(1 for _c, s, _g in cands if s == gs) - 1
            ranks.append(1.0 + higher + equal / 2.0)
    assert row.n_gold == len(ranks)
    assert row.mrr_r == pytest.approx(
        round(sum(1.0 / r for r in ranks) / len(ranks), 6), abs=1e-6
    )
    for k in (1, 3, 10):
        assert getattr(row, f"hits{k}_r") == pytest.approx(
            round(
                sum(1.0 for r in ranks if r <= k) / len(ranks), 6
            ),
            abs=1e-6,
        )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    preds=st.lists(
        st.tuples(
            # deliberately include exact bin edges (i/10, i/20) and the
            # awkward doubles whose *10 product floors DOWN (0.3, 0.7):
            # bin membership must agree with the same double math
            st.sampled_from(
                [i / 20.0 for i in range(21)]
                + [0.3, 0.7, 0.1, 0.9999995, 1e-7, 0.123456789]
            ),
            st.booleans(),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_calibration_bins_fuzz_matches_reference(_spark, preds):
    """Random probability/label panels with duplicates and exact
    bin-edge probabilities: bins, per-bin stats, and ECE equal a
    plain-Python reliability-diagram reference (same round-6 gate,
    same double arithmetic for the bin floor)."""
    from ahrd_spark.operators.evaluation import calibration_bins

    rows = [(round(p, 6), bool(y)) for p, y in preds]
    df = _spark.createDataFrame(rows, "prob_r DOUBLE, label BOOLEAN")
    got = {
        r.bin: (r.n, r.conf_r, r.acc_r, r.ece_r)
        for r in calibration_bins(df, n_bins=10).collect()
    }

    bins: dict = {}
    for p, y in rows:
        b = min(math.floor(p * 10), 9)
        bins.setdefault(b, []).append((p, float(y)))
    n_total = len(rows)
    want = {}
    stats = {
        b: (
            len(v),
            round(sum(p for p, _y in v) / len(v), 6),
            round(sum(y for _p, y in v) / len(v), 6),
        )
        for b, v in bins.items()
    }
    ece = round(
        sum(n * abs(acc - conf) for n, conf, acc in stats.values())
        / n_total,
        6,
    )
    for b, (n, conf, acc) in stats.items():
        want[b] = (n, conf, acc, ece)
    assert got == {
        b: (n, pytest.approx(conf, abs=1e-6), pytest.approx(acc, abs=1e-6),
            pytest.approx(e, abs=1e-6))
        for b, (n, conf, acc, e) in want.items()
    }
