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
