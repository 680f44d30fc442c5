"""Tokenization / regex / formatting goldens (BlastResultTest.java:36-60,
TokenScoreCalculatorTest blacklist semantics, AbstractOutputWriter format)."""

import pytest
from pyspark.sql import functions as F

from ahrd_spark.config import load_config
from ahrd_spark.functions.format import format_number_expr
from ahrd_spark.functions.text import (
    apply_filter_regexes,
    blacklist_fails_expr,
    named_group_index,
    patternize_expr,
    repair_double_expr,
    tokenize_expr,
)

REF = "/root/reference"


@pytest.fixture(scope="module")
def junit_cfg():
    return load_config(f"{REF}/test/resources/ahrd_input.yml", base_dir=REF)


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_tokenize_goldens(spark, junit_cfg):
    bl = junit_cfg.db("swissprot").token_blacklist
    toks = one(
        spark, tokenize_expr(F.lit("one tWo Three protein homolog putative"), bl)
    )
    assert sorted(toks) == ["one", "three", "two"]
    toks2 = one(spark, tokenize_expr(F.lit("Flavohemoprotein-1"), bl))
    assert sorted(toks2) == ["1", "flavohemoprotein"]


def test_patternize_golden(spark):
    # underscore is NOT in TOKEN_SPLITTER_REGEX -> "description_5" stays whole
    toks = tokenize_expr(F.lit("description_5 Fly-Wing formation"))
    assert one(spark, patternize_expr(toks)) == "description_5flyformationwing"


def test_patternize_golden_preset_tokens(spark):
    # BlastResultTest.java:36-41 passes the token set explicitly
    arr = F.array(*[F.lit(t) for t in ["description", "5", "fly", "wing", "formation"]])
    assert one(spark, patternize_expr(arr)) == "5descriptionflyformationwing"


def test_repair_double(spark):
    v = one(spark, repair_double_expr(F.lit("e-105")).cast("double"))
    assert v == 1e-105
    v2 = one(spark, repair_double_expr(F.lit("2e-19")).cast("double"))
    assert v2 == 2e-19


def test_description_blacklist(spark, junit_cfg):
    bl = junit_cfg.db("swissprot").blacklist
    fails = lambda s: one(spark, blacklist_fails_expr(F.lit(s), bl))  # noqa: E731
    assert fails("Whole genome shotgun sequence") is True
    assert fails("similar to protein kinase") is True
    assert fails("") is True
    assert fails("Endoribonuclease Dicer homolog 2") is False


def test_description_filter_order_and_whitespace(spark, junit_cfg):
    flt = junit_cfg.db("swissprot").filter
    out = one(
        spark,
        apply_filter_regexes(
            F.lit("Endoribonuclease Dicer homolog 2 OS=Arabidopsis thaliana GN=DCL2 PE=2 SV=2"),
            flt,
        ),
    )
    assert out == "Endoribonuclease Dicer homolog 2"


def test_format_number(spark):
    fmt = lambda x: one(spark, format_number_expr(F.lit(x)))  # noqa: E731
    assert fmt(float("nan")) == "NA"
    assert fmt(float("inf")) == "NA"
    assert fmt(0.5416667) == "0.542"
    assert fmt(2.0) == "2"
    assert fmt(1.5) == "1.5"
    assert fmt(1234.5) == "1,234.5"


def test_named_group_index():
    from ahrd_spark.config import (
        DEFAULT_FASTA_HEADER_REGEX,
        DEFAULT_REFERENCE_GO_REGEX,
        DEFAULT_SHORT_ACCESSION_REGEX,
    )

    assert named_group_index(DEFAULT_FASTA_HEADER_REGEX, "accession") == 1
    assert named_group_index(DEFAULT_FASTA_HEADER_REGEX, "description") == 2
    assert named_group_index(DEFAULT_SHORT_ACCESSION_REGEX, "shortAccession") == 1
    # GOA regex has a lookahead — translation must not break it
    assert named_group_index(DEFAULT_REFERENCE_GO_REGEX, "shortAccession") == 1
    assert named_group_index(DEFAULT_REFERENCE_GO_REGEX, "goTerm") == 2


def test_fast_splitter_equivalent_to_reference_alternation(spark):
    """TOKEN_SPLITTER_FAST (character class, runs collapsed) must produce
    the identical final token set as the reference's 12-branch alternation
    (BlastResult.java:29) after the empty-drop + distinct + sort steps, on
    adversarial strings and on every description in the fixture BLAST table."""
    from ahrd_spark.config import TOKEN_SPLITTER_FAST, TOKEN_SPLITTER_REGEX

    adversarial = [
        "a--b", "x  y", "-lead", "trail-", "a-/;,:'\".|()b", "", "   ",
        "Flavohemoprotein-1", "OS=Arabidopsis (thaliana) | AT1G01040.1",
        'quo"ted\'mix', "dots...dots", "tab\tand\nnewline mix",
        "under_score.kept-split", "\\backslash\\path",
    ]
    rows = [(s,) for s in adversarial]
    df = spark.createDataFrame(rows, "s string")
    both = df.select(
        F.array_sort(
            F.filter(
                F.array_distinct(F.split(F.lower("s"), TOKEN_SPLITTER_REGEX)),
                lambda t: t != F.lit(""),
            )
        ).alias("ref"),
        F.array_sort(
            F.filter(
                F.array_distinct(F.split(F.lower("s"), TOKEN_SPLITTER_FAST)),
                lambda t: t != F.lit(""),
            )
        ).alias("fast"),
    )
    for r in both.collect():
        assert r["ref"] == r["fast"]

    blast = spark.read.text(
        f"{REF}/test/resources/swissprot_blast_db.fasta"
    )
    fx = blast.select(F.col("value").alias("s")).select(
        F.array_sort(
            F.filter(
                F.array_distinct(F.split(F.lower("s"), TOKEN_SPLITTER_REGEX)),
                lambda t: t != F.lit(""),
            )
        ).alias("ref"),
        F.array_sort(
            F.filter(
                F.array_distinct(F.split(F.lower("s"), TOKEN_SPLITTER_FAST)),
                lambda t: t != F.lit(""),
            )
        ).alias("fast"),
    )
    assert fx.filter(F.col("ref") != F.col("fast")).count() == 0

def test_has_token_expr_equivalent_to_tokenize_nonempty(spark):
    """has_token_expr (the mention gate's cheap ">=1 token" predicate) must
    agree with size(tokenize_expr(...)) > 0 on every input, for both the
    empty-blacklist rlike path and the exists() blacklist path — including
    strings made ONLY of splitter chars, empties, and unicode."""
    from ahrd_spark.functions.text import has_token_expr, tokenize_expr

    strings = [
        "a--b", "x  y", "-lead", "trail-", "a-/;,:'\".|()b", "", "   ",
        "-/;,:'\".|()", "...", "|", "Flavohemoprotein-1", "123",
        "OS=Arabidopsis (thaliana) | AT1G01040.1", "\\", "\\a\\",
        "ünïcödé tökens", "UPPER lower MiXeD", "\t\n ", "e-105", "(1)",
        "kinase", "putative protein 42", "42 7 9", None,
    ]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    for bl in [(), ("(?i)^\\d+$",), ("(?i)protein", "^e$"), ("^.*$",)]:
        got = df.select(
            F.coalesce(has_token_expr(F.col("s"), bl), F.lit(False)).alias("fast"),
            F.coalesce(
                F.size(tokenize_expr(F.col("s"), bl)) > 0, F.lit(False)
            ).alias("full"),
            "s",
        )
        bad = [r for r in got.collect() if r["fast"] != r["full"]]
        assert not bad, f"blacklist={bl}: {bad}"


def test_has_token_expr_hypothesis(spark):
    """Property: has_token_expr == (size(tokenize_expr) > 0) over random
    strings drawn from a splitter-heavy alphabet."""
    from hypothesis import given, settings, strategies as st

    from ahrd_spark.functions.text import has_token_expr, tokenize_expr

    alphabet = "ab1-/;,:'\".|() \t\\Z"
    collected: list[str] = []

    @settings(max_examples=60, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=24))
    def gather(s):
        collected.append(s)

    gather()
    df = spark.createDataFrame([(s,) for s in collected], "s string")
    for bl in [(), ("^[ab]+$",)]:
        got = df.select(
            F.coalesce(has_token_expr(F.col("s"), bl), F.lit(False)).alias("fast"),
            F.coalesce(
                F.size(tokenize_expr(F.col("s"), bl)) > 0, F.lit(False)
            ).alias("full"),
            "s",
        )
        bad = [r for r in got.collect() if r["fast"] != r["full"]]
        assert not bad, f"blacklist={bl}: {bad}"
