"""Golden-value tests for the scoring core, ported from the reference JUnit
suite (exact doubles — Python floats are IEEE754 doubles, same arithmetic).

Sources of the goldens (reference file:line):
- overlap 0.43                  TokenScoreCalculatorTest.java:48-60
- totals 203.5/160.0/0.88       TokenScoreCalculatorTest.java:63-76
- cumulative sums               TokenScoreCalculatorTest.java:79-114
- token high score 0.2266...    TokenScoreCalculatorTest.java:135-168
- filtered scores -0.111...     TokenScoreCalculatorTest.java:171-185
- lexical 0.5416667             LexicalScoreCalculatorTest.java:57-76
- description score 0.9         DescriptionScoreCalculatorTest.java:44-60
- winner + GO preference        DescriptionScoreCalculatorTest.java:63-102
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

from ahrd_spark.operators.scoring import (
    overlap_score_expr,
    protein_totals,
    score_hits,
    select_winners,
    token_cumulative,
    token_scores,
    top_k_hits,
)

HIT_SCHEMA = StructType(
    [
        StructField("protein_acc", StringType()),
        StructField("db", StringType()),
        StructField("hit_acc", StringType()),
        StructField("short_acc", StringType()),
        StructField("e_value", DoubleType()),
        StructField("bit_score", DoubleType()),
        StructField("q_start", IntegerType()),
        StructField("q_end", IntegerType()),
        StructField("s_start", IntegerType()),
        StructField("s_end", IntegerType()),
        StructField("s_len", IntegerType()),
        StructField("qlen", IntegerType()),
        StructField("description", StringType()),
        StructField("tokens", ArrayType(StringType())),
        StructField("line_no", LongType()),
    ]
)

# br1/br2/br3 of TokenScoreCalculatorTest.java:32-44; protein length 200
BR1 = ("P", "swissprot", "accession_1", "accession_1", 1.0, 69.96, 40, 99, 40,
       99, 200, 200, "description_1", ["token_one"], 1)
BR2 = ("P", "tair", "accession_2", "accession_2", 2.0, 45.54, 45, 69, 45, 69,
       200, 200, "description_2", ["token_one", "token_two"], 2)
BR3 = ("P", "trembl", "accession_3", "accession_3", 2.0, 88.0, 35, 125, 35,
       125, 200, 200, "description_3", ["token_two", "token_three"], 3)

# ahrd_input.yml (JUnit settings): db weights and dsbsw
DB_WEIGHTS = {"swissprot": 100, "tair": 50, "trembl": 10}
DSBSW = {"swissprot": 0.2, "tair": 0.4, "trembl": 0.4}
TOKEN_W = (0.5, 0.3, 0.2)


def hits_df(spark, rows):
    return spark.createDataFrame(rows, HIT_SCHEMA)


def test_overlap_score_golden(spark):
    df = spark.range(1).select(
        overlap_score_expr(
            F.lit(110.0), F.lit(190.0), F.lit(200.0),
            F.lit(10.0), F.lit(100.0), F.lit(200.0),
        ).alias("ovl")
    )
    assert df.first()["ovl"] == pytest.approx(0.43, abs=1e-7)


def test_protein_totals_goldens(spark):
    totals = protein_totals(hits_df(spark, [BR1, BR2, BR3]), DB_WEIGHTS).first()
    assert totals["tot_bit"] == 203.5
    assert totals["tot_db"] == 160.0
    assert totals["tot_ovl"] == 0.88
    assert totals["max_bit"] == 88.0


def test_token_cumulative_goldens(spark):
    rows = token_cumulative(hits_df(spark, [BR1, BR2, BR3]), DB_WEIGHTS).collect()
    by_token = {r["token"]: r for r in rows}
    assert set(by_token) == {"token_one", "token_two", "token_three"}
    assert by_token["token_one"]["cum_bit"] == 115.5
    assert by_token["token_two"]["cum_bit"] == 133.54
    assert by_token["token_three"]["cum_bit"] == 88.0
    assert by_token["token_one"]["cum_db"] == 150.0
    assert by_token["token_two"]["cum_db"] == 60.0
    assert by_token["token_three"]["cum_db"] == 10.0
    assert by_token["token_one"]["cum_ovl"] == 0.425
    # exact Java double including representation error:
    assert by_token["token_two"]["cum_ovl"] == 0.5800000000000001
    assert by_token["token_three"]["cum_ovl"] == 0.455


def _mk_hits_for_token_scores(spark):
    """Reproduces TokenScoreCalculatorTest.testAssignTokenScores: tokens
    one/two/three with mocked cumulative (5b, 10b, 0.05b for b=2/5/10) and
    totals (250/300/3.75)."""
    rows = [
        ("P", "swissprot", "a1", "a1", 1.0, 30.0, 10, 20, 10, 20, 200, 200,
         "one two", ["one", "two"], 1),
        ("P", "swissprot", "a2", "a2", 2.0, 30.0, 10, 20, 10, 20, 200, 200,
         "three", ["three"], 2),
    ]
    return hits_df(spark, rows)


def test_token_high_score_golden(spark):
    topk = _mk_hits_for_token_scores(spark)
    cumulative = spark.createDataFrame(
        [("P", "one", 10.0, 20.0, 0.1),
         ("P", "two", 25.0, 50.0, 0.25),
         ("P", "three", 50.0, 100.0, 0.5)],
        "protein_acc string, token string, cum_bit double, cum_db double, cum_ovl double",
    )
    totals = spark.createDataFrame(
        [("P", 250.0, 300.0, 3.75, 30.0)],
        "protein_acc string, tot_bit double, tot_db double, tot_ovl double, max_bit double",
    )
    ts = token_scores(topk, cumulative, totals, *TOKEN_W).collect()
    high = {r["token_high_score"] for r in ts}
    assert high == {0.22666666666666668}


def test_filter_token_scores_golden(spark):
    """E6 via the composite operator: craft cumulative stats so raw scores
    are exactly 0.222/0.444/0.111/0.555/0.666 (high 0.666), then check the
    reassignment  score - high/2 for non-informative tokens."""
    tokens = {"sheep": 0.222, "goat": 0.444, "ram": 0.111, "batsheep": 0.555,
              "top": 0.666}
    rows = [
        ("P", "swissprot", "a1", "a1", 1.0, 1.0, 10, 20, 10, 20, 200, 200,
         "d", list(tokens), 1),
    ]
    topk = hits_df(spark, rows)
    # raw = 0.5*cum_bit/1 + 0.3*cum_db/1 + 0.2*cum_ovl/1; use cum_bit = 2*score
    cumulative = spark.createDataFrame(
        [("P", t, 2 * s, 0.0, 0.0) for t, s in tokens.items()],
        "protein_acc string, token string, cum_bit double, cum_db double, cum_ovl double",
    )
    totals = spark.createDataFrame(
        [("P", 1.0, 1.0, 1.0, 1.0)],
        "protein_acc string, tot_bit double, tot_db double, tot_ovl double, max_bit double",
    )
    ts = {r["token"]: r for r in
          token_scores(topk, cumulative, totals, *TOKEN_W).collect()}
    assert ts["goat"]["token_score"] == pytest.approx(0.444, abs=1e-12)
    assert ts["batsheep"]["token_score"] == pytest.approx(0.555, abs=1e-12)
    assert ts["top"]["token_score"] == pytest.approx(0.666, abs=1e-12)
    # non-informative: score - high/2 (goes negative)
    assert ts["sheep"]["token_score"] == pytest.approx(0.222 - 0.333, abs=1e-12)
    assert ts["ram"]["token_score"] == pytest.approx(0.111 - 0.333, abs=1e-12)
    assert ts["sheep"]["informative"] is False
    assert ts["goat"]["informative"] is True


def test_lexical_and_description_score_goldens(spark):
    """LexicalScoreCalculatorTest.testLexicalScore: tokens one/two/three with
    scores 0.2/0.3/0.8, high 0.8 -> lexical = 1.625/3 = 0.5416667; hit bit 30,
    max bit 60, swissprot dsbsw 0.2 -> rel bit 0.1."""
    topk = hits_df(spark, [
        ("P", "swissprot", "a1", "a1", 1.0, 30.0, 10, 20, 10, 20, 200, 200,
         "one two three", ["one", "two", "three"], 1),
    ])
    tok = spark.createDataFrame(
        [("P", "one", 0.2, 0.8, False),
         ("P", "two", 0.3, 0.8, False),
         ("P", "three", 0.8, 0.8, True)],
        "protein_acc string, token string, token_score double, "
        "token_high_score double, informative boolean",
    )
    totals = spark.createDataFrame(
        [("P", 1.0, 1.0, 1.0, 60.0)],
        "protein_acc string, tot_bit double, tot_db double, tot_ovl double, max_bit double",
    )
    r = score_hits(topk, tok, totals, DSBSW).first()
    assert r["lexical_score"] == pytest.approx(0.5416667, abs=1e-7)
    assert r["rel_bit_score"] == pytest.approx(0.1, abs=1e-12)
    assert r["desc_score"] == pytest.approx(0.6416667, abs=1e-7)


def _desc_calc_candidates(spark):
    """mockProteinAndBlastResultsForDescriptionScoreCalculatorTest with the
    lexical score fixed at 0.70 (the reference mocks it): we bypass
    score_hits and inject desc_score = 0.7 + dsbsw*bit/max_bit directly."""
    rows = [
        # (acc, db, bit, line_no, description, tokens)
        ("accession_1", "swissprot", 30.0, 1, "description One",
         ["description", "one"]),
        ("accession_2", "swissprot", 30.0, 2, "description Two",
         ["description", "two"]),
        ("accession_3", "swissprot", 30.0, 3,
         'Putative - sUbFaMilY;, " activity|, bad',
         ["putative", "subfamily", "activity", "bad"]),
        ("accession_4", "swissprot", 30.0, 4,
         "family subfamily activity NADH-Dehydrogenase",
         ["family", "subfamily", "activity", "nadh", "dehydrogenase"]),
        ("accession_5", "trembl", 30.0, 5, "description_5 Fly-Wing formation",
         ["description", "5", "fly", "wing", "formation"]),
    ]
    data = [
        ("P", db, acc, acc, 1.0, bit, 10, 20, 10, 20, 200, 200, desc, toks, ln)
        for (acc, db, bit, ln, desc, toks) in rows
    ]
    df = hits_df(spark, data)
    dsbsw = F.create_map(
        F.lit("swissprot"), F.lit(0.2), F.lit("trembl"), F.lit(0.4)
    )
    return df.withColumn(
        "desc_score", F.lit(0.70) + dsbsw[F.col("db")] * F.col("bit_score") / F.lit(30.0)
    )


def test_winner_selection_golden(spark):
    w = select_winners(_desc_calc_candidates(spark)).first()
    assert w["description"] == "description_5 Fly-Wing formation"
    assert w["desc_high_score"] == pytest.approx(1.1, abs=1e-7)


def test_winner_selection_with_go_preference_goldens(spark):
    cands = _desc_calc_candidates(spark)
    goa = spark.createDataFrame(
        [("accession_1", "GO:1234567"), ("accession_1", "GO:7654321"),
         ("accession_4", "GO:1726354"), ("accession_4", "GO:7162534")],
        "short_acc string, go_term string",
    )
    # GOAs present: restrict to GO-having candidates; equal scores 0.9 for
    # accession_1/accession_4 -> last-inserted (accession_4) wins
    w = select_winners(cands, goa=goa, prefer_go=True).first()
    assert w["description"] == "family subfamily activity NADH-Dehydrogenase"
    assert w["desc_high_score"] == pytest.approx(0.8999999, abs=1e-7)
    # GOAs present but for no candidate: behave as normal
    goa_mismatch = spark.createDataFrame(
        [("no_blast_hit_acc_1", "GO:1234567")], "short_acc string, go_term string"
    )
    w2 = select_winners(cands, goa=goa_mismatch, prefer_go=True).first()
    assert w2["description"] == "description_5 Fly-Wing formation"
    assert w2["desc_high_score"] == pytest.approx(1.1, abs=1e-7)


def test_top_k_hits_order_and_stability(spark):
    rows = [
        ("P", "db1", f"a{i}", f"a{i}", float(ev), 10.0, 10, 20, 10, 20, 200,
         200, "d", ["t"], i)
        for i, ev in enumerate([5.0, 1.0, 3.0, 1.0, 2.0])
    ]
    df = hits_df(spark, rows)
    kept = top_k_hits(df, 3).select("hit_acc").collect()
    # e-value asc, parse order on ties: a1 (1.0), a3 (1.0), a4 (2.0)
    assert {r["hit_acc"] for r in kept} == {"a1", "a3", "a4"}
