"""The AHRD lexical-scoring core as declarative DataFrame plans.

Every operator is a pure function DataFrame -> DataFrame built from native
``pyspark.sql.functions`` (JVM expressions, whole-stage codegen; zero Python
in the hot path).  See ``scoring_pandas.py`` for the equivalent vectorized
``applyInPandas`` formulation (one shuffle by protein, NumPy math per group).

Parity map (reference file:line):
- E1  overlap score          TokenScoreCalculator.java:80-83
- E2  cumulative token sums  TokenScoreCalculator.java:157-165,205-227
- E3  total per-protein sums TokenScoreCalculator.java:174-181
- K1  top-200 by e-value     BlastResult.java:375-382, AHRD.java:157-162
- E4  token score            TokenScoreCalculator.java:187-203
- E5  token high score       TokenScoreCalculator.java:105-124
- E6  token-score filtering  TokenScoreCalculator.java:131-148
- E7  lexical score          LexicalScoreCalculator.java:12-33
- E8  relative BLAST score   DescriptionScoreCalculator.java:110-118
- E9  description score      DescriptionScoreCalculator.java:105-108
- E10 winner selection       DescriptionScoreCalculator.java:78-103
      (the reference's Map<Double,BlastResult> makes ties
      HashMap-order-dependent; we impose the total order
      (desc_score DESC, db ASC, hit_acc ASC, line_no ASC))

Ordering subtlety preserved exactly: E2/E3 cumulative & total sums are
accumulated over ALL valid parsed hits (at ingest time, Protein.java:139-151),
while token scores/high-score/winner consider only the per-(protein,db)
top-200 by e-value (AHRD.java:217-245).

Scale notes: every shuffle in this module is keyed by protein_acc or
(protein_acc, token) — never by raw token — so hot tokens ("kinase",
"protein") cannot produce a skewed reduce task; the heaviest key is the
busiest *protein*, which the 200-hits/db cap bounds.  All aggregations are
hash-aggs with map-side partial combine.  The small dicts (db weights) are
inlined as literal maps, not joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def jdiv(num: Column, den: Column) -> Column:
    """Division with Java double semantics: x/0 -> +/-Infinity, 0/0 -> NaN.

    Spark's `/` yields NULL on zero denominators (non-ANSI mode); the
    reference's scores rely on Java float semantics (e.g. the correction
    factor with zero informative tokens -> Infinity -> lexical score 0.0).
    """
    inf = F.lit(float("inf"))
    return (
        F.when(den != 0, num / den)
        .when(num > 0, inf)
        .when(num < 0, -inf)
        .otherwise(F.lit(float("nan")))
    )


def weight_map_expr(weights: dict) -> Column:
    """A small dict (db -> weight) as a literal CreateMap expression — stays
    inside codegen; no join, no broadcast needed."""
    items = []
    for k, v in weights.items():
        items += [F.lit(k), F.lit(float(v))]
    return F.create_map(*items)


def overlap_score_expr(
    q_start: Column, q_end: Column, q_len: Column, s_start: Column,
    s_end: Column, s_len: Column,
) -> Column:
    """E1: ((qEnd-qStart+1)+(sEnd-sStart+1)) / (qLen+sLen)."""
    aligned = (q_end - q_start + F.lit(1.0)) + (s_end - s_start + F.lit(1.0))
    return aligned / (q_len + s_len)


def with_overlap(hits: DataFrame) -> DataFrame:
    """Adds the E1 `overlap` column; expects q_start/q_end/qlen/s_start/
    s_end/s_len columns."""
    return hits.withColumn(
        "overlap",
        overlap_score_expr(
            F.col("q_start"), F.col("q_end"), F.col("qlen"),
            F.col("s_start"), F.col("s_end"), F.col("s_len"),
        ),
    )


def protein_totals(hits: DataFrame, db_weights: dict) -> DataFrame:
    """E3 + max-bit: per protein over ALL valid hits (pre-top-k):
    (protein_acc, tot_bit, tot_db, tot_ovl, max_bit).
    One map-side-combinable hash aggregation."""
    w = weight_map_expr(db_weights)
    return with_overlap(hits).groupBy("protein_acc").agg(
        F.sum("bit_score").alias("tot_bit"),
        F.sum(w[F.col("db")]).alias("tot_db"),
        F.sum("overlap").alias("tot_ovl"),
        F.max("bit_score").alias("max_bit"),
    )


def token_cumulative(hits: DataFrame, db_weights: dict) -> DataFrame:
    """E2: per (protein, token) over ALL valid hits: cumulative bit /
    db-weight / overlap sums.  Tokens are unique per hit already (a Set in
    the reference, array_distinct in our tokenizer)."""
    w = weight_map_expr(db_weights)
    exploded = with_overlap(hits).select(
        "protein_acc",
        F.explode("tokens").alias("token"),
        "bit_score",
        w[F.col("db")].alias("db_weight"),
        "overlap",
    )
    return exploded.groupBy("protein_acc", "token").agg(
        F.sum("bit_score").alias("cum_bit"),
        F.sum("db_weight").alias("cum_db"),
        F.sum("overlap").alias("cum_ovl"),
    )


def ranked_hits(hits: DataFrame) -> DataFrame:
    """K1 rank: per-(protein, db) row number by ascending e-value.  Java's
    Collections.sort is stable -> ties keep parse order, mirrored by the
    line_no tie-break.  Keeping the rank as a column (rather than filtering
    immediately) lets one pass feed BOTH the top-k candidate set and the
    all-hits cumulative sums (E2/E3 accumulate pre-top-k)."""
    wnd = Window.partitionBy("protein_acc", "db").orderBy(
        F.col("e_value").asc(), F.col("line_no").asc()
    )
    return hits.withColumn("__rk", F.row_number().over(wnd))


def top_k_hits(hits: DataFrame, k: int = 200) -> DataFrame:
    """K1: keep the k best hits per (protein, db) by ascending e-value."""
    return ranked_hits(hits).filter(F.col("__rk") <= k).drop("__rk")


def token_cumulative_ranked(
    ranked: DataFrame, db_weights: dict, k: int
) -> DataFrame:
    """E2 fused with top-k token membership: ONE explode + ONE
    (protein, token) aggregation produces both the cumulative sums over ALL
    hits and an `in_topk` flag (token appears in some top-k hit).

    Replaces the two-pass formulation (token_cumulative + a separate
    explode/distinct of top-k tokens + re-join) — saves two full shuffles of
    the exploded (protein, token) stream, the widest data in the job.
    """
    w = weight_map_expr(db_weights)
    exploded = with_overlap(ranked).select(
        "protein_acc",
        F.explode("tokens").alias("token"),
        "bit_score",
        w[F.col("db")].alias("db_weight"),
        "overlap",
        (F.col("__rk") <= k).alias("in_topk"),
    )
    return exploded.groupBy("protein_acc", "token").agg(
        F.sum("bit_score").alias("cum_bit"),
        F.sum("db_weight").alias("cum_db"),
        F.sum("overlap").alias("cum_ovl"),
        F.max("in_topk").alias("in_topk"),
    )


def token_scores(
    topk: DataFrame,
    cumulative: DataFrame,
    totals: DataFrame,
    bit_w: float,
    db_w: float,
    ovl_w: float,
) -> DataFrame:
    """E4/E5/E6: per (protein, token) for tokens of TOP-K hits only:
    (protein_acc, token, token_score, token_high_score, informative).

    token_score is the E6-FILTERED value (non-informative tokens reassigned
    ``score - high/2``), exactly what every downstream consumer
    (lexical score, output token sets, FPR token universe) sees.
    """
    tk_tokens = topk.select(
        "protein_acc", F.explode("tokens").alias("token")
    ).distinct()
    raw = (
        tk_tokens.join(cumulative, ["protein_acc", "token"])
        .join(totals, "protein_acc")
        .select(
            "protein_acc",
            "token",
            (
                F.lit(bit_w) * jdiv(F.col("cum_bit"), F.col("tot_bit"))
                + F.lit(db_w) * jdiv(F.col("cum_db"), F.col("tot_db"))
                + F.lit(ovl_w) * jdiv(F.col("cum_ovl"), F.col("tot_ovl"))
            ).alias("raw_score"),
        )
    )
    wnd = Window.partitionBy("protein_acc")
    raw = raw.withColumn("token_high_score", F.max("raw_score").over(wnd))
    half = F.col("token_high_score") / 2
    informative = F.col("raw_score") > half
    return raw.select(
        "protein_acc",
        "token",
        F.when(informative, F.col("raw_score"))
        .otherwise(F.col("raw_score") - half)
        .alias("token_score"),
        "token_high_score",
        informative.alias("informative"),
    )


def token_scores_from_cum(
    cum_flagged: DataFrame,
    totals: DataFrame,
    bit_w: float,
    db_w: float,
    ovl_w: float,
) -> DataFrame:
    """E4/E5/E6 from the fused `token_cumulative_ranked` output: same result
    as ``token_scores`` (asserted in tests) with no extra token shuffle —
    the top-k token set is just ``in_topk`` rows of the cumulative agg."""
    raw = (
        cum_flagged.filter(F.col("in_topk"))
        .join(totals, "protein_acc")
        .select(
            "protein_acc",
            "token",
            (
                F.lit(bit_w) * jdiv(F.col("cum_bit"), F.col("tot_bit"))
                + F.lit(db_w) * jdiv(F.col("cum_db"), F.col("tot_db"))
                + F.lit(ovl_w) * jdiv(F.col("cum_ovl"), F.col("tot_ovl"))
            ).alias("raw_score"),
        )
    )
    wnd = Window.partitionBy("protein_acc")
    raw = raw.withColumn("token_high_score", F.max("raw_score").over(wnd))
    half = F.col("token_high_score") / 2
    informative = F.col("raw_score") > half
    return raw.select(
        "protein_acc",
        "token",
        F.when(informative, F.col("raw_score"))
        .otherwise(F.col("raw_score") - half)
        .alias("token_score"),
        "token_high_score",
        informative.alias("informative"),
    )


def score_hits(
    topk: DataFrame,
    tok_scores: DataFrame,
    totals: DataFrame,
    dsbs_weights: dict,
) -> DataFrame:
    """E7/E8/E9: description score for every top-k hit.

    Returns topk columns + sum_token_scores, n_tokens, n_informative,
    token_high_score, lexical_score, rel_bit_score, desc_score.

    The per-hit token lookup is an explode + (protein,token)-keyed join back
    — co-partitioned with the E2 aggregation output, so AQE typically plans
    it shuffle-free on one side.
    """
    per_hit_tokens = topk.select(
        "protein_acc", "db", "hit_acc", F.explode("tokens").alias("token")
    )
    agg = (
        per_hit_tokens.join(tok_scores, ["protein_acc", "token"])
        .groupBy("protein_acc", "db", "hit_acc")
        .agg(
            F.sum("token_score").alias("sum_token_scores"),
            F.count("*").alias("n_tokens"),
            F.sum(F.col("informative").cast("long")).alias("n_informative"),
            F.first("token_high_score").alias("token_high_score"),
        )
    )
    dsbsw = weight_map_expr(dsbs_weights)
    scored = (
        topk.join(agg, ["protein_acc", "db", "hit_acc"])
        .join(totals.select("protein_acc", "max_bit"), "protein_acc")
    )
    # E7: (sum/high) / (n_tokens/n_informative); no informative tokens ->
    # correction factor Infinity -> lexical 0.0 (Java float semantics)
    lexical = F.when(F.col("n_informative") == 0, F.lit(0.0)).otherwise(
        jdiv(
            jdiv(F.col("sum_token_scores"), F.col("token_high_score")),
            jdiv(F.col("n_tokens").cast("double"), F.col("n_informative").cast("double")),
        )
    )
    rel_bit = dsbsw[F.col("db")] * jdiv(F.col("bit_score"), F.col("max_bit"))
    return (
        scored.withColumn("lexical_score", lexical)
        .withColumn("rel_bit_score", rel_bit)
        .withColumn("desc_score", F.col("lexical_score") + F.col("rel_bit_score"))
    )


def select_winners(
    scored: DataFrame,
    goa: DataFrame | None = None,
    prefer_go: bool = False,
) -> DataFrame:
    """E10: per protein pick the highest-scoring candidate (hits with >=1
    token — guaranteed by validity); adds `desc_high_score` (max score, used
    by the quality code).

    With ``prefer_go`` and a GOA table: if any candidate's short accession
    has GO annotations, restrict the argmax to those candidates
    (DescriptionScoreCalculator.java:89-99).  Divergence note: on *exact*
    score ties between a GO- and a non-GO candidate the reference's
    score-keyed HashMap may return either; we deterministically pick the GO
    candidate.

    Tie-break: on equal description scores the reference's score-keyed
    HashMap keeps the LAST-inserted candidate (within a database, later
    parse order; across databases, HashMap-keyset order — nondeterministic).
    We impose the deterministic total order (desc_score DESC, line_no DESC,
    db DESC, hit_acc DESC), which reproduces the reference's within-database
    behavior (golden: DescriptionScoreCalculatorTest.java:74-102 where
    accession_4 beats the equal-scoring accession_1).
    """
    df = scored
    if prefer_go and goa is not None:
        # no F.broadcast hint: has_go derives from the GOA *reference* table
        # but is still data-sized (one row per distinct annotated accession)
        # — at 100x a forced broadcast can exceed the driver limit and fail
        # the job.  Leave the strategy to AQE, mirroring the batch path
        # (scoring_batch.py select_winners_batch).
        has_go = goa.select("short_acc").distinct().withColumn("__has_go", F.lit(True))
        df = df.join(has_go, "short_acc", "left").withColumn(
            "__has_go", F.coalesce(F.col("__has_go"), F.lit(False))
        )
        any_go = Window.partitionBy("protein_acc")
        df = df.withColumn("__any_go", F.max(F.col("__has_go")).over(any_go))
        df = df.filter(~F.col("__any_go") | F.col("__has_go")).drop(
            "__has_go", "__any_go"
        )
    order = Window.partitionBy("protein_acc").orderBy(
        F.col("desc_score").desc(),
        F.col("line_no").desc(),
        F.col("db").desc(),
        F.col("hit_acc").desc(),
    )
    # the ordering is desc_score-first, so the rank-1 row's own score IS the
    # partition max — desc_high_score needs no second window pass
    return (
        df.withColumn("__rn", F.row_number().over(order))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn("desc_high_score", F.col("desc_score"))
    )
