"""Multi-source truth discovery (data fusion) for KG construction.

When several extractors / source documents assert CONFLICTING objects for
the same ``(subj, pred)`` data item, the materialized graph needs one
resolved value per item plus a confidence.  ``truth_discovery`` runs the
classic fixed-point family (Sums / TruthFinder-style: Pasternack & Roth,
COLING 2010; Yin et al., KDD 2007) in its simplest deterministic form:

    trust(source)    starts at 1.0
    repeat n_iter times:
        vote(item, value) = sum of trust over sources asserting it
        conf(item, value) = vote / sum of votes within the item
        trust(source)     = mean conf of the values the source asserts

so reliable sources (those that agree with the emerging consensus) gain
weight and drag their other claims up — one iteration is plain majority
voting, further iterations are trust-weighted voting.

No reference analog: AHRD picks one description per protein by lexical
score (operators/scoring.py), it never reconciles contradictory
assertions across sources; this fills that gap for the KG-materialize
stage.

Scale shape: every step is a hash aggregate or an equi-join on the item
key ``(subj, pred[, obj])`` — map-side combinable, co-partitioned across
rounds — plus one aggregate keyed by source.  The trust table has one row
per SOURCE (thousands, not billions): AQE will broadcast it into the
claim scan each round.  ``n_iter`` is a small constant (2-3 in practice;
convergence is geometric), so the lineage stays constant-depth — no
checkpointing needed.

Determinism: the winning value per item is chosen by
``round(conf, 6) DESC, obj ASC`` — the rounding makes the comparison
stable across summation orders, the lexical tie-break makes exact vote
ties deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def claim_confidence(
    claims: DataFrame,
    n_iter: int = 2,
    source_col: str = "source",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Per-claim confidences after ``n_iter`` trust rounds ->
    ``(subj, pred, obj, conf)`` with raw (unrounded) ``conf`` in [0, 1]
    summing to 1 within each ``(subj, pred)`` item.  Duplicate claims
    (same source asserting the same triple twice) count once.
    """
    c = claims.select(
        F.col(source_col).alias("source"),
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    ).distinct()

    trust = c.select("source").distinct().withColumn(
        "trust", F.lit(1.0)
    )
    conf = None
    for _ in range(max(1, n_iter)):
        votes = (
            c.join(trust, "source")
            .groupBy("subj", "pred", "obj")
            .agg(F.sum("trust").alias("vote"))
        )
        tot = votes.groupBy("subj", "pred").agg(
            F.sum("vote").alias("tot")
        )
        conf = votes.join(tot, ["subj", "pred"]).select(
            "subj",
            "pred",
            "obj",
            (F.col("vote") / F.col("tot")).alias("conf"),
        )
        trust = (
            c.join(conf, ["subj", "pred", "obj"])
            .groupBy("source")
            .agg(F.avg("conf").alias("trust"))
        )
    return conf


def truth_discovery(
    claims: DataFrame,
    n_iter: int = 2,
    source_col: str = "source",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Resolve each ``(subj, pred)`` item to its most-confident value ->
    one row ``(subj, pred, obj, conf_r)`` per item, ``conf_r`` rounded to
    6dp.  See module docstring for the iteration; the winner is the
    max-confidence value with ``round(conf, 6) DESC, obj ASC`` ordering.
    """
    conf = claim_confidence(
        claims,
        n_iter=n_iter,
        source_col=source_col,
        subj_col=subj_col,
        pred_col=pred_col,
        obj_col=obj_col,
    )
    w = Window.partitionBy("subj", "pred").orderBy(
        F.round(F.col("conf"), 6).desc(), F.col("obj").asc()
    )
    return (
        conf.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "subj", "pred", "obj", F.round("conf", 6).alias("conf_r")
        )
    )


def predicate_alignment(
    kg_a: DataFrame,
    kg_b: DataFrame,
    min_shared: int = 1,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Cross-source predicate (schema) alignment by extension overlap ->
    ``(pred_a, pred_b, n_shared, n_a, n_b, jaccard_r)``: predicate pairs
    whose distinct ``(subj, obj)`` extensions share at least
    ``min_shared`` pairs, with the Jaccard of the two extensions —
    the instance-based ontology-matching baseline (PARIS / instance
    matching family): two sources calling the same relation
    ``encodes`` vs ``codes_for`` surface as a high-Jaccard pair, the
    input an owl:equivalentProperty reviewer needs.

    Both KGs must already be on a shared entity namespace (run after
    ``canonicalize_triples`` / sameAs resolution — alignment without
    entity grounding is meaningless).

    Scale shape: each side collapses to distinct (pred, subj, obj) with
    map-side partial dedup; the candidate join is keyed on the SHARED
    ``(subj, obj)`` pair — disjoint predicates never meet, and the
    per-pair fan-out is bounded by the predicate vocabularies (schema-
    sized, not corpus-sized).  Per-predicate extension sizes are hash
    aggregates; the final stats join them broadcast (one row per
    predicate).
    """
    def prep(kg, side):
        return kg.select(
            F.col(pred_col).alias(f"pred_{side}"),
            F.col(subj_col).alias("s"),
            F.col(obj_col).alias("o"),
        ).distinct()

    a = prep(kg_a, "a")
    b = prep(kg_b, "b")
    pred_n_a = a.groupBy("pred_a").agg(F.count(F.lit(1)).alias("n_a"))
    pred_n_b = b.groupBy("pred_b").agg(F.count(F.lit(1)).alias("n_b"))
    shared = (
        a.join(b, ["s", "o"])
        .groupBy("pred_a", "pred_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return (
        shared.join(F.broadcast(pred_n_a), "pred_a")
        .join(F.broadcast(pred_n_b), "pred_b")
        .select(
            "pred_a",
            "pred_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ).alias("jaccard_r"),
        )
    )
