"""Ontology-aware semantic similarity over the GO DAG: per-term
information content (IC) from an annotation corpus and Resnik-style
protein-pair similarity (best-match-average over max-IC common ancestors).

The reference engine declares a GO database handle but never populates it
(AHRD.java:40) and evaluates annotations purely lexically
(EvaluationScoreCalculator.java); published AHRD follow-ups moved to
IC-weighted GO F-scores, which is the standard way a KG consumer judges
how *specific* a transferred term is.  This module makes that a
first-class distributed operator pair:

``term_information_content``
    true-path-expanded annotation frequencies ->
    ``ic(t) = -ln(n_prot(t) / N)`` where ``n_prot(t)`` counts distinct
    proteins annotated to ``t`` or any descendant and ``N`` is the
    distinct annotated-protein corpus size.  The ontology closure is
    dictionary-sized (GO is ~5e4 terms); the only corpus-sized shuffle is
    the distinct-protein count, keyed by term.

``resnik_similarity``
    candidate (p1, p2) pairs -> one similarity row per pair.
    Term-level Resnik ``sim(t1, t2) = max{ ic(a) : a ancestor-or-self of
    both }``; protein-level best-match-average
    ``bma = (avg_t1 max_t2 sim + avg_t2 max_t1 sim) / 2``.
    The closure x IC table is broadcast (model-sized); every other join
    and aggregate is keyed by the pair id, so the work scales with
    ``|pairs| * |annot/protein|^2`` and never all-pairs.  Candidate pairs
    come from upstream blocking (LSH buckets, CC clusters, k-hop
    neighborhoods) exactly like the near-dup verifiers in ``dedup.py``.

No UDFs; every step is relational and replayed verbatim by the DuckDB
oracles (``go_term_ic``, ``resnik_sim``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ahrd_spark.operators.go_transfer import go_dag_closure


def _anc_or_self(dag_edges: DataFrame, terms: DataFrame) -> DataFrame:
    """(go_term, ancestor) reflexive-transitive closure restricted to the
    term universe = DAG nodes plus every annotated term."""
    closure = go_dag_closure(dag_edges)
    nodes = (
        dag_edges.toDF("a", "b")
        .select(F.col("a").alias("go_term"))
        .unionByName(dag_edges.toDF("a", "b").select(F.col("b").alias("go_term")))
        .unionByName(terms)
        .distinct()
    )
    return closure.unionByName(
        nodes.select("go_term", F.col("go_term").alias("ancestor"))
    )


def term_information_content(
    annotations: DataFrame, dag_edges: DataFrame
) -> DataFrame:
    """(protein_acc, go_term) x (child, parent) -> (go_term, n_prot, ic).

    Emits every term with at least one direct-or-descendant annotation.
    ``ic`` uses the natural log; the root (or any term covering the whole
    corpus) gets exactly 0.0.
    """
    anc = _anc_or_self(dag_edges, annotations.select("go_term").distinct())
    # true-path expansion then distinct-protein count per ancestor term;
    # closure is dictionary-sized -> broadcast, shuffle key is the term
    expanded = (
        annotations.select("protein_acc", "go_term")
        .join(F.broadcast(anc), "go_term")
        .select("protein_acc", F.col("ancestor").alias("go_term"))
        .distinct()
    )
    counts = expanded.groupBy("go_term").agg(
        F.countDistinct("protein_acc").alias("n_prot")
    )
    # corpus size as a lazy 1-row aggregate (broadcast scalar, no action)
    n_count = annotations.agg(
        F.countDistinct("protein_acc").cast("double").alias("n_total")
    )
    # ln(N/n) rather than -ln(n/N): same value, but the root case yields
    # +0.0 (not -0.0), which keeps value-hash replays sign-stable
    return counts.crossJoin(F.broadcast(n_count)).select(
        "go_term",
        "n_prot",
        F.log(F.col("n_total") / F.col("n_prot")).alias("ic"),
    )


def resnik_similarity(
    annotations: DataFrame,
    dag_edges: DataFrame,
    pairs: DataFrame,
) -> DataFrame:
    """(p1, p2) candidate pairs -> (p1, p2, sim) best-match-average Resnik.

    Pairs whose either side has no annotations are dropped (no similarity
    evidence); term pairs with no common ancestor contribute 0.0.
    """
    ic = term_information_content(annotations, dag_edges)
    anc = _anc_or_self(dag_edges, annotations.select("go_term").distinct())
    # model-sized: every (term, ancestor, ancestor_ic) triple
    anc_ic = anc.join(
        ic.select(F.col("go_term").alias("ancestor"), "ic"), "ancestor"
    )

    a1 = pairs.join(
        annotations.select(
            F.col("protein_acc").alias("p1"), F.col("go_term").alias("t1")
        ).distinct(),
        "p1",
    )
    tp = a1.join(
        annotations.select(
            F.col("protein_acc").alias("p2"), F.col("go_term").alias("t2")
        ).distinct(),
        "p2",
    ).select("p1", "p2", "t1", "t2")

    # max-IC common ancestor per DISTINCT term pair (shared across all
    # protein pairs — MICA is a term-level quantity); both closure sides
    # are broadcast model frames, the intersection is the ["t2", anc]
    # equi-join.  Left join back keeps no-common-ancestor term pairs at 0
    # so BMA averages over ALL term slots.
    tpairs = tp.select("t1", "t2").distinct()
    mica = (
        tpairs.join(
            F.broadcast(
                anc_ic.select(F.col("go_term").alias("t1"), "ancestor", "ic")
            ),
            "t1",
        )
        .join(
            F.broadcast(anc.select(F.col("go_term").alias("t2"), "ancestor")),
            ["t2", "ancestor"],
        )
        .groupBy("t1", "t2")
        .agg(F.max("ic").alias("sim_t"))
    )
    termsim = tp.join(mica, ["t1", "t2"], "left").select(
        "p1", "p2", "t1", "t2", F.coalesce("sim_t", F.lit(0.0)).alias("sim_t")
    )

    s12 = (
        termsim.groupBy("p1", "p2", "t1")
        .agg(F.max("sim_t").alias("best"))
        .groupBy("p1", "p2")
        .agg(F.avg("best").alias("s12"))
    )
    s21 = (
        termsim.groupBy("p1", "p2", "t2")
        .agg(F.max("sim_t").alias("best"))
        .groupBy("p1", "p2")
        .agg(F.avg("best").alias("s21"))
    )
    return s12.join(s21, ["p1", "p2"]).select(
        "p1", "p2", ((F.col("s12") + F.col("s21")) / 2.0).alias("sim")
    )
