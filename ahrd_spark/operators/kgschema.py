"""Schema-level KG construction operators: RDFS-style type entailment,
SHACL-style constraint validation, and bounded metapath mining.

No reference analog (AHRD emits flat annotations, not a typed graph); this
extends the engine's KG-materialization family (operators/graph.py) with the
schema passes a production triple store runs between extraction and load:

* ``infer_types``       — RDFS2/RDFS3 entailment (domain/range -> rdf:type)
  from a broadcastable predicate schema.
* ``validate_triples``  — violation REPORT (not just stats like
  ``predicate_functionality``): max-cardinality breaches, object lexical
  pattern breaches, dangling entity references.
* ``metapath_counts``   — (pred1, pred2) 2-hop path frequencies through a
  shared mid entity, with an explicit hub cap so one celebrity node cannot
  blow the self-join up quadratically.

Scale shape: the predicate schema / constraint tables are tiny (one row per
predicate) -> broadcast joins; everything else is distinct + hash aggregate
on (pred, subj[, obj]) keys, all map-side combinable.  The metapath self-join
is the only superlinear risk and is degree-capped BEFORE the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def infer_types(
    triples: DataFrame,
    pred_schema: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """RDFS domain/range entailment -> distinct ``(entity, type)`` rows.

    ``pred_schema``: (pred, domain_type, range_type) — one row per predicate,
    either type nullable.  Rule rdfs2: (s, p, o) & domain(p, T) => type(s, T);
    rule rdfs3: (s, p, o) & range(p, T) => type(o, T).

    Scale shape: the schema is one row per predicate -> broadcast hash join
    against the triple scan; the distinct is a hash aggregate on the
    (entity, type) output, far smaller than the input.  No shuffle of the
    triple table by anything but the final distinct.
    """
    t = triples.select(
        F.col(subj_col).alias("s"),
        F.col(pred_col).alias("p"),
        F.col(obj_col).alias("o"),
    )
    sch = F.broadcast(
        pred_schema.select(
            F.col("pred").alias("p"), "domain_type", "range_type"
        )
    )
    joined = t.join(sch, "p")
    subj_types = joined.where(F.col("domain_type").isNotNull()).select(
        F.col("s").alias("entity"), F.col("domain_type").alias("type")
    )
    obj_types = joined.where(F.col("range_type").isNotNull()).select(
        F.col("o").alias("entity"), F.col("range_type").alias("type")
    )
    return subj_types.unionByName(obj_types).distinct()


def validate_triples(
    triples: DataFrame,
    constraints: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """SHACL-style validation -> one row per violation:
    ``(kind, pred, subj, obj, n)``.

    ``constraints``: one row per predicate —
      (pred, max_card: int|null, obj_regex: string|null,
       obj_is_entity_ref: boolean)

    Three shapes, mirroring sh:maxCount / sh:pattern / sh:class:

    * ``kind='cardinality'`` — subject asserts more than ``max_card``
      DISTINCT objects for the predicate; ``obj`` is NULL, ``n`` = the
      offending distinct-object count.
    * ``kind='pattern'``     — object fails ``obj_regex`` (full match);
      one row per distinct offending triple, ``n`` = 1.
    * ``kind='dangling'``    — predicate is declared an entity reference
      but the object never occurs as a SUBJECT anywhere in the graph;
      one row per distinct offending triple, ``n`` = 1.

    Scale shape: constraints broadcast (rows == predicates); cardinality is
    a (pred, subj) hash aggregate; pattern is a scan-side filter; dangling
    is a left-anti join against the distinct subject set (hash-partitioned
    by entity id — the one genuine shuffle, keyed on the same column both
    sides).
    """
    t = triples.select(
        F.col(pred_col).alias("pred"),
        F.col(subj_col).alias("subj"),
        F.col(obj_col).alias("obj"),
    ).distinct()
    c = F.broadcast(
        constraints.select(
            "pred", "max_card", "obj_regex", "obj_is_entity_ref"
        )
    )
    tc = t.join(c, "pred")

    card = (
        tc.where(F.col("max_card").isNotNull())
        .groupBy("pred", "subj", "max_card")
        .agg(F.countDistinct("obj").alias("n"))
        .where(F.col("n") > F.col("max_card"))
        .select(
            F.lit("cardinality").alias("kind"),
            "pred",
            "subj",
            F.lit(None).cast("string").alias("obj"),
            "n",
        )
    )
    pattern = (
        tc.where(F.col("obj_regex").isNotNull())
        .where(
            ~F.regexp_like(
                F.col("obj"),
                F.concat(F.lit("^(?:"), F.col("obj_regex"), F.lit(")$")),
            )
        )
        .select(
            F.lit("pattern").alias("kind"),
            "pred",
            "subj",
            "obj",
            F.lit(1).cast("bigint").alias("n"),
        )
    )
    subjects = t.select(F.col("subj").alias("obj")).distinct()
    dangling = (
        tc.where(F.col("obj_is_entity_ref"))
        .join(subjects, "obj", "left_anti")
        .select(
            F.lit("dangling").alias("kind"),
            "pred",
            "subj",
            "obj",
            F.lit(1).cast("bigint").alias("n"),
        )
    )
    return card.unionByName(pattern).unionByName(dangling)


def metapath_counts(
    triples: DataFrame,
    hub_cap: int = 1000,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """2-hop metapath frequencies -> ``(pred1, pred2, n_paths, n_mids)``:
    for every ordered predicate pair, how many distinct
    (s, p1, m) + (m, p2, o) path instances run through a shared mid
    entity, and through how many distinct mids.  The workhorse of schema
    discovery (which relations compose?) and of metapath-based embeddings
    (metapath2vec's path vocabulary).

    ``hub_cap``: mids whose in-degree OR out-degree exceeds the cap are
    EXCLUDED before the join — one hub entity with a million in- and
    out-edges would otherwise contribute 10^12 path rows.  Capped mids are
    reported in the companion column ``n_mids`` only via their absence;
    callers needing hub metapaths should aggregate per-hub separately
    (degree-bounded output) rather than expanding paths.

    Scale shape: per-mid degrees are hash aggregates; the cap filter
    bounds every mid's contribution to ``hub_cap**2`` pairs; the path join
    is keyed on the mid entity — both sides hash-partitioned by it, then a
    (pred1, pred2) aggregate whose output is bounded by |preds|^2.
    """
    t = triples.select(
        F.col(subj_col).alias("s"),
        F.col(pred_col).alias("p"),
        F.col(obj_col).alias("o"),
    ).distinct()
    in_deg = t.groupBy(F.col("o").alias("mid")).agg(
        F.count(F.lit(1)).alias("d_in")
    )
    out_deg = t.groupBy(F.col("s").alias("mid")).agg(
        F.count(F.lit(1)).alias("d_out")
    )
    ok_mids = (
        in_deg.join(out_deg, "mid")
        .where((F.col("d_in") <= hub_cap) & (F.col("d_out") <= hub_cap))
        .select("mid")
    )
    left = t.select(
        F.col("p").alias("pred1"), F.col("o").alias("mid")
    ).join(ok_mids, "mid", "left_semi")
    right = t.select(
        F.col("s").alias("mid"), F.col("p").alias("pred2")
    ).join(ok_mids, "mid", "left_semi")
    return (
        left.join(right, "mid")
        .groupBy("pred1", "pred2")
        .agg(
            F.count(F.lit(1)).alias("n_paths"),
            F.countDistinct("mid").alias("n_mids"),
        )
    )
