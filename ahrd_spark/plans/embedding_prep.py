"""Staged KG-embedding corpus preparation: materialized triples ->
deterministic random walks -> skip-gram (center, context) pairs ->
leakage-safe entity split.

This is the third staged pipeline next to docs->triples
(plans/pipeline.py) and corpus curation (plans/curation.py), run with
the SAME ``CheckpointManager``: a 10^12-edge walk generation is
resumable stage-by-stage with per-partition lineage, and a config-knob
change (walk length, window, seed) invalidates exactly the stages it
affects.

Stages (each checkpointed, resumable exactly):

1. ``edges``   distinct (src, dst) projection of the triple table —
               the one corpus-sized dedup; everything downstream reads
               the checkpoint, never the raw triples again.
2. ``walks``   ``graph.random_walks``: hash-seeded deterministic walks
               (a pure function of (graph, seed) — rebuildable
               bit-identically, unlike RNG samplers), constant-depth
               frontier joins.
3. ``pairs``   ``graph.skipgram_pairs``: in-row window pair extraction
               + one (center, context) count aggregate.
4. ``split``   ``sampling.group_split`` keyed on the CENTER entity, so
               every training pair of an entity lands in one split —
               entity leakage across train/test is the embedding
               analog of the near-dup contamination bug.

Scale notes: stage keys are (src), (start, walk_ix), and
(center, context) — all uniform hash keys; nothing broadcasts a
graph-derived frame; the walk stage inherits ``random_walks``'s
``max_degree`` hub cap.  Reference: AHRD has no embedding pipeline
(it emits flat annotations); this serves the KG-construction tier's
downstream-training story.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ahrd_spark.operators.graph import random_walks, skipgram_pairs
from ahrd_spark.operators.sampling import group_split
from ahrd_spark.plans.checkpoint import CheckpointManager


@dataclass(frozen=True)
class EmbeddingPrepConfig:
    """Walk/window/split knobs; part of the checkpoint config hash, so
    changing any knob invalidates downstream stages on resume."""

    walk_len: int = 8
    walks_per_node: int = 4
    window: int = 2
    seed: str = "kg2vec"
    max_degree: int | None = None
    splits: dict[str, float] = field(
        default_factory=lambda: {"train": 0.98, "val": 0.01, "test": 0.01}
    )
    split_salt: str = ""


def run_embedding_prep(
    spark: SparkSession,
    triples: DataFrame,
    workdir: str,
    cfg: EmbeddingPrepConfig = EmbeddingPrepConfig(),
    subj_col: str = "subj",
    obj_col: str = "obj",
    num_partitions: int | None = None,
    stage_timings: dict | None = None,
) -> DataFrame:
    """Execute (or resume) the staged embedding-prep pipeline; returns
    ``(center, context, n, split)`` — the skip-gram training pairs with
    their leakage-safe split assignment.

    ``triples`` needs (subj, obj) columns (predicates are ignored: walks
    run over the untyped entity graph; filter the triple table first to
    walk a predicate slice).  Pass ``stage_timings={}`` to collect
    per-stage wall seconds.
    """
    import time as _time

    def _timed(name, fn):
        t0 = _time.time()
        out = fn()
        if stage_timings is not None:
            stage_timings[name] = round(_time.time() - t0, 3)
        return out

    from ahrd_spark import __version__ as _engine_version

    ckpt = CheckpointManager(
        spark,
        workdir,
        config_obj={
            "engine": _engine_version,
            "embedding_prep": {
                **{
                    k: v
                    for k, v in cfg.__dict__.items()
                    if k != "splits"
                },
                "splits": sorted(cfg.splits.items()),
            },
        },
    )

    def build_edges():
        return triples.select(
            F.col(subj_col).cast("string").alias("src"),
            F.col(obj_col).cast("string").alias("dst"),
        ).distinct()

    edges = _timed("edges", lambda: ckpt.run_stage(
        "edges", build_edges, key="src", num_partitions=num_partitions,
    ))

    def build_walks():
        return random_walks(
            edges,
            walk_len=cfg.walk_len,
            walks_per_node=cfg.walks_per_node,
            seed=cfg.seed,
            max_degree=cfg.max_degree,
        )

    walks = _timed("walks", lambda: ckpt.run_stage(
        "walks", build_walks, key=["start", "walk_ix"],
        inputs=["edges"], num_partitions=num_partitions,
    ))

    def build_pairs():
        return skipgram_pairs(walks, window=cfg.window)

    pairs = _timed("pairs", lambda: ckpt.run_stage(
        "pairs", build_pairs, key=["center", "context"],
        inputs=["walks"], num_partitions=num_partitions,
    ))

    def build_split():
        return group_split(
            pairs, dict(cfg.splits), group_col="center",
            salt=cfg.split_salt,
        )

    return _timed("split", lambda: ckpt.run_stage(
        "split", build_split, key=["center", "context"],
        inputs=["pairs"], num_partitions=num_partitions,
    ))
