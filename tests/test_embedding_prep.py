"""Staged embedding-prep pipeline (plans/embedding_prep.py): parity with
the direct operator composition, exact resume, and config invalidation."""

import os

from ahrd_spark.operators.graph import random_walks, skipgram_pairs
from ahrd_spark.operators.sampling import group_split
from ahrd_spark.plans.embedding_prep import (
    EmbeddingPrepConfig,
    run_embedding_prep,
)

TRIPLES = [
    ("A", "knows", "B"),
    ("B", "knows", "C"),
    ("C", "knows", "A"),
    ("C", "mentor_of", "D"),
    ("D", "mentor_of", "E"),
]
SCHEMA = "subj STRING, pred STRING, obj STRING"
CFG = EmbeddingPrepConfig(walk_len=4, walks_per_node=2, window=2, seed="t")


def _rows(df):
    return sorted(
        (r.center, r.context, r.n, r.split) for r in df.collect()
    )


def test_prep_matches_direct_composition(spark, tmp_path):
    triples = spark.createDataFrame(TRIPLES, SCHEMA)
    out = run_embedding_prep(
        spark, triples, str(tmp_path / "wd"), cfg=CFG
    )
    edges = triples.selectExpr("subj AS src", "obj AS dst").distinct()
    walks = random_walks(edges, walk_len=4, walks_per_node=2, seed="t")
    direct = group_split(
        skipgram_pairs(walks, window=2),
        dict(CFG.splits),
        group_col="center",
    )
    assert _rows(out) == _rows(direct)


def test_prep_resume_reuses_stages(spark, tmp_path):
    triples = spark.createDataFrame(TRIPLES, SCHEMA)
    wd = str(tmp_path / "wd")
    first = _rows(run_embedding_prep(spark, triples, wd, cfg=CFG))
    timings: dict = {}
    second = _rows(
        run_embedding_prep(
            spark,
            # resume must NOT recompute: feed an EMPTY frame — if any
            # stage rebuilt from it, the outputs would change
            spark.createDataFrame([], SCHEMA),
            wd,
            cfg=CFG,
            stage_timings=timings,
        )
    )
    assert second == first
    assert set(timings) == {"edges", "walks", "pairs", "split"}
    for stage in ("edges", "walks", "pairs", "split"):
        assert os.path.isdir(os.path.join(wd, stage))


def test_prep_config_change_invalidates(spark, tmp_path):
    triples = spark.createDataFrame(TRIPLES, SCHEMA)
    wd = str(tmp_path / "wd")
    base = _rows(run_embedding_prep(spark, triples, wd, cfg=CFG))
    wider = _rows(
        run_embedding_prep(
            spark,
            triples,
            wd,
            cfg=EmbeddingPrepConfig(
                walk_len=4, walks_per_node=2, window=3, seed="t"
            ),
        )
    )
    # window 3 adds distance-3 pairs the window-2 run cannot contain
    assert {(c, x) for (c, x, _n, _s) in wider} > {
        (c, x) for (c, x, _n, _s) in base
    }
