"""Physical-plan regression tests — pin the measured plan-shape wins so a
future refactor can't silently reintroduce them as perf bugs.

Each assertion encodes a decision with a measured cost behind it (numbers
in BASELINE.md):
- mention-detect parse-once fusion (2.3x): the old composed plan let
  predicate pushdown substitute the parse into ~15 filter conjuncts;
- shuffle-free MinHash shingling (5x): the old plan shuffled+sorted the
  full exploded token stream through a lead() window;
- no row-at-a-time Python UDFs anywhere in the driver queries (the
  engine's standing rule: JVM codegen or Arrow-vectorized only).
"""

import pytest

from ahrd_spark.config import AhrdConfig, BlastDbConfig


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def cfg3():
    return AhrdConfig(
        blast_dbs=tuple(
            BlastDbConfig(
                name=f"db{i}", weight=[100, 50, 10][i],
                description_score_bit_score_weight=[0.2, 0.4, 0.4][i],
            )
            for i in range(3)
        )
    )


def test_detect_mentions_parse_once_plan(spark, cfg3):
    from ahrd_spark.plans.docs import synthesize_docs
    from ahrd_spark.plans.pipeline import detect_mentions

    docs = synthesize_docs(spark, 100)
    plan = _plan(detect_mentions(docs, cfg3))
    # the 9-field tab split is evaluated exactly ONCE per span — the old
    # composed formulation re-evaluated it once per pushed filter conjunct
    assert plan.count("\t, 9") == 1, plan[:2000]
    # tokens is output-only: exactly one further split (the tokenize over
    # the filtered description), in the post-filter Project
    assert plan.count("split(") == 2, plan[:2000]
    # one Generate (the explode IS the pushdown barrier); no leftover
    # rand()-style optimizer-fragile barriers
    assert plan.count("Generate") == 1
    assert "rand(" not in plan
    # narrow plan: the stage has no shuffle of its own
    assert "Exchange" not in plan

    # the production slim-checkpoint path drops tokens -> Catalyst must
    # prune the ENTIRE tokenize out of the stage (the gate's ">=1 token"
    # predicate is the rlike of the negated splitter class, not a split)
    slim = _plan(detect_mentions(docs, cfg3).drop("tokens", "media_ref"))
    assert slim.count("split(") == 1, slim[:2000]
    assert "sort_array" not in slim and "array_distinct" not in slim


def test_minhash_shuffle_free_shingles(spark):
    from pyspark.sql import functions as F

    from ahrd_spark.operators.dedup import minhash_signature

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("a b c d e f g").alias("text")
    )
    plan = _plan(minhash_signature(df))
    # no per-doc window (the old formulation shuffled + sorted the full
    # exploded token stream); the ONLY exchange is the post-partial-agg
    # one-row-per-doc shuffle
    assert "Window" not in plan
    assert plan.count("Sort") == 0
    # at most the post-partial-agg one-row-per-doc exchange (zero when the
    # planner can prove doc co-partitioning, as on a range input)
    assert plan.count("Exchange") <= 1, plan[:2000]
    assert "HashAggregate" in plan  # map-side partial agg engaged


def test_no_rowwise_python_udfs_in_driver_queries(spark):
    """BatchEvalPython = row-at-a-time Python UDF — banned from every
    driver query plan.  ArrowEvalPython/MapInPandas (vectorized) are the
    allowed Python surfaces.  Plans are built (not executed) against
    sf0.001; queries that EXECUTE work inside the query function
    (checkpointed pipeline, streaming sinks) are exercised by their own
    oracles and skipped here."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    skip = {
        "pipeline_triples", "pipeline_triples_goprefer",
        "pipeline_triples_stream", "pipeline_triples_arrowshred",
        "curation_pipeline", "curation_pipeline_full",
        "events_stateful_sessions", "stream_dedup", "stream_interleaved",
        "hits_hub_auth", "media_cc",
    }
    sf = "/root/testdata/sf0.001"
    offenders = []
    for name, fn in entrymod.queries().items():
        if name in skip:
            continue
        plan = _plan(fn(spark, sf))
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert not offenders, f"row-wise Python UDFs in: {offenders}"

def test_no_broadcast_of_stream_derived_frames():
    """Source-level invariant (round-1 and round-2 both caught one): an
    explicit F.broadcast on a frame derived from the hits/docs stream can
    exceed broadcast limits and kill the job at 100x scale — size-based
    decisions on stream-derived sides belong to AQE.  Explicit broadcasts
    are allowed only in dictionary/dimension modules (ontology closures,
    InterPro metadata, ANN query/centroid sides, canonical maps)."""
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / "ahrd_spark"
    # scorer + skew modules consume the hits stream: any F.broadcast here
    # is stream-derived by construction
    stream_modules = [
        pkg / "operators" / "scoring.py",
        pkg / "operators" / "scoring_batch.py",
        pkg / "operators" / "scoring_pandas.py",
        pkg / "operators" / "skew.py",
        pkg / "operators" / "dedup.py",
        pkg / "plans" / "docs.py",
        # GOA is a *reference* table but data-sized (10^7..10^9 accessions)
        pkg / "sources" / "goa.py",
    ]
    offenders = [
        str(m) for m in stream_modules
        if m.exists() and "broadcast(" in m.read_text()
    ]
    assert not offenders, f"stream-side F.broadcast in: {offenders}"


def test_kmeans_assignment_shuffle_free_corpus_side(spark):
    """k-means assignment must stay a broadcast-fold projection: the only
    exchanges belong to the kilobyte centroid subtree (its single-partition
    collect_list agg + the broadcast), never the corpus side — a corpus
    shuffle per Lloyd round is the classic k-means scale killer."""
    from pyspark.sql import functions as F

    from ahrd_spark.operators.clustering import _assign

    c = spark.range(200).select(
        F.col("id").alias("vid"),
        F.array(*[(F.col("id") * (i + 1)).cast("double") for i in range(4)])
        .alias("v"),
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "cluster_id INT, cv ARRAY<DOUBLE>",
    )
    plan = _plan(_assign(c, cents))
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan
    # centroid subtree: one single-partition agg exchange + one broadcast
    # exchange; corpus side contributes none
    assert plan.count("Exchange") <= 2, plan[:2000]


def test_duplicate_spans_hashes_gram_shuffle(spark):
    """The duplicate-span gram shuffles must move the 8-byte xxhash64 key,
    never the concatenated gram text (k-fold shuffle-byte cut, BASELINE.md),
    and the whole operator stays JVM-side with exactly one per-doc window."""
    from pyspark.sql import functions as F

    from ahrd_spark.operators.dedup import duplicate_spans

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta eta theta iota").alias("text"),
    )
    plan = _plan(duplicate_spans(df, k=4))
    assert "xxhash64" in plan, plan[:2000]
    assert "concat_ws" not in plan, plan[:2000]
    assert "BatchEvalPython" not in plan
    # two chained Window nodes (running-max prev_end, then running-sum of
    # span starts) ride ONE doc-keyed exchange -- the count that matters
    # for scale is the exchange budget below
    assert plan.count("Window") == 2, plan[:2000]
    # doc-frequency distinct+agg, hot-gram join, interval-merge window,
    # span groupBy -- bounded exchange budget, no cartesian anywhere
    assert plan.count("Exchange") <= 6, plan[:2000]
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_star_revenue_broadcasts_dimension_chain(spark):
    """olap_star_revenue's four joins must all be broadcast hash joins
    with column-pruned scans — a SortMergeJoin against a dimension, or a
    fact scan reading more than its 3 projected columns, is a plan
    regression."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["olap_star_revenue"](
        spark, "/root/testdata/sf0.001"
    )
    df.collect()  # let AQE finalize the join strategies
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    import re
    fact = re.search(r"ReadSchema: struct<(l_[^>]*)>", plan).group(1)
    assert set(c.split(":")[0] for c in fact.split(",")) == {
        "l_orderkey", "l_extendedprice", "l_discount"
    }
