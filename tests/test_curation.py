"""Curation pipeline: drop-reason goldens + stage resume."""

from pyspark.sql import functions as F

from ahrd_spark.plans.curation import CurationConfig, run_curation


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over dog", "a"),
            (2, "the quick brown fox jumps over dog", "a"),  # exact dup of 1
            (3, "ja nein", "b"),                             # too short
            (4, "der hund ist nicht hier und das", "b"),     # de, lang gate
            (5, "the alpha beta gamma delta epsilon zeta", "c"),  # contaminated
        ],
        "doc_id bigint, text string, source string",
    )


CFG = CurationConfig(
    min_tokens=3,
    langs=("en",),
    decontam_k=3,
    decontam_min_matches=1,
)


def test_curation_drop_reasons_and_keep_set(spark, tmp_path):
    docs = _corpus(spark)
    bench = spark.createDataFrame(
        [(100, "beta gamma delta")], "doc_id bigint, text string"
    )
    out = run_curation(
        spark, docs, str(tmp_path / "wd"), cfg=CFG, benchmark=bench
    )
    assert [r["doc_id"] for r in out.select("doc_id").collect()] == [1]

    # the gate checkpoint is the audit trail: every doc, first-failing reason
    from ahrd_spark.plans.checkpoint import CheckpointManager

    gate = CheckpointManager(spark, str(tmp_path / "wd"), config_obj={}).read(
        "quality_gate"
    )
    reasons = {
        r["doc_id"]: r["drop_reason"] for r in gate.collect()
    }
    assert reasons == {
        1: None,
        2: "duplicate",      # exact keeper is min(doc_id) = 1
        3: "too_short",
        4: "lang",
        5: "contaminated",
    }


def test_curation_resume_reuses_stages(spark, tmp_path):
    docs = _corpus(spark)
    wd = str(tmp_path / "wd")
    timings1: dict = {}
    first = run_curation(
        spark, docs, wd, cfg=CFG, stage_timings=timings1
    ).collect()
    assert set(timings1) == {
        "fingerprint", "dedup_decide", "quality_gate", "materialize"
    }

    # second run resumes every completed stage from checkpoint (no
    # benchmark both times — has_benchmark is part of the config hash)
    from ahrd_spark.plans.checkpoint import CheckpointManager

    from ahrd_spark import __version__ as v

    ckpt = CheckpointManager(
        spark, wd,
        config_obj={
            "engine": v, "curation": CFG.__dict__, "has_benchmark": False,
        },
    )
    for stage in ("fingerprint", "dedup_decide", "quality_gate"):
        assert ckpt.is_complete(stage), stage
    second = run_curation(spark, docs, wd, cfg=CFG).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))

    # a changed threshold invalidates resume (config hash drift)
    third = run_curation(
        spark, docs, wd,
        cfg=CurationConfig(
            min_tokens=3, langs=("en", "de"),
            decontam_k=3, decontam_min_matches=1,
        ),
    )
    assert sorted(
        r["doc_id"] for r in third.select("doc_id").collect()
    ) == [1, 4, 5]  # de now allowed; no benchmark -> doc 5 not contaminated
