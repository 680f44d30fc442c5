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
            "classifier_fp": None,
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


def _gate_reasons(spark, wd):
    from ahrd_spark.plans.checkpoint import CheckpointManager

    gate = CheckpointManager(spark, wd, config_obj={}).read("quality_gate")
    return {r["doc_id"]: r["drop_reason"] for r in gate.collect()}


def test_curation_normalize_stage_dedups_nfc_variants(spark, tmp_path):
    # docs 1 and 2 differ only in NFC form and whitespace mess; with the
    # normalize stage on they MUST exact-dedup (canonical bytes first)
    docs = spark.createDataFrame(
        [
            (1, "café time for the brown fox", "a"),
            (2, "café  time for  the brown fox", "a"),
            (3, "another english sentence about dogs", "b"),
        ],
        "doc_id bigint, text string, source string",
    )
    cfg = CurationConfig(min_tokens=3, normalize=True)
    wd = str(tmp_path / "wd")
    timings: dict = {}
    out = run_curation(spark, docs, wd, cfg=cfg, stage_timings=timings)
    assert "normalize" in timings
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == [1, 3]
    assert _gate_reasons(spark, wd)[2] == "duplicate"
    # curated text is the normalized form
    texts = {r["doc_id"]: r["text"] for r in out.select("doc_id", "text").collect()}
    assert texts[1] == "café time for the brown fox"


def test_curation_c4_filter_rejects_boilerplate_docs(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "A proper english sentence about the dog.", "a"),
            (2, "function f() { return 1; }", "a"),  # C4 doc reject
        ],
        "doc_id bigint, text string, source string",
    )
    cfg = CurationConfig(min_tokens=3, c4_filter=True)
    wd = str(tmp_path / "wd")
    out = run_curation(spark, docs, wd, cfg=cfg)
    assert [r["doc_id"] for r in out.select("doc_id").collect()] == [1]
    assert _gate_reasons(spark, wd)[2] == "boilerplate"
    # the source passthrough column survived the normalize stage
    assert out.select("source").collect()[0]["source"] == "a"


def test_curation_classifier_gate(spark, tmp_path):
    import hashlib

    def bucket(tok, n=64):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % n

    docs = spark.createDataFrame(
        [
            (1, "good good english sentence for the gate", "a"),
            (2, "bad bad bad junk junk junk spam spam", "a"),
        ],
        "doc_id bigint, text string, source string",
    )
    weights = spark.createDataFrame(
        [(bucket("good"), 2.0), (bucket("bad"), -2.0), (bucket("junk"), -2.0)],
        "bucket bigint, weight double",
    )
    cfg = CurationConfig(min_tokens=3, classifier_threshold=0.5)
    wd = str(tmp_path / "wd")
    out = run_curation(
        spark, docs, wd, cfg=cfg, classifier_weights=weights
    )
    assert [r["doc_id"] for r in out.select("doc_id").collect()] == [1]
    assert _gate_reasons(spark, wd)[2] == "classifier"

    # retrained weights on the SAME workdir must invalidate the
    # fingerprint checkpoint (weight content is in the config hash) —
    # doc 1 flips from kept to classifier-dropped
    flipped = spark.createDataFrame(
        [(bucket("good"), -2.0)], "bucket bigint, weight double"
    )
    # doc 1 flips to classifier-dropped; doc 2 (no weighted tokens left)
    # sits exactly at sigmoid(0) = 0.5 and passes the >= gate
    rerun = run_curation(
        spark, docs, wd, cfg=cfg, classifier_weights=flipped
    )
    assert [r["doc_id"] for r in rerun.select("doc_id").collect()] == [2]
    assert _gate_reasons(spark, wd)[1] == "classifier"

    # threshold without weights (or vice versa) is a loud config error
    import pytest

    with pytest.raises(ValueError):
        run_curation(spark, docs, str(tmp_path / "wd2"), cfg=cfg)
    with pytest.raises(ValueError):
        run_curation(
            spark, docs, str(tmp_path / "wd3"),
            cfg=CurationConfig(min_tokens=3), classifier_weights=weights,
        )
