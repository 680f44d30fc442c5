"""The staged training-data curation pipeline: raw corpus -> curated corpus.

The docs->triples pipeline (plans/pipeline.py) is the KG half of the
engine; this is the data-curation half, run with the SAME checkpoint
manager, so a 100 TB curation run is resumable stage-by-stage with
per-partition lineage, exactly like the triples run.

Stages (each checkpointed, resumable exactly):

0. ``normalize``     (optional) canonical bytes before anything hashes
                     them: C4-style line-level boilerplate filtering
                     (``c4_filter``) and/or control-strip + whitespace
                     collapse + Unicode NFC (``normalize``).  Runs FIRST
                     so exact/near-dup keys see normalized text — two
                     docs differing only in combining-character form or
                     boilerplate lines dedup together.
1. ``fingerprint``   one pass over the corpus computing every per-doc
                     signal the later stages need: content hash (exact
                     dedup key), MinHash signature (near-dup key), token
                     count, composite quality score, language guess.
                     All codegen'd builtins; the stage's only exchange is
                     the signature agg's one-row-per-doc shuffle.
2. ``dedup_decide``  keeper decisions: exact (min doc id per content
                     hash) AND near-dup (LSH banded candidate pairs ->
                     connected-components cluster collapse -> min-id
                     canonical).  A doc survives iff it is its own exact
                     keeper and its own cluster canonical.
3. ``quality_gate``  threshold gate over the dedup survivors: token
                     bounds, minimum quality, optional hashed-linear
                     classifier probability (``classifier_threshold`` +
                     a caller-trained weight table), language allowlist,
                     and benchmark decontamination (k-gram overlap vs a
                     held-out benchmark table).  Emits EVERY doc with a
                     keep flag and the first failing reason — the audit
                     trail a curation run needs.  C4-rejected docs read
                     ``boilerplate`` (highest precedence: the reject
                     emptied their text, every later signal is vacuous).
4. ``materialize``   the curated corpus: original rows of the kept docs
                     joined back by doc_id, carrying the fingerprint
                     signals.

All float gates compare the ROUND-6 value (quality_r), matching the
driver oracle digit-for-digit: comparing raw doubles at a threshold can
flip on the last ulp between engines.

Scale notes: every stage keys its checkpoint by doc_id (uniform hash);
the only non-doc-keyed shuffles are the exact-dedup content-hash agg
(uniform by construction), the LSH bucket agg (AQE skew-join territory,
see lsh_candidate_pairs), and the decontamination gram join (two-phase
distinct agg).  Nothing broadcasts a corpus-derived frame.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ahrd_spark.operators.dedup import (
    dedup_canonical,
    lsh_candidate_pairs,
    minhash_signature,
)
from ahrd_spark.operators.decontam import contamination_flags
from ahrd_spark.operators.textstats import (
    lang_id_expr,
    quality_score_expr,
    ws_token_count_expr,
)
from ahrd_spark.plans.checkpoint import CheckpointManager


@dataclass(frozen=True)
class CurationConfig:
    """Gate thresholds + dedup parameters.  Part of the checkpoint config
    hash: changing any knob invalidates downstream stages on resume."""

    min_tokens: int = 5
    max_tokens: int = 1_000_000
    min_quality_r: float = 0.0  # compared against round(quality, 6)
    langs: tuple = ()  # allowlist of lang_guess codes; empty = allow all
    num_hashes: int = 4
    shingle_k: int = 3
    bands: int = 2
    rows_per_band: int = 2
    decontam_k: int = 4
    decontam_min_matches: int = 2
    # optional stage-0 normalization (see module docstring)
    normalize: bool = False  # control strip + ws collapse + Unicode NFC
    c4_filter: bool = False  # C4-style line-level boilerplate filter
    # optional hashed-linear classifier gate: set the threshold AND pass
    # classifier_weights to run_curation; compared against round(prob, 6)
    classifier_threshold: float | None = None
    classifier_bias: float = 0.0
    classifier_buckets: int = 64


def run_curation(
    spark: SparkSession,
    docs: DataFrame,
    workdir: str,
    cfg: CurationConfig = CurationConfig(),
    benchmark: DataFrame | None = None,
    classifier_weights: DataFrame | None = None,
    num_partitions: int | None = None,
    stage_timings: dict | None = None,
) -> DataFrame:
    """Execute (or resume) the staged curation pipeline; returns the
    curated corpus (the kept rows of ``docs`` + fingerprint signals).

    ``docs`` must carry (doc_id, text); extra columns pass through to the
    curated output.  ``benchmark`` (optional) is the decontamination
    reference set — any table with a text column; omit to skip that gate.
    ``classifier_weights`` (bucket, weight) enables the hashed-linear
    classifier gate; ``cfg.classifier_threshold`` must be set with it.
    Pass ``stage_timings={}`` to collect per-stage wall seconds.
    """
    import time as _time

    if (classifier_weights is None) != (cfg.classifier_threshold is None):
        raise ValueError(
            "classifier gate needs BOTH cfg.classifier_threshold and "
            "classifier_weights (got exactly one)"
        )

    def _timed(name, fn):
        t0 = _time.time()
        out = fn()
        if stage_timings is not None:
            stage_timings[name] = round(_time.time() - t0, 3)
        return out

    from ahrd_spark import __version__ as _engine_version

    # the weight table's CONTENT belongs in the config hash: a resume with
    # retrained weights must invalidate the fingerprint checkpoint, not
    # silently reuse stale clf_prob_r.  The table is model-constant-sized
    # (<= classifier_buckets rows), so one tiny driver job is fine here.
    classifier_fp = None
    if classifier_weights is not None:
        classifier_fp = classifier_weights.select(
            F.bit_xor(F.xxhash64("bucket", "weight")).alias("s")
        ).first()["s"]

    ckpt = CheckpointManager(
        spark,
        workdir,
        config_obj={
            "engine": _engine_version,
            "curation": cfg.__dict__,
            "has_benchmark": benchmark is not None,
            "classifier_fp": classifier_fp,
        },
    )

    # -- stage 0: normalize (optional) -----------------------------------
    pre_stages: list[str] = []
    if cfg.normalize or cfg.c4_filter:
        from ahrd_spark.operators.normalize import (
            c4_line_filter,
            clean_text_expr,
            nfc_normalize,
        )

        def build_normalize():
            base = docs
            if cfg.c4_filter:
                extras = tuple(
                    c for c in docs.columns if c not in ("doc_id", "text")
                )
                base = c4_line_filter(base, keep_cols=extras).select(
                    "doc_id",
                    F.col("clean_text").alias("text"),
                    F.col("doc_rejected").alias("c4_rejected"),
                    *extras,
                )
            else:
                base = base.withColumn("c4_rejected", F.lit(False))
            if cfg.normalize:
                base = base.withColumn("text", clean_text_expr(F.col("text")))
                base = nfc_normalize(base, ["text"])
            return base

        docs = _timed("normalize", lambda: ckpt.run_stage(
            "normalize", build_normalize, key="doc_id",
            num_partitions=num_partitions,
        ))
        pre_stages = ["normalize"]

    # -- stage 1: fingerprint ------------------------------------------
    def build_fingerprint():
        sig = minhash_signature(
            docs, num_hashes=cfg.num_hashes, shingle_k=cfg.shingle_k
        )
        signals = docs.select(
            "doc_id",
            F.md5("text").alias("content_hash"),
            ws_token_count_expr(F.col("text")).cast("long").alias("ws_tokens"),
            F.round(quality_score_expr(F.col("text")), 6).alias("quality_r"),
            lang_id_expr(F.col("text")).alias("lang_guess"),
            (
                F.col("c4_rejected") if "c4_rejected" in docs.columns
                else F.lit(False)
            ).alias("c4_rejected"),
        )
        if classifier_weights is not None:
            from ahrd_spark.operators.classifier import hashed_linear_scores

            clf = hashed_linear_scores(
                docs, classifier_weights, cfg.classifier_buckets,
                bias=cfg.classifier_bias,
            ).select("doc_id", F.round("prob", 6).alias("clf_prob_r"))
            signals = signals.join(clf, "doc_id")
        else:
            signals = signals.withColumn(
                "clf_prob_r", F.lit(None).cast("double")
            )
        # all sides are doc-keyed; the signature agg's output partitioning
        # is reusable, so AQE plans these joins without a second docs shuffle
        return signals.join(sig, "doc_id")

    fp = _timed("fingerprint", lambda: ckpt.run_stage(
        "fingerprint", build_fingerprint, key="doc_id",
        inputs=pre_stages, num_partitions=num_partitions,
    ))

    # -- stage 2: dedup keeper decisions --------------------------------
    def build_dedup():
        exact = fp.groupBy("content_hash").agg(
            F.min("doc_id").alias("exact_keeper")
        )
        # C4-rejected docs are gated out downstream ('boilerplate' precedes
        # every dedup reason) and their text is '' — ONE shared minhash
        # signature that would flood a single LSH bucket with the entire
        # rejected set (O(N^2) pair expansion at web scale).  Keep them out
        # of the pairing; the node universe below still includes them, so
        # the canonical join stays total.
        pairs = lsh_candidate_pairs(
            fp.filter(~F.col("c4_rejected")).select("doc_id", "sig"),
            bands=cfg.bands,
            rows_per_band=cfg.rows_per_band,
        )
        canon = dedup_canonical(fp.select("doc_id"), pairs)
        return (
            fp.select("doc_id", "content_hash")
            .join(exact, "content_hash")
            .join(canon, "doc_id")
            .select(
                "doc_id",
                "canonical_id",
                (
                    (F.col("doc_id") == F.col("exact_keeper"))
                    & (F.col("doc_id") == F.col("canonical_id"))
                ).alias("keep_dedup"),
            )
        )

    dedup = _timed("dedup_decide", lambda: ckpt.run_stage(
        "dedup_decide", build_dedup, key="doc_id",
        inputs=["fingerprint"], num_partitions=num_partitions,
    ))

    # -- stage 3: quality gate ------------------------------------------
    def build_gate():
        base = fp.join(dedup.select("doc_id", "keep_dedup"), "doc_id")
        if benchmark is not None:
            contam = contamination_flags(
                docs, benchmark,
                k=cfg.decontam_k, min_matches=cfg.decontam_min_matches,
            ).select("doc_id", "contaminated")
            base = base.join(contam, "doc_id", "left")
        else:
            base = base.withColumn("contaminated", F.lit(False))
        lang_ok = (
            F.col("lang_guess").isin(*cfg.langs) if cfg.langs else F.lit(True)
        )
        reason = (
            F.when(F.col("c4_rejected"), F.lit("boilerplate"))
            .when(~F.col("keep_dedup"), F.lit("duplicate"))
            .when(F.col("ws_tokens") < cfg.min_tokens, F.lit("too_short"))
            .when(F.col("ws_tokens") > cfg.max_tokens, F.lit("too_long"))
            .when(
                F.col("quality_r") < cfg.min_quality_r, F.lit("low_quality")
            )
        )
        if cfg.classifier_threshold is not None:
            reason = reason.when(
                F.col("clf_prob_r") < cfg.classifier_threshold,
                F.lit("classifier"),
            )
        reason = reason.when(~lang_ok, F.lit("lang")).when(
            F.coalesce("contaminated", F.lit(False)),
            F.lit("contaminated"),
        )
        return base.select(
            "doc_id",
            reason.isNull().alias("keep"),
            reason.alias("drop_reason"),
        )

    gate = _timed("quality_gate", lambda: ckpt.run_stage(
        "quality_gate", build_gate, key="doc_id",
        inputs=["fingerprint", "dedup_decide"], num_partitions=num_partitions,
    ))

    # -- stage 4: materialize -------------------------------------------
    def build_curated():
        kept = gate.filter(F.col("keep")).select("doc_id")
        return docs.join(kept, "doc_id").join(
            fp.select("doc_id", "ws_tokens", "quality_r", "lang_guess"),
            "doc_id",
        )

    return _timed("materialize", lambda: ckpt.run_stage(
        "materialize", build_curated, key="doc_id",
        inputs=["quality_gate"], num_partitions=num_partitions,
    ))
