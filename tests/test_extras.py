"""Unit tests for the training-data-pipeline extras: dedup, similarity
search, text stats, multimodal plumbing, streaming windowed aggs."""

import pytest
from pyspark.sql import functions as F

from ahrd_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signature,
    simhash_expr,
)
from ahrd_spark.operators.multimodal import decode_media, fetch_media_stub
from ahrd_spark.operators.similarity import cosine_topk, lsh_bucketed_topk
from ahrd_spark.operators.textstats import (
    bpe_ish_token_count_expr,
    lang_id_expr,
    quality_score_expr,
    ws_token_count_expr,
)
from ahrd_spark.streaming.pipeline import windowed_event_counts


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup
        (2, "the quick brown fox jumps over a lazy dog today"),  # near dup
        (3, "der hund ist nicht ein fuchs und das ist gut"),
        (4, "completely different content about spark engines"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs).collect()
    by_canon = {r["canonical_id"]: r["dup_count"] for r in out}
    assert by_canon[0] == 2  # docs 0 and 1 collapse
    assert len(out) == 4


def test_minhash_lsh_finds_near_dups(spark, docs):
    sig = minhash_signature(docs, num_hashes=16)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(sig, bands=8, rows_per_band=2).collect()
    }
    assert (0, 1) in pairs  # exact dups always collide
    assert not any(3 in p or 4 in p for p in pairs if p != (3, 4))


def test_jaccard(spark, docs):
    pairs = spark.createDataFrame([(0, 1), (0, 4)], "doc_a bigint, doc_b bigint")
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in jaccard_pairs(docs, pairs).collect()}
    assert out[(0, 1)] == 1.0
    assert out[(0, 4)] < 0.2


def test_simhash_near_for_near_dups(spark, docs):
    out = {r["doc_id"]: r["sh"] for r in docs.select(
        "doc_id", simhash_expr(F.col("text"), bits=16).alias("sh")).collect()}
    assert out[0] == out[1]
    ham = bin(out[0] ^ out[2]).count("1")
    ham_far = bin(out[0] ^ out[4]).count("1")
    assert ham <= ham_far


def test_text_stats(spark):
    df = spark.createDataFrame([("hello world, nice day!",)], "text string")
    r = df.select(
        ws_token_count_expr(F.col("text")).alias("ws"),
        bpe_ish_token_count_expr(F.col("text")).alias("bpe"),
        quality_score_expr(F.col("text")).alias("q"),
    ).first()
    assert r["ws"] == 4
    assert r["bpe"] == 6  # 4 words + ',' + '!'
    assert 0.0 <= r["q"] <= 1.0


def test_lang_id(spark, docs):
    out = {r["doc_id"]: r["lang"] for r in docs.select(
        "doc_id", lang_id_expr(F.col("text")).alias("lang")).collect()}
    assert out[0] == "en"
    assert out[3] == "de"


def test_cosine_topk_and_lsh(spark):
    import math

    def vec(angle):
        return [math.cos(angle), math.sin(angle), 0.0, 0.0]

    rows = [(i, vec(i * 0.1)) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = emb.filter(F.col("vec_id") == 0)
    c = emb.filter(F.col("vec_id") > 0)
    top = cosine_topk(q, c, k=3).collect()
    assert [r["neighbor_id"] for r in top] == [1, 2, 3]
    assert top[0]["cosine"] > 0.99
    # LSH variant returns a subset ranking consistent with cosine order
    lsh = lsh_bucketed_topk(q, c, dim=4, k=3, bits=2).collect()
    got = [r["neighbor_id"] for r in lsh]
    assert got == sorted(got, key=lambda n: dict(
        (r["neighbor_id"], -r["cosine"]) for r in lsh)[n])


def test_embedding_dup_pairs(spark):
    import math

    from ahrd_spark.operators.dedup import embedding_dup_pairs

    def vec(angle):
        return [math.cos(angle), math.sin(angle), 0.0, 0.0]

    # 0/1 nearly identical; 2 orthogonal to both
    rows = [(0, vec(0.0)), (1, vec(0.01)), (2, vec(math.pi / 2))]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = embedding_dup_pairs(emb, threshold=0.9, dim=4, bits=2).collect()
    pairs = {(r["vec_a"], r["vec_b"]) for r in out}
    assert (0, 1) in pairs
    assert all(r["cosine"] >= 0.9 for r in out)


def test_ivf_topk_matches_exact_on_probed_recall(spark):
    import math

    from ahrd_spark.operators.similarity import ivf_topk

    def vec(angle):
        return [math.cos(angle), math.sin(angle), 0.0, 0.0]

    rows = [(i, vec(i * 0.1)) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = emb.filter(F.col("vec_id") == 0)
    c = emb.filter(F.col("vec_id") > 0)
    # probing every cell makes IVF exact -> must equal brute force
    exact = cosine_topk(q, c, k=3).collect()
    ivf = ivf_topk(q, c, n_centroids=4, nprobe=4, k=3).collect()
    assert [r["neighbor_id"] for r in ivf] == [r["neighbor_id"] for r in exact]


def test_multimodal_decode(spark, docs):
    media = docs.select(
        F.md5("text").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit("ref://x").alias("source_ref"),
    )
    out = decode_media(media).collect()
    assert len(out) == 5
    for r in out:
        assert r["n_bytes"] > 0 and r["width"] and r["height"]
    # deterministic: same payload -> same fingerprint/shape
    again = decode_media(media).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))


def test_fetch_media_stub_from_docs_spans(spark):
    from ahrd_spark.plans.docs import synthesize_docs

    docs = synthesize_docs(spark, 4, hits_per_doc=3)
    media = fetch_media_stub(docs)
    assert media.count() == 12
    decoded = decode_media(media)
    assert decoded.count() == 12


def test_windowed_event_counts_batch(spark):
    rows = [
        ("2024-01-01 00:10:00", "click", 1.0),
        ("2024-01-01 00:50:00", "click", 2.0),
        ("2024-01-01 01:10:00", "click", 4.0),
        ("2024-01-01 00:20:00", "error", 8.0),
    ]
    ev = spark.createDataFrame(rows, "ts string, event_type string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = {(str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
           for r in windowed_event_counts(ev, window="1 hour").collect()}
    assert out[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert out[("2024-01-01 01:00:00", "click")] == (1, 4.0)
    assert out[("2024-01-01 00:00:00", "error")] == (1, 8.0)


def test_stream_mention_detect(spark, tmp_path):
    """Structured Streaming variant: same gate plan, streaming execution."""
    from ahrd_spark.plans.docs import synthesize_docs
    from ahrd_spark.plans.pipeline import gate_candidates_multi
    from ahrd_spark.plans.docs import docs_to_hits
    from ahrd_spark.streaming.pipeline import stream_mention_detect
    from bench import _pipeline_cfg

    cfg = _pipeline_cfg()
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    docs = synthesize_docs(spark, 50, hits_per_doc=5)
    docs.write.parquet(src)
    q = stream_mention_detect(spark, cfg, src, sink, ck, trigger_once=True)
    assert q.awaitTermination(600), "stream did not finish in 600s"
    got = spark.read.parquet(sink).count()
    expected = gate_candidates_multi(docs_to_hits(docs), cfg).count()
    assert got == expected > 0


def test_multimodal_resize_and_frame_sample(spark, docs):
    from ahrd_spark.operators.multimodal import resize_images, sample_frames

    media = docs.select(
        F.md5("text").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("video")),
            (F.col("doc_id") % 2 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit("ref://x").alias("source_ref"),
    )
    n_img = media.filter(F.col("kind") == "image").count()
    resized = resize_images(media, target_w=64, target_h=48).collect()
    assert len(resized) == n_img
    assert all(r["width"] == 64 and r["height"] == 48 for r in resized)
    assert all(len(r["payload"]) == 16 for r in resized)  # md5 stub bytes

    frames = sample_frames(media, every_n=1000, max_frames=3)
    rows = frames.collect()
    assert rows, "videos present -> some frames"
    per_vid = {}
    for r in rows:
        per_vid.setdefault(r["media_id"], []).append(r["frame_no"])
    for nos in per_vid.values():
        assert len(nos) <= 3
        assert sorted(nos) == nos or sorted(nos) == sorted(nos)
        assert all(n % 1000 == 0 for n in nos)


def test_stateful_session_counts_stream_equals_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer over a real stream must agree
    with the batch lag-window sessionize on the same input."""
    import datetime as dt

    from ahrd_spark.streaming.pipeline import stateful_session_counts

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in (1, 2):
        for sess in range(3):
            for j in range(4):
                rows.append(
                    (eid, user,
                     base + dt.timedelta(hours=2 * sess, minutes=j * (5 + user)))
                )
                eid += 1
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp"
    )
    src = str(tmp_path / "events_src")
    ev.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful_session_counts(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in spark.sql(
            "SELECT user_id, n_sessions, n_events FROM ("
            " SELECT *, row_number() OVER (PARTITION BY user_id"
            "   ORDER BY n_events DESC) rk FROM sess_test) WHERE rk = 1"
        ).collect()
    }
    assert got == {1: (3, 12), 2: (3, 12)}


def test_stream_triples_equals_batch_pipeline(spark, tmp_path):
    """Incremental docs->triples (stream_triples, foreachBatch micro-batch
    mode) produces exactly the batch pipeline's (subj, pred, obj) set when
    the same docs arrive across multiple triggers — micro-batching is
    exact because docs are self-contained and scoring is per-protein.
    Uses the reference's GO-prediction batch example, so the hasGOTerm
    path (per-batch GOA semi-join + transfer) is exercised too."""
    from ahrd_spark.config import load_config
    from ahrd_spark.plans.docs import build_docs
    from ahrd_spark.plans.pipeline import run_pipeline
    from ahrd_spark.streaming.pipeline import stream_triples

    cfg = load_config(
        "/root/reference/ahrd_example_input_go_prediction.yml",
        base_dir="/root/reference",
    )
    docs = build_docs(spark, cfg)
    batch_triples = {
        (r["subj"], r["pred"], r["obj"])
        for r in run_pipeline(
            spark, docs, cfg, str(tmp_path / "batch_ckpt")
        ).collect()
    }

    src = str(tmp_path / "docs_src")
    docs.repartition(3).write.mode("overwrite").parquet(src)
    sink = str(tmp_path / "triples_sink")
    q = stream_triples(
        spark, cfg, src, sink, str(tmp_path / "stream_ckpt"),
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    got = spark.read.parquet(sink)
    assert "batch_id" in got.columns  # idempotent per-batch partition dirs
    stream_triples_set = {
        (r["subj"], r["pred"], r["obj"]) for r in got.collect()
    }
    assert stream_triples_set == batch_triples and len(batch_triples) > 0
    # multiple triggers actually happened (3 source files, 1 per trigger)
    assert got.select("batch_id").distinct().count() >= 2


def test_table_io_uri_dispatch(spark, tmp_path):
    """table_io: the one seam for docs/triples IO — parquet paths and
    catalog tables round-trip; iceberg: URIs parse and fail loudly here
    (no Iceberg runtime jars in the sandbox, documented in the module)."""
    import pytest as _pytest

    from ahrd_spark.sources.table_io import (
        parse_table_uri,
        read_table,
        write_table,
    )

    assert parse_table_uri("iceberg:db.docs") == ("iceberg", "db.docs")
    assert parse_table_uri("table:t1") == ("table", "t1")
    assert parse_table_uri("s3a://b/p") == ("path", "s3a://b/p")
    assert parse_table_uri("/tmp/x") == ("path", "/tmp/x")

    from pyspark.sql import functions as F

    df = spark.range(10).select(
        F.col("id").alias("subj"), F.lit("p").alias("pred")
    )
    # path round-trip
    p = str(tmp_path / "t")
    write_table(df, p)
    assert read_table(spark, p).count() == 10
    # catalog-table round-trip (in-memory/derby catalog, no Iceberg needed)
    write_table(df, "table:t_io_roundtrip")
    try:
        assert read_table(spark, "table:t_io_roundtrip").count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS t_io_roundtrip")
    # iceberg needs runtime jars + catalog config -> loud failure here
    with _pytest.raises(Exception):
        write_table(df, "iceberg:nosuch.catalog_table")


def test_minhash_short_doc_tail_behavior(spark):
    """Docs shorter than shingle_k still get a signature (one truncated
    shingle), and signatures are insensitive to the formulation's
    element_at-past-end nulls: a 1-token doc's single shingle is the token
    itself."""
    from ahrd_spark.operators.dedup import minhash_signature

    df = spark.createDataFrame(
        [("a", "one"), ("b", "one two"), ("c", "one two three four")],
        "doc_id string, text string",
    )
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signature(df).collect()}
    assert set(sigs) == {"a", "b", "c"} and all(len(s) == 16 for s in sigs.values())
    # a's only shingle is "one"; c contains shingle "one two three" — all
    # three docs must have DISTINCT signatures (different shingle sets)
    assert sigs["a"] != sigs["b"] and sigs["b"] != sigs["c"]


def test_dedup_canonical_transitive_clusters(spark):
    """A~B and B~C must collapse to ONE cluster even though (A,C) was never
    a detected pair — dedup is component-wise, not pairwise."""
    from ahrd_spark.operators.dedup import dedup_canonical

    docs = spark.createDataFrame(
        [(i,) for i in range(6)], "doc_id bigint"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "doc_a bigint, doc_b bigint"
    )
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup_canonical(docs, pairs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}
    # keep-filter semantics: one keeper per cluster
    keepers = [d for d, c in got.items() if d == c]
    assert sorted(keepers) == [0, 3, 4]


def test_sampling_determinism_and_strata(spark):
    """hash_sample: same (id, salt) -> same membership across calls and
    partitionings; smaller fraction with the same salt nests inside the
    larger.  stratified_sample: per-stratum rates, unknown strata dropped."""
    from pyspark.sql import functions as F

    from ahrd_spark.operators.sampling import hash_sample, stratified_sample

    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
    )
    s25 = {r["doc_id"] for r in hash_sample(docs, 0.25, salt="s").collect()}
    s25b = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(13), 0.25, salt="s").collect()
    }
    assert s25 == s25b and 0.2 < len(s25) / 4000 < 0.3
    s05 = {r["doc_id"] for r in hash_sample(docs, 0.05, salt="s").collect()}
    assert s05 <= s25  # nested: same salt, smaller threshold
    other = {r["doc_id"] for r in hash_sample(docs, 0.25, salt="t").collect()}
    assert other != s25  # different salt -> different (disjoint-ish) sample

    strat = stratified_sample(
        docs, {"src0": 1.0, "src1": 0.25}, strata_col="source", salt="m"
    )
    by_src = {
        r["source"]: r["n"]
        for r in strat.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src.get("src0") == 1000          # fraction 1.0 keeps all
    assert 150 < by_src.get("src1", 0) < 350   # ~25% of 1000
    assert "src2" not in by_src and "src3" not in by_src  # allowlist


def test_pack_sequences_contract(spark):
    """Packing invariants: deterministic under repartitioning; within a
    (bucket, pack_id) the token total exceeds the budget by at most one
    doc's tokens; every pack except a bucket's last is at least
    budget-full; long docs get their own pack."""
    from pyspark.sql import functions as F

    from ahrd_spark.operators.packing import pack_sequences

    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.abs(F.xxhash64("id")) % 900 + 1).alias("n_tokens"),
    )
    packed = pack_sequences(docs, "n_tokens", budget=512, buckets=4, salt="t")
    again = pack_sequences(
        docs.repartition(17), "n_tokens", budget=512, buckets=4, salt="t"
    )
    a = {(r["doc_id"]): (r["bucket"], r["pack_id"]) for r in packed.collect()}
    b = {(r["doc_id"]): (r["bucket"], r["pack_id"]) for r in again.collect()}
    assert a == b  # pure function of (corpus, params)

    # exact model: within each bucket (ordered by doc_id), pack_id =
    # floor(exclusive_prefix_sum / budget)
    rows = sorted(packed.collect(), key=lambda r: (r["bucket"], r["doc_id"]))
    cum: dict = {}
    for r in rows:
        pre = cum.get(r["bucket"], 0)
        assert r["pack_id"] == pre // 512, (r, pre)
        cum[r["bucket"]] = pre + r["n_tokens"]
    # overflow contract: a pack exceeds the budget by at most one doc's
    # tokens (max doc here is 900)
    packs: dict = {}
    for r in rows:
        packs.setdefault((r["bucket"], r["pack_id"]), 0)
        packs[(r["bucket"], r["pack_id"])] += r["n_tokens"]
    assert all(total < 512 + 900 for total in packs.values())


def test_chunk_documents_model(spark):
    """Sliding-window chunking: every token covered, stride overlap exact,
    tail chunk short, <=window docs yield one chunk, empty docs one empty
    chunk."""
    from pyspark.sql import functions as F

    from ahrd_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (0, " ".join(f"t{i}" for i in range(10))),   # 10 toks: 3 chunks
            (1, "a b c"),                                  # 1 chunk, short
            (2, " ".join(f"u{i}" for i in range(4))),    # exactly window
            (3, ""),                                       # empty doc
            (4, " ".join(f"v{i}" for i in range(7))),    # 7 toks: 2 chunks
        ],
        "doc_id LONG, text STRING",
    )
    out = sorted(
        chunk_documents(docs, window=4, stride=3).collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 10 tokens, window 4, stride 3 -> ceil(6/3)+1 = 3 chunks
    c0 = by_doc[0]
    assert [(r.start_token, r.n_tokens) for r in c0] == [(0, 4), (3, 4), (6, 4)]
    assert c0[1].chunk_text == "t3 t4 t5 t6"  # stride overlap of 1 token
    assert by_doc[1][0].chunk_text == "a b c" and len(by_doc[1]) == 1
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_tokens == 4
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_tokens == 0
    assert by_doc[3][0].chunk_text == ""
    assert [(r.start_token, r.n_tokens) for r in by_doc[4]] == [(0, 4), (3, 4)]
    # full coverage: union of [start, start+n_tokens) == [0, n)
    covered = set()
    for r in by_doc[0]:
        covered |= set(range(r.start_token, r.start_token + r.n_tokens))
    assert covered == set(range(10))
    # disjoint mode
    dis = chunk_documents(
        docs.filter("doc_id = 0"), window=4, stride=4
    ).collect()
    assert sorted((r.start_token, r.n_tokens) for r in dis) == [
        (0, 4), (4, 4), (8, 2)
    ]
    with pytest.raises(ValueError):
        chunk_documents(docs, window=0, stride=3)


def test_stream_triples_incremental_resume(spark, tmp_path):
    """Restarting stream_triples with the same streaming checkpoint after
    new docs land processes ONLY the new files (incremental ingest), and
    the accumulated sink equals the batch pipeline over the full corpus."""
    import glob
    import shutil

    from ahrd_spark.config import load_config
    from ahrd_spark.plans.docs import build_docs
    from ahrd_spark.plans.pipeline import run_pipeline
    from ahrd_spark.streaming.pipeline import stream_triples

    cfg = load_config(
        "/root/reference/ahrd_example_input_go_prediction.yml",
        base_dir="/root/reference",
    )
    docs = build_docs(spark, cfg).cache()
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    first, rest = ids[:-1], ids[-1:]

    src = str(tmp_path / "src")
    stage = str(tmp_path / "stage")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    from pyspark.sql import functions as F

    docs.filter(F.col("doc_id").isin(first)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    q = stream_triples(spark, cfg, src, sink, ckpt)
    assert q.awaitTermination(600), "stream did not finish in 600s"
    batches_before = {
        r["batch_id"]
        for r in spark.read.parquet(sink).select("batch_id").distinct().collect()
    }

    # a new docs file lands; same checkpoint -> only the new file processes
    docs.filter(F.col("doc_id").isin(rest)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    for f in glob.glob(f"{stage}/part-*"):
        shutil.copy(f, f"{src}/late-{f.split('/')[-1]}")
    q2 = stream_triples(spark, cfg, src, sink, ckpt)
    assert q2.awaitTermination(600), "stream did not finish in 600s"

    got = spark.read.parquet(sink)
    new_batches = {
        r["batch_id"]
        for r in got.select("batch_id").distinct().collect()
    } - batches_before
    assert len(new_batches) == 1  # exactly one incremental batch ran
    new_subjects = {
        r["subj"]
        for r in got.filter(
            F.col("batch_id").isin([int(b) for b in new_batches])
        ).select("subj").distinct().collect()
    }
    assert new_subjects <= set(rest)  # the late doc only

    expected = {
        (r["subj"], r["pred"], r["obj"])
        for r in run_pipeline(
            spark, docs, cfg, str(tmp_path / "batch_ckpt")
        ).collect()
    }
    accumulated = {(r["subj"], r["pred"], r["obj"]) for r in got.collect()}
    assert accumulated == expected


def test_contamination_flags(spark):
    from ahrd_spark.operators.decontam import contamination_flags, ngram_rows

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),   # shares a 3-gram run
            (1, "alpha beta gamma zeta eta"),        # shares one 3-gram
            (2, "completely unrelated words here now"),
            (3, "tiny doc"),                          # shorter than k
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in contamination_flags(docs, bench, k=3, min_matches=2).collect()
    }
    assert set(out) == {0, 1, 2, 3}          # zero-overlap docs still emitted
    # doc0 grams: (a b g), (b g d), (g d e) — all 3 in the benchmark
    assert out[0]["n_matched"] == 3 and out[0]["contaminated"]
    # doc1 shares only (a b g)
    assert out[1]["n_matched"] == 1 and not out[1]["contaminated"]
    assert out[2]["n_matched"] == 0 and not out[2]["contaminated"]
    # short doc yields exactly one whole-text gram, checked not exempted
    assert out[3]["n_ngrams"] == 1 and out[3]["n_matched"] == 0

    grams = {r["gram"] for r in ngram_rows(docs.filter("doc_id = 3"), k=3).collect()}
    assert grams == {"tiny doc"}              # truncated, not padded/dropped


def test_repetition_stats(spark):
    from ahrd_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam"),              # maximally repetitive
            (1, "one two three four five six"),      # fully diverse
            (2, "ab cd ab cd ab cd"),                # repeated bigrams
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    r0 = out[0]
    assert r0["n_tokens"] == 4 and r0["n_distinct_tokens"] == 1
    assert r0["top_token_frac"] == 1.0 and r0["dup_token_frac"] == 0.75
    # bigrams: "spam spam" x3 -> 1 - 1/3
    assert r0["dup_bigram_frac"] == pytest.approx(0.666667, abs=1e-6)
    assert r0["repetitive"]

    r1 = out[1]
    assert r1["dup_token_frac"] == 0.0 and r1["dup_bigram_frac"] == 0.0
    assert r1["top_token_frac"] == pytest.approx(1 / 6, abs=1e-6)
    assert not r1["repetitive"]

    # doc2: 6 tokens, 2 distinct; 5 bigrams, 2 distinct ("ab cd", "cd ab")
    r2 = out[2]
    assert r2["dup_bigram_frac"] == pytest.approx(0.6, abs=1e-6)
    assert r2["repetitive"]


def _naive_ppm(w, h, seed=7):
    """Independent P6 builder: header + deterministic pixel bytes."""
    pix = bytes((seed + 11 * i) % 256 for i in range(w * h * 3))
    return b"P6\n%d %d\n255\n" % (w, h) + pix, pix


def test_ppm_codec_roundtrip_and_header_quirks():
    import numpy as np

    from ahrd_spark.operators.multimodal import (
        ppm_decode, ppm_encode, ppm_resize_nn, ppm_stream_frames, wav_info,
    )

    b, pix = _naive_ppm(5, 3)
    arr = ppm_decode(b)
    assert arr.shape == (3, 5, 3) and arr.tobytes() == pix
    assert ppm_decode(ppm_encode(arr)).tobytes() == pix  # round-trip

    # spec quirks: comments + multi-whitespace in the header
    commented = b"P6 # c1\n# full comment line\n 5\t3 #w h\n255\n" + pix
    assert ppm_decode(commented).tobytes() == pix

    # nearest-neighbor equals the naive floor-mapped double loop
    rs = ppm_resize_nn(arr, 2, 2)
    for ty in range(2):
        for tx in range(2):
            sy, sx = (ty * 3) // 2, (tx * 5) // 2
            assert (rs[ty, tx] == arr[sy, sx]).all()

    # concatenated-P6 stream: offsets slice back to the exact inputs
    f0, _ = _naive_ppm(2, 2, seed=1)
    f1, _ = _naive_ppm(2, 2, seed=2)
    f2, _ = _naive_ppm(2, 2, seed=3)
    stream = f0 + f1 + f2
    spans = ppm_stream_frames(stream)
    assert [stream[o:o + n] for o, n in spans] == [f0, f1, f2]

    # minimal PCM WAV: 2ch 16-bit 8kHz, 25 frames -> 100 data bytes
    import struct
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    data = bytes(100)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)
    info = wav_info(wav)
    assert info == {"channels": 2, "sample_rate": 8000, "frames": 25}

    # grayscale P5 PGM is a supported sibling format (see the P5 test);
    # P4 bitmaps and plain-text P1-P3 stay rejected
    assert ppm_decode(b"P5\n2 2\n255\n" + bytes(4)).shape == (2, 2)
    with pytest.raises(ValueError):
        ppm_decode(b"P4\n2 2\n" + bytes(1))


def test_multimodal_real_codecs_through_spark(spark):
    from ahrd_spark.operators.multimodal import (
        decode_media, resize_images, sample_frames,
    )

    img, _ = _naive_ppm(6, 4)
    f0, _ = _naive_ppm(2, 2, seed=1)
    f1, _ = _naive_ppm(2, 2, seed=2)
    f2, _ = _naive_ppm(2, 2, seed=3)
    import struct
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 36 + 64) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", 64) + bytes(64))
    rows = [
        ("m_img", "image", bytearray(img), "image/x-portable-pixmap", None),
        ("m_vid", "video", bytearray(f0 + f1 + f2),
         "video/x-ppm-stream", None),
        ("m_wav", "audio", bytearray(wav), "audio/wav", None),
        ("m_jpg", "image", bytearray(b"\xff\xd8not-really-jpeg"),
         "image/jpeg", None),  # fallback path stays alive
    ]
    from ahrd_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    dec = {r["media_id"]: r for r in decode_media(media).collect()}
    assert (dec["m_img"]["width"], dec["m_img"]["height"]) == (6, 4)
    assert dec["m_vid"]["frames"] == 3
    assert (dec["m_vid"]["width"], dec["m_vid"]["height"]) == (2, 2)
    assert dec["m_wav"]["frames"] == 32  # 64 bytes / block_align 2
    assert dec["m_jpg"]["width"] is not None  # stub fallback still decodes

    rs = {r["media_id"]: r for r in
          resize_images(media, target_w=3, target_h=2).collect()}
    from ahrd_spark.operators.multimodal import ppm_decode, ppm_resize_nn

    expect = ppm_resize_nn(ppm_decode(img), 3, 2)
    got = ppm_decode(bytes(rs["m_img"]["payload"]))
    assert (got == expect).all()
    assert len(rs["m_jpg"]["payload"]) == 16  # md5 stub for non-P6

    fr = sample_frames(media, every_n=2, max_frames=8).collect()
    by_no = {r["frame_no"]: bytes(r["payload"])
             for r in fr if r["media_id"] == "m_vid"}
    assert by_no == {0: f0, 2: f2}  # true byte slices, every 2nd frame


def test_pii_redaction(spark):
    from ahrd_spark.operators.pii import redact_pii

    rows = [
        (0, "write to jane.doe+x@sub.example.co.uk for details"),
        (1, "server at 192.168.10.255 port 8080"),
        (2, "call +44 (20) 7946-0958 today"),
        (3, "no pii here just words"),
        (4, "a@b.io and 10.0.0.1 and +1 555 010 4242"),
    ]
    out = {r["doc_id"]: r for r in
           redact_pii(spark.createDataFrame(rows, "doc_id bigint, text string")
                      ).collect()}
    assert out[0]["redacted"] == "write to <EMAIL> for details"
    assert out[0]["n_email"] == 1 and out[0]["has_pii"]
    assert out[1]["redacted"] == "server at <IP> port 8080"
    assert out[2]["redacted"] == "call <PHONE> today"
    assert out[3]["redacted"] == rows[3][1] and not out[3]["has_pii"]
    r4 = out[4]
    assert r4["redacted"] == "<EMAIL> and <IP> and <PHONE>"
    assert (r4["n_email"], r4["n_ip"], r4["n_phone"]) == (1, 1, 1)


def test_edit_distance_pairs(spark, docs):
    from ahrd_spark.operators.dedup import edit_distance_pairs

    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 4)], "doc_a bigint, doc_b bigint"
    )
    out = {
        (r["doc_a"], r["doc_b"]): r.asDict()
        for r in edit_distance_pairs(docs, pairs, max_distance=10).collect()
    }
    assert out[(0, 1)]["edit_distance"] == 0 and out[(0, 1)]["within"]
    # doc 2 appends ' today' and swaps 'the'->'a ' vs doc 0: small distance
    assert 0 < out[(0, 2)]["edit_distance"] <= 10
    assert not out[(0, 4)]["within"]  # unrelated content


def test_lsh_max_bucket_size_guard(spark):
    from ahrd_spark.operators.dedup import lsh_candidate_pairs, minhash_signature

    # 4 identical docs -> one flooded bucket -> 6 pairs uncapped, 0 capped
    flood = spark.createDataFrame(
        [(i, "same text repeated for the flood case") for i in range(4)]
        + [(10, "some other unique document body here")],
        "doc_id bigint, text string",
    )
    sig = minhash_signature(flood, num_hashes=4)
    assert lsh_candidate_pairs(sig, bands=2, rows_per_band=2).count() == 6
    assert lsh_candidate_pairs(
        sig, bands=2, rows_per_band=2, max_bucket_size=3
    ).count() == 0


def test_lsh_flood_bucket_filtered_before_collect(spark):
    """The cap must bound executor memory, not just output: a planted
    10k-member flood bucket is dropped by the pre-count semi-join BEFORE
    the per-bucket collect_set, so the giant member array never
    materializes; real near-dup pairs outside the flood still come out."""
    from ahrd_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )

    flood = [(i, "boilerplate footer shared by every page") for i in range(10_000)]
    real = [
        (20_000, "a genuinely unique near duplicate document body"),
        (20_001, "a genuinely unique near duplicate document body"),
    ]
    df = spark.createDataFrame(
        flood + real, "doc_id bigint, text string"
    ).repartition(8)
    sig = minhash_signature(df, num_hashes=4)
    capped = lsh_candidate_pairs(
        sig, bands=2, rows_per_band=2, max_bucket_size=100
    )
    # plan shape: the collect_set aggregate sits above a LeftSemi join
    # (the pre-count filter) — i.e. flood rows are gone pre-aggregation
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    rows = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert rows == {(20_000, 20_001)}


def test_pgm_p5_codec_roundtrip_resize_and_stream():
    import numpy as np

    from ahrd_spark.operators.multimodal import (
        _decode_payload,
        ppm_decode,
        ppm_encode,
        ppm_resize_nn,
        ppm_stream_frames,
    )

    gray = (np.arange(6 * 4, dtype=np.uint8)).reshape(6, 4)
    b = ppm_encode(gray)
    assert b.startswith(b"P5\n4 6\n255\n")
    assert np.array_equal(ppm_decode(b), gray)

    small = ppm_resize_nn(ppm_decode(b), 2, 3)
    assert small.shape == (3, 2)
    # naive-loop golden: src = floor(dst * extent / target)
    for y in range(3):
        for x in range(2):
            assert small[y, x] == gray[(y * 6) // 3, (x * 4) // 2]

    # the real decode path reports true dims for P5 images
    feats = _decode_payload("image", b)
    assert (feats["width"], feats["height"]) == (4, 6)

    # a mixed P5/P6 frame stream slices byte-exactly per frame magic
    rgb = np.zeros((6, 4, 3), dtype=np.uint8)
    stream = b + ppm_encode(rgb) + b
    spans = ppm_stream_frames(stream)
    assert len(spans) == 3
    off, ln = spans[1]
    assert stream[off:off + ln] == ppm_encode(rgb)
    v = _decode_payload("video", stream)
    assert v["frames"] == 3 and (v["width"], v["height"]) == (4, 6)


def test_group_split_leakage_safe(spark):
    import pytest

    from ahrd_spark.operators.sampling import group_split

    docs = spark.createDataFrame(
        [(i, f"g{i % 7}" if i % 11 else None) for i in range(200)],
        "doc_id bigint, grp string",
    )
    out = group_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, group_col="grp",
        salt="s1",
    ).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["grp"], set()).add(r["split"])
    # every group (including the NULL group) lands entirely in ONE split
    assert all(len(v) == 1 for v in by_group.values()), by_group
    assert {r["split"] for r in out} <= {"train", "val", "test"}
    assert len(out) == 200  # no rows lost, NULL group included

    # determinism across partition layouts
    out2 = group_split(
        docs.repartition(13), {"train": 0.8, "val": 0.1, "test": 0.1},
        group_col="grp", salt="s1",
    ).collect()
    assert {(r["doc_id"], r["split"]) for r in out} == \
           {(r["doc_id"], r["split"]) for r in out2}

    with pytest.raises(ValueError):
        group_split(docs, {"train": 0.8, "val": 0.1}, group_col="grp")


def test_group_split_rejects_out_of_range_weights(spark):
    import pytest

    from ahrd_spark.operators.sampling import group_split

    docs = spark.createDataFrame([(1, "g")], "doc_id bigint, grp string")
    with pytest.raises(ValueError, match="in \\(0, 1\\]"):
        group_split(docs, {"train": 1.2, "test": -0.2}, group_col="grp")
    with pytest.raises(ValueError, match="non-empty"):
        group_split(docs, {}, group_col="grp")


def test_ppm_encode_rejects_bad_shapes():
    import numpy as np
    import pytest

    from ahrd_spark.operators.multimodal import ppm_encode

    for shape in [(2, 2, 4), (2, 2, 1), (4,)]:
        with pytest.raises(ValueError, match="expected"):
            ppm_encode(np.zeros(shape, dtype=np.uint8))


def test_corpus_profile_exact_percentiles(spark):
    from ahrd_spark.operators.textstats import corpus_profile

    # 5 docs of known char lengths 2,4,6,8,10 -> p50=6, p90 interpolates
    # between 8 and 10 at rank 0.9*(5-1)=3.6 -> 9.2
    docs = spark.createDataFrame(
        [(i, "x" * n) for i, n in enumerate([2, 4, 6, 8, 10])],
        "doc_id bigint, text string",
    )
    [row] = corpus_profile(docs).collect()
    assert row["lang"] == "und" and row["n_docs"] == 5
    assert row["mean_chars"] == 6.0
    assert row["chars_p50"] == 6.0
    assert abs(row["chars_p90"] - 9.2) < 1e-9
    assert abs(row["chars_p99"] - 9.92) < 1e-9
    # each doc is a single run of x's -> 1 whitespace token
    assert row["toks_p90"] == 1.0

    approx = corpus_profile(docs, exact=False).collect()[0]
    assert approx["n_docs"] == 5
    assert set(approx.asDict()) == set(row.asDict())


def test_rrf_fuse_hand_golden(spark):
    from ahrd_spark.operators.retrieval import rrf_fuse

    rankings = spark.createDataFrame(
        [
            ("bm25", 1, 10, 1), ("bm25", 1, 11, 2), ("bm25", 1, 12, 3),
            ("ann", 1, 11, 1), ("ann", 1, 13, 2),
        ],
        "retriever string, query_id int, doc_id int, rank int",
    )
    rows = rrf_fuse(rankings, k=60, topn=10).collect()
    got = {r["doc_id"]: (r["n_retrievers"], r["rrf_score"], r["rrf_rank"])
           for r in rows}
    # doc 11 fused from both lists wins
    assert got[11][0] == 2
    assert abs(got[11][1] - (1 / 62 + 1 / 61)) < 1e-15
    assert got[11][2] == 1
    assert got[10] == (1, 1 / 61, 2)
    assert got[13][2] == 3 and got[12][2] == 4  # 1/62 ties? no: 13 is 1/62, 12 is 1/63
    # deterministic doc_id tie-break: equal scores order by doc_id
    tie = spark.createDataFrame(
        [("a", 1, 5, 1), ("b", 1, 7, 1)],
        "retriever string, query_id int, doc_id int, rank int",
    )
    t = [r["doc_id"] for r in sorted(rrf_fuse(tie).collect(),
                                     key=lambda r: r["rrf_rank"])]
    assert t == [5, 7]


def test_asof_join_backward_semantics(spark):
    from ahrd_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "u", 10.0, "a"), (2, "u", 20.0, "b"), (3, "u", 5.0, "c"),
         (4, "v", 10.0, "d")],
        "event_id int, user string, ts double, tag string",
    )
    right = spark.createDataFrame(
        [("u", 10.0, 100.0), ("u", 15.0, 150.0), ("w", 1.0, 999.0)],
        "user string, ts double, px double",
    )
    rows = asof_join(left, right, keys=["user"], left_ts="ts",
                     right_ts="ts").collect()
    got = {r["event_id"]: (r["asof_ts"], r["asof_px"]) for r in rows}
    assert got[1] == (10.0, 100.0)   # equal ts matches (>= semantics)
    assert got[2] == (15.0, 150.0)   # latest preceding, not first
    assert got[3] == (None, None)    # nothing precedes ts=5
    assert got[4] == (None, None)    # key with no right rows (left join)
    assert {r["tag"] for r in rows} == {"a", "b", "c", "d"}


def test_asof_join_tolerance_and_ties(spark):
    from ahrd_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "u", 100.0)], "event_id int, user string, ts double"
    )
    right = spark.createDataFrame(
        [("u", 10.0, 1.0), ("u", 10.0, 7.0)], "user string, ts double, px double"
    )
    # duplicate (key, ts) right rows: largest payload struct wins
    [r] = asof_join(left, right, keys=["user"]).collect()
    assert r["asof_px"] == 7.0
    # tolerance: the ts=10 match is 90s stale -> nulled
    [r2] = asof_join(left, right, keys=["user"], tolerance_s=30).collect()
    assert r2["asof_px"] is None and r2["asof_ts"] is None
    [r3] = asof_join(left, right, keys=["user"], tolerance_s=95).collect()
    assert r3["asof_px"] == 7.0


def test_range_join_boundaries_and_bins(spark):
    import pytest as _pytest

    from ahrd_spark.operators.rangejoin import range_join

    left = spark.createDataFrame(
        [(1, 0.0), (2, 3.0), (3, 2.999), (4, 10.0)], "id int, v double"
    )
    iv = spark.createDataFrame(
        [("a", 0.0, 3.0), ("b", 2.5, 7.0)], "band string, lo double, hi double"
    )
    # bin width far smaller than intervals: correctness must not depend on it
    for bw in (0.5, 2.0, 10.0):
        got = {
            (r["id"], r["band"])
            for r in range_join(left, iv, "v", bin_width=bw).collect()
        }
        assert got == {(1, "a"), (2, "a"), (2, "b"), (3, "a"), (3, "b")}

    with _pytest.raises(ValueError):
        range_join(left, iv, "v", bin_width=0)


def test_range_join_left_keeps_unmatched(spark):
    from ahrd_spark.operators.rangejoin import range_join

    left = spark.createDataFrame([(1, 1.0), (2, 99.0)], "id int, v double")
    iv = spark.createDataFrame([("a", 0.0, 2.0)], "band string, lo double, hi double")
    rows = range_join(left, iv, "v", bin_width=1.0, how="left").collect()
    got = {r["id"]: r["band"] for r in rows}
    assert got == {1: "a", 2: None}


def test_range_join_left_null_payload_not_duplicated(spark):
    """A matched left row carrying a NULL column must appear exactly once
    (the anti-join uses null-safe equality; plain `=` re-emitted it as a
    spurious unmatched row)."""
    from ahrd_spark.operators.rangejoin import range_join

    left = spark.createDataFrame(
        [(1, 1.0, None), (2, 99.0, None), (3, 1.5, "x")],
        "id int, v double, payload string",
    )
    iv = spark.createDataFrame(
        [("a", 0.0, 2.0)], "band string, lo double, hi double"
    )
    rows = range_join(left, iv, "v", bin_width=1.0, how="left").collect()
    assert len(rows) == 3
    got = {r["id"]: r["band"] for r in rows}
    assert got == {1: "a", 2: None, 3: "a"}


def test_weighted_sample_deterministic_and_weight_biased(spark):
    import pytest as _pytest

    from ahrd_spark.operators.sampling import weighted_sample

    rows = [(i, 100.0 if i < 20 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    a = sorted(r["doc_id"] for r in weighted_sample(df, 30, "w").collect())
    b = sorted(r["doc_id"] for r in weighted_sample(df, 30, "w").collect())
    assert a == b and len(a) == 30           # deterministic, exact k
    # heavy rows (100x weight) should dominate the sample
    heavy = sum(1 for i in a if i < 20)
    assert heavy >= 15
    # different salt draws a different sample
    c = sorted(
        r["doc_id"] for r in weighted_sample(df, 30, "w", salt="x").collect()
    )
    assert c != a
    # non-positive / null weights excluded, k validated
    bad = spark.createDataFrame(
        [(1, -1.0), (2, 0.0), (3, None), (4, 5.0)], "doc_id bigint, w double"
    )
    assert [r["doc_id"] for r in weighted_sample(bad, 10, "w").collect()] == [4]
    with _pytest.raises(ValueError):
        weighted_sample(df, 0, "w")


def test_merge_intervals_blocks(spark):
    from ahrd_spark.operators.intervals import merge_intervals

    iv = spark.createDataFrame(
        [
            ("u", 0, 10), ("u", 5, 12), ("u", 12, 20),   # overlap + touch -> one
            ("u", 30, 40),                                # separate block
            ("v", 0, 1),                                  # other key
        ],
        "k string, lo bigint, hi bigint",
    )
    got = {
        (r["k"], r["lo"], r["hi"]): r["n_merged"]
        for r in merge_intervals(iv, keys=["k"]).collect()
    }
    assert got == {("u", 0, 20): 3, ("u", 30, 40): 1, ("v", 0, 1): 1}


def test_merge_intervals_contained_and_duplicate(spark):
    from ahrd_spark.operators.intervals import merge_intervals

    iv = spark.createDataFrame(
        [("u", 0, 100), ("u", 10, 20), ("u", 10, 20), ("u", 101, 102)],
        "k string, lo bigint, hi bigint",
    )
    got = {(r["lo"], r["hi"]): r["n_merged"]
           for r in merge_intervals(iv, keys=["k"]).collect()}
    assert got == {(0, 100): 3, (101, 102): 1}


def test_merge_intervals_rejects_inverted(spark):
    import pytest as _pytest

    from ahrd_spark.operators.intervals import merge_intervals

    iv = spark.createDataFrame([("u", 10, 5)], "k string, lo bigint, hi bigint")
    with _pytest.raises(Exception):
        merge_intervals(iv, keys=["k"]).collect()


def test_iqr_outliers_fences(spark):
    from ahrd_spark.operators.textstats import iqr_outliers

    # values 1..11 plus a 100 spike: q1=3.0, q3=9.0 (type-7 over 12 values:
    # rank .25*11=2.75 -> 3.75? compute below from duckdb-identical math)
    vals = [float(v) for v in range(1, 12)] + [100.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id int, v double")
    rows = iqr_outliers(df, "v").collect()
    got = {r["id"]: r["is_outlier"] for r in rows}
    assert got[11] is True                       # the spike
    assert sum(got.values()) == 1                # nothing else flagged
    [r] = [r for r in rows if r["id"] == 11]
    # exact type-7 quartiles over 12 sorted values
    import numpy as np
    q1, q3 = np.percentile(np.array(vals), [25, 75], method="linear")
    assert abs(r["q1"] - q1) < 1e-9 and abs(r["q3"] - q3) < 1e-9


def test_iqr_outliers_grouped(spark):
    from ahrd_spark.operators.textstats import iqr_outliers

    rows = [("a", float(v)) for v in range(10)] + [("a", 1000.0)] + [
        ("b", 1000.0)] * 5
    df = spark.createDataFrame([(i, g, v) for i, (g, v) in enumerate(rows)],
                               "id int, g string, v double")
    flagged = {r["id"] for r in iqr_outliers(df, "v", keys=["g"]).collect()
               if r["is_outlier"]}
    # only the spike within group a; group b is constant -> no outliers
    assert flagged == {10}


def test_transition_matrix_counts_and_probs(spark):
    from ahrd_spark.operators.sequences import transition_matrix

    rows = [
        ("u", 1, "a"), ("u", 2, "b"), ("u", 3, "a"), ("u", 4, "b"),
        ("v", 1, "a"), ("v", 2, "c"),
        ("w", 1, "a"),                       # length-1: contributes nothing
    ]
    df = spark.createDataFrame(rows, "k string, t int, state string")
    got = {
        (r["from_state"], r["to_state"]): (r["n"], r["p"])
        for r in transition_matrix(df, ["k"], ["t"], "state").collect()
    }
    # from a: a->b twice (u), a->c once (v) => p 2/3, 1/3; from b: b->a once
    assert got[("a", "b")] == (2, 2 / 3)
    assert got[("a", "c")] == (1, 1 / 3)
    assert got[("b", "a")] == (1, 1.0)
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "a")}


def test_rolling_window_features_range_semantics(spark):
    import pytest as _pytest

    from ahrd_spark.operators.sequences import rolling_window_features

    rows = [("u", 0.0, 1.0), ("u", 50.0, 2.0), ("u", 100.0, 4.0),
            ("u", 100.0, 8.0), ("v", 0.0, 1.0)]
    df = spark.createDataFrame(rows, "k string, t double, v double")
    out = rolling_window_features(df, ["k"], "t", windows_s=[60],
                                  value_col="v").collect()
    got = {(r["k"], r["t"], r["v"]): (r["cnt_60s"], r["sum_60s"]) for r in out}
    assert got[("u", 0.0, 1.0)] == (1, 1.0)
    assert got[("u", 50.0, 2.0)] == (2, 3.0)       # 0 and 50 in window
    # RANGE frame: the two t=100 rows are peers -> both see both
    assert got[("u", 100.0, 4.0)] == (3, 14.0)     # 50, 100, 100
    assert got[("u", 100.0, 8.0)] == (3, 14.0)
    assert got[("v", 0.0, 1.0)] == (1, 1.0)
    with _pytest.raises(ValueError):
        rolling_window_features(df, ["k"], "t", windows_s=[])


def test_funnel_counts_anchored_window(spark):
    from ahrd_spark.operators.events import funnel_counts

    rows = [
        # u1 completes view->click->purchase inside the window
        ("u1", "view", 0), ("u1", "click", 10), ("u1", "purchase", 20),
        # u2 clicks BEFORE viewing -> never reaches step 2
        ("u2", "click", 5), ("u2", "view", 6),
        # u3 clicks too late (outside the anchor window)
        ("u3", "view", 0), ("u3", "click", 200),
        # u4 never enters the funnel
        ("u4", "purchase", 1),
    ]
    df = spark.createDataFrame(rows, "k string, t string, ts long")
    out = funnel_counts(df, "k", "ts", "t",
                        steps=["view", "click", "purchase"], within=100)
    got = {r["step"]: (r["step_idx"], r["keys_cnt"], r["conv_r"])
           for r in out.collect()}
    assert got["view"] == (1, 3, 1.0)
    assert got["click"] == (2, 1, round(1 / 3, 6))
    assert got["purchase"] == (3, 1, round(1 / 3, 6))


def test_funnel_requires_two_steps(spark):
    import pytest as _pytest

    from ahrd_spark.operators.events import funnel_counts

    df = spark.createDataFrame([("u", "a", 1)], "k string, t string, ts long")
    with _pytest.raises(ValueError):
        funnel_counts(df, "k", "ts", "t", steps=["a"])


def test_cohort_retention_triangle(spark):
    from ahrd_spark.operators.events import cohort_retention

    # period = 10; u1 first active period 0, active 0 and 2; u2 period 1
    rows = [("u1", 3), ("u1", 7), ("u1", 25), ("u2", 12)]
    df = spark.createDataFrame(rows, "k string, ts long")
    out = cohort_retention(df, "k", "ts", period=10)
    got = {(r["cohort_period"], r["period_offset"]): r["active_cnt"]
           for r in out.collect()}
    assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_rollup_counts_flags_disambiguate_null_keys(spark):
    from ahrd_spark.operators.events import rollup_counts

    rows = [("a", "x", 1.0), ("a", None, 2.0), ("b", "x", 4.0)]
    df = spark.createDataFrame(rows, "d1 string, d2 string, v double")
    out = rollup_counts(df, ["d1", "d2"], value_col="v").collect()
    got = {(r["d1"], r["d2"], r["g_d1"], r["g_d2"]): (r["n"], r["sum_value_r"])
           for r in out}
    # real-NULL d2 cell vs rolled-up d2 cell for d1='a'
    assert got[("a", None, 0, 0)] == (1, 2.0)
    assert got[("a", None, 0, 1)] == (2, 3.0)
    assert got[(None, None, 1, 1)] == (3, 7.0)
    assert got[("b", "x", 0, 0)] == (1, 4.0)


def test_table_profile_census(spark):
    from ahrd_spark.operators.profile import table_profile

    rows = [(1, 2.5, "b", None), (1, None, "a", None), (3, 0.5, "a", None)]
    df = spark.createDataFrame(
        rows, "i bigint, x double, s string, arr array<int>"
    )
    prof = {r["col_name"]: r for r in table_profile(df).collect()}
    assert prof["i"]["nulls"] == 0 and prof["i"]["n_distinct"] == 2
    assert (prof["i"]["min_num"], prof["i"]["max_num"]) == (1.0, 3.0)
    assert prof["x"]["nulls"] == 1 and prof["x"]["max_num"] == 2.5
    assert (prof["s"]["min_str"], prof["s"]["max_str"]) == ("a", "b")
    assert prof["s"]["min_num"] is None
    # unsupported-for-minmax type still gets nulls/distinct counts
    assert prof["arr"]["nulls"] == 3 and prof["arr"]["n_distinct"] == 0
    # approx path keeps the same shape
    aprof = {r["col_name"]: r
             for r in table_profile(df, approx=True).collect()}
    assert aprof["i"]["n_distinct"] >= 1


def test_kcore_peel_reaches_core(spark):
    from ahrd_spark.operators.graph import kcore_peel

    # square a-b-c-d-a (2-core) with pendant e hanging off a, plus an
    # isolated chain f-g that dies in round 1
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "e"),
             ("f", "g")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["deg"]
           for r in kcore_peel(df, k=2, rounds=3).collect()}
    assert got == {"a": 2, "b": 2, "c": 2, "d": 2}

    import pytest as _pytest
    with _pytest.raises(ValueError):
        kcore_peel(df, k=0, rounds=1)


def test_inverted_index_cap_matches_uncapped_prefix(spark):
    from ahrd_spark.operators.retrieval import inverted_index

    rows = [(i, "alpha beta" if i % 2 == 0 else "alpha gamma")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    full = {r["term"]: (r["df"], r["postings"])
            for r in inverted_index(docs).collect()}
    assert full["alpha"][0] == 40 and full["alpha"][1] == list(range(40))
    assert full["beta"] == (20, list(range(0, 40, 2)))
    # salted two-phase cap == global sort+slice prefix, df uncapped
    capped = {r["term"]: (r["df"], r["postings"])
              for r in inverted_index(docs, max_postings=7).collect()}
    assert capped["alpha"] == (40, list(range(7)))
    assert capped["gamma"] == (20, list(range(1, 15, 2)))
    # min_df filters terms, not docs
    few = {r["term"] for r in inverted_index(docs, min_df=21).collect()}
    assert few == {"alpha"}


def test_scd2_intervals_runs_and_bounds(spark):
    from ahrd_spark.operators.sequences import scd2_intervals

    rows = [("u", 0, 1, "a"), ("u", 10, 2, "a"), ("u", 20, 3, "b"),
            ("u", 30, 4, "a"), ("v", 5, 5, None), ("v", 6, 6, None)]
    df = spark.createDataFrame(rows, "k string, t long, eid long, a string")
    out = scd2_intervals(df, ["k"], ["t", "eid"], "a").collect()
    got = {(r["k"], r["valid_from"]): (r["attr"], r["valid_to"],
                                       r["n_events"]) for r in out}
    assert got[("u", 0)] == ("a", 20, 2)     # run of two 'a's, closed by b
    assert got[("u", 20)] == ("b", 30, 1)
    assert got[("u", 30)] == ("a", None, 1)  # current run stays open
    # null attrs form a single run (null-safe change detection)
    assert got[("v", 5)] == (None, None, 2)
    assert len(got) == 4


def test_decayed_sum_half_life(spark):
    from ahrd_spark.operators.sequences import decayed_sum

    # last event at t=20: weights 0.5^(20/10)=0.25, 0.5^1=0.5, 1.0
    rows = [("u", 0, 4.0), ("u", 10, 2.0), ("u", 20, 3.0)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    r = decayed_sum(df, ["k"], "t", "v", half_life=10.0).collect()[0]
    assert r["n"] == 3 and r["last_ts"] == 20
    assert abs(r["decayed_value"] - (4.0 * 0.25 + 2.0 * 0.5 + 3.0)) < 1e-12


def test_ref_integrity_metrics(spark):
    from ahrd_spark.operators.profile import ref_integrity

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (None,)], "fk bigint"
    )
    parent = spark.createDataFrame([(1,), (2,), (2,)], "pk bigint")
    r = ref_integrity(child, parent, "fk", "pk").collect()[0]
    assert r["child_rows"] == 5
    assert r["orphan_rows"] == 1          # fk=9; NULL fk not an orphan
    assert r["null_fk_rows"] == 1
    assert r["parent_rows"] == 3
    assert r["dup_pk_values"] == 1 and r["dup_pk_rows"] == 2


def test_cooccurrence_projection_counts_and_cap(spark):
    from ahrd_spark.operators.graph import cooccurrence_projection

    rows = [("g1", "a"), ("g1", "b"), ("g1", "b"),   # dup membership
            ("g2", "a"), ("g2", "b"), ("g2", "c"),
            ("g3", "a"), ("g3", "b")]
    df = spark.createDataFrame(rows, "g string, i string")
    got = {(r["item_a"], r["item_b"]): r["n"]
           for r in cooccurrence_projection(df, "g", "i").collect()}
    assert got[("a", "b")] == 3
    assert got[("a", "c")] == 1 and got[("b", "c")] == 1
    # hub cap drops g2 (3 items) entirely
    capped = {(r["item_a"], r["item_b"]): r["n"]
              for r in cooccurrence_projection(
                  df, "g", "i", max_group_size=2).collect()}
    assert capped == {("a", "b"): 2}


def test_session_paths_gap_split(spark):
    from ahrd_spark.operators.sequences import session_paths

    rows = [("u", 0, 1, "v"), ("u", 10, 2, "c"),      # session 1: v>c
            ("u", 1000, 3, "v"), ("u", 1010, 4, "c"),  # session 2: v>c
            ("u", 5000, 5, "p"),                       # session 3: p
            ("w", 0, 6, "v"), ("w", 5, 7, "c")]        # w: v>c
    df = spark.createDataFrame(rows, "k string, t long, eid long, s string")
    got = {r["path"]: r["n_sessions"]
           for r in session_paths(df, ["k"], ["t", "eid"], "s",
                                  gap=100).collect()}
    assert got == {"v>c": 3, "p": 1}
    only_repeated = {r["path"] for r in session_paths(
        df, ["k"], ["t", "eid"], "s", gap=100, min_count=2).collect()}
    assert only_repeated == {"v>c"}


def test_interval_join_matches_naive_overlap(spark):
    from ahrd_spark.operators.rangejoin import interval_join

    a = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 5.0, 6.0), (3, 100.0, 101.0)],
        "id_a bigint, lo_a double, hi_a double",
    )
    b = spark.createDataFrame(
        [(10, 9.0, 12.0), (11, 5.5, 5.6), (12, 50.0, 60.0)],
        "id_b bigint, lo_b double, hi_b double",
    )
    got = {(r["id_a"], r["id_b"])
           for r in interval_join(a, b, bin_width=2.0).collect()}
    naive = {
        (ra["id_a"], rb["id_b"])
        for ra in a.collect() for rb in b.collect()
        if ra["lo_a"] <= rb["hi_b"] and rb["lo_b"] <= ra["hi_a"]
    }
    assert got == naive == {(1, 10), (1, 11), (2, 11)}
    # long overlapping intervals meet in many bins but emit ONE pair
    long_a = spark.createDataFrame([(1, 0.0, 100.0)],
                                   "id_a bigint, lo_a double, hi_a double")
    long_b = spark.createDataFrame([(2, 1.0, 99.0)],
                                   "id_b bigint, lo_b double, hi_b double")
    assert interval_join(long_a, long_b, bin_width=1.0).count() == 1


def test_stream_click_attribution_matches_batch(spark, tmp_path):
    from ahrd_spark.streaming.pipeline import stream_click_attribution

    clicks_rows = [
        (1, "2024-01-01 00:05:00", 101),   # 5 min after view 201 -> match
        (1, "2024-01-01 02:00:00", 102),   # too late for any view
        (2, "2024-01-01 00:01:00", 103),   # matches view 202
    ]
    views_rows = [
        (1, "2024-01-01 00:00:00", 201),
        (2, "2024-01-01 00:00:30", 202),
        (3, "2024-01-01 00:00:00", 203),   # user with no clicks
    ]

    def mk(rows):
        return spark.createDataFrame(
            rows, "user_id bigint, ts string, event_id bigint"
        ).withColumn("ts", F.to_timestamp("ts"))

    clicks_df, views_df = mk(clicks_rows), mk(views_rows)
    batch = {(r["click_id"], r["view_id"])
             for r in stream_click_attribution(clicks_df, views_df).collect()}
    assert batch == {(101, 201), (103, 202)}

    c_src, v_src = str(tmp_path / "c"), str(tmp_path / "v")
    sink, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    clicks_df.write.parquet(c_src)
    views_df.write.parquet(v_src)
    cs = spark.readStream.schema(clicks_df.schema).parquet(c_src)
    vs = spark.readStream.schema(views_df.schema).parquet(v_src)
    joined = stream_click_attribution(cs, vs)
    assert joined.isStreaming
    q = (
        joined.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not finish in 600s"
    streamed = {(r["click_id"], r["view_id"])
                for r in spark.read.parquet(sink).collect()}
    assert streamed == batch


def test_novelty_curve_counts_first_occurrences(spark):
    from ahrd_spark.operators.sequences import novelty_curve

    rows = [("u", 0, 1, "a"), ("u", 1, 2, "b"), ("u", 2, 3, "a"),
            ("u", 3, 4, "c"), ("v", 0, 5, "a")]
    df = spark.createDataFrame(rows, "k string, t long, eid long, s string")
    out = novelty_curve(df, ["k"], ["t", "eid"], "s").collect()
    got = {r["eid"]: (r["is_new"], r["distinct_so_far"]) for r in out}
    assert got[1] == (1, 1)
    assert got[2] == (1, 2)
    assert got[3] == (0, 2)   # repeat of 'a'
    assert got[4] == (1, 3)
    assert got[5] == (1, 1)   # keys independent


def test_pivot_counts_zero_fill(spark):
    from ahrd_spark.operators.events import pivot_counts

    rows = [("u", "a"), ("u", "a"), ("u", "b"), ("v", "b")]
    df = spark.createDataFrame(rows, "k string, t string")
    got = {r["k"]: (r["n_a"], r["n_b"], r["n_c"])
           for r in pivot_counts(df, ["k"], "t", ["a", "b", "c"]).collect()}
    assert got == {"u": (2, 1, 0), "v": (0, 1, 0)}


def test_group_quantiles_interpolation(spark):
    from ahrd_spark.operators.profile import group_quantiles

    df = spark.createDataFrame(
        [("g", float(v)) for v in (1, 2, 3, 4)], "k string, v double"
    )
    got = {r["q"]: r["quantile"]
           for r in group_quantiles(df, ["k"], "v", [0.5, 0.25]).collect()}
    assert got[0.5] == 2.5          # linear interpolation between 2 and 3
    assert got[0.25] == 1.75
    ap = group_quantiles(df, ["k"], "v", [0.5], approx=True).collect()[0]
    assert 2.0 <= ap["quantile"] <= 3.0


def test_rolling_zscore_guards_no_spread(spark):
    from ahrd_spark.operators.sequences import rolling_zscore

    rows = [("u", 0, 10.0), ("u", 5, 10.0), ("u", 8, 16.0),
            ("w", 0, 1.0)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = {(r["k"], r["t"]): r["z"]
           for r in rolling_zscore(df, ["k"], "t", "v", window=10).collect()}
    assert got[("u", 0)] is None            # single point: no stddev
    assert got[("u", 5)] is None            # two equal points: zero spread
    # window {10, 10, 16}: mean 12, std ~3.4641 -> z ~1.1547
    assert abs(got[("u", 8)] - 1.154701) < 1e-5
    assert got[("w", 0)] is None


def test_key_trend_recovers_line(spark):
    from ahrd_spark.operators.sequences import key_trend

    rows = [("u", float(x), 3.0 * x + 1.0) for x in range(5)]
    rows += [("c", 1.0, 7.0), ("c", 1.0, 9.0)]   # zero x-variance
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r["k"]: (r["slope"], r["intercept"], r["n"])
           for r in key_trend(df, ["k"], "x", "y").collect()}
    s, i, n = got["u"]
    assert abs(s - 3.0) < 1e-9 and abs(i - 1.0) < 1e-9 and n == 5
    assert got["c"][0] is None and got["c"][2] == 2


def test_kcore_fixpoint_beats_bounded_rounds(spark, tmp_path):
    from ahrd_spark.operators.graph import kcore, kcore_peel

    # chain c0-c1-...-c9 hanging off a triangle: bounded 3-round peel
    # still holds chain remnants; the fixpoint leaves ONLY the triangle
    chain = [(f"c{i}", f"c{i+1}") for i in range(9)]
    tri = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c0")]
    df = spark.createDataFrame(chain + tri, "src string, dst string")
    bounded = {r["node"] for r in kcore_peel(df, k=2, rounds=3).collect()}
    exact = {r["node"]: r["deg"] for r in kcore(df, k=2).collect()}
    assert set(exact) == {"a", "b", "c"}
    assert all(d >= 2 for d in exact.values())
    assert set(exact) < bounded          # bounded 3 rounds wasn't done
    # reliable-checkpoint mode reaches the same fixpoint
    via_dir = {r["node"] for r in kcore(
        df, k=2, checkpoint_dir=str(tmp_path / "ck")).collect()}
    assert via_dir == set(exact)
    # fully peeled graph -> empty core
    assert kcore(df, k=4).count() == 0


def test_winsorize_clips_to_group_band(spark):
    from ahrd_spark.operators.profile import winsorize

    rows = [("g", float(v)) for v in range(1, 11)] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = winsorize(df, ["k"], "v", lo_q=0.0, hi_q=0.5).collect()
    got = {r["v"]: (r["clipped"], r["was_clipped"]) for r in out}
    # median of {1..10, 1000} is 6.0: everything above clamps to it
    assert got[1000.0] == (6.0, 1)
    assert got[10.0] == (6.0, 1)
    assert got[3.0] == (3.0, 0)


def test_session_stats_rollup(spark):
    from ahrd_spark.operators.events import session_stats

    rows = [("u", 0, 1, "v"), ("u", 10, 2, "c"),
            ("u", 1000, 3, "v"),                 # second session: bounce
            ("w", 0, 4, "v")]
    df = spark.createDataFrame(rows, "k string, t long, eid long, s string")
    out = session_stats(df, ["k"], ["t", "eid"], "s", gap=100).collect()
    got = {(r["k"], r["session_start"]): (r["session_end"], r["duration"],
                                          r["n_events"], r["n_states"],
                                          r["bounce"]) for r in out}
    assert got[("u", 0)] == (10, 10, 2, 2, 0)
    assert got[("u", 1000)] == (1000, 0, 1, 1, 1)
    assert got[("w", 0)] == (0, 0, 1, 1, 1)


def test_active_users_window_sliding_distinct(spark):
    from ahrd_spark.operators.events import active_users_window

    rows = [("a", 0), ("a", 0), ("b", 0), ("a", 2)]
    df = spark.createDataFrame(rows, "k string, day bigint")
    out = {r["day"]: (r["dau"], r["wau"])
           for r in active_users_window(df, "k", "day",
                                        window_days=3).collect()}
    # day 0: a,b active; day 1: none active but both in trailing 3d;
    # day 2: a active, trailing window still covers day-0 activity
    assert out[0] == (2, 2)
    assert out[1] == (0, 2)
    assert out[2] == (1, 2)
    # days past the data end are clipped
    assert max(out) == 2


def test_degree_assortativity_star(spark):
    from ahrd_spark.operators.graph import degree_assortativity_profile

    # star: hub h(deg 3) with leaves x,y,z (deg 1) -> perfectly
    # dissortative: deg-1 nodes average neighbor deg 3 and vice versa
    df = spark.createDataFrame(
        [("h", "x"), ("h", "y"), ("h", "z")], "src string, dst string"
    )
    got = {r["deg"]: (r["avg_neighbor_deg"], r["n_nodes"])
           for r in degree_assortativity_profile(df).collect()}
    assert got[1] == (3.0, 3) and got[3] == (1.0, 1)


def test_predicate_symmetry_and_functionality(spark):
    from ahrd_spark.operators.graph import (
        predicate_functionality,
        predicate_symmetry,
    )

    triples = spark.createDataFrame(
        [("a", "knows", "b"), ("b", "knows", "a"), ("a", "knows", "c"),
         ("a", "born", "1990"), ("b", "born", "1991"),
         ("a", "likes", "x"), ("a", "likes", "y"),
         ("a", "knows", "b")],                       # duplicate assertion
        "subj string, pred string, obj string",
    )
    sym = {r["pred"]: (r["n"], r["n_sym"], r["sym_ratio"])
           for r in predicate_symmetry(triples).collect()}
    assert sym["knows"] == (3, 2, round(2 / 3, 6))   # dup collapsed
    assert sym["born"] == (2, 0, 0.0)
    fun = {r["pred"]: (r["n_subjects"], r["avg_objects"], r["max_objects"],
                       r["functional"])
           for r in predicate_functionality(triples).collect()}
    assert fun["born"] == (2, 1.0, 1, 1)
    assert fun["likes"] == (1, 2.0, 2, 0)
    assert fun["knows"] == (2, 1.5, 2, 0)


def test_group_mode_deterministic_ties(spark):
    from ahrd_spark.operators.profile import group_mode

    rows = [("u", "b"), ("u", "b"), ("u", "a"), ("u", "a"), ("u", "c"),
            ("v", "z")]
    df = spark.createDataFrame(rows, "k string, v string")
    got = {r["k"]: (r["mode_value"], r["n"])
           for r in group_mode(df, ["k"], "v").collect()}
    assert got["u"] == ("a", 2)   # tie a/b at 2 -> smallest value wins
    assert got["v"] == ("z", 1)


def test_wav_pcm_stats_on_synth_sine():
    import math
    import struct

    from ahrd_spark.operators.multimodal import wav_info, wav_pcm_stats

    sr, n = 8000, 8000  # 1 second
    samples = [int(32767 * 0.5 * math.sin(2 * math.pi * 440 * t / sr))
               for t in range(n)]
    data = b"".join(struct.pack("<h", s) for s in samples)
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    wav = hdr + data
    assert wav_info(wav) == {"channels": 1, "sample_rate": sr, "frames": n}
    s = wav_pcm_stats(wav)
    # 0.5-amplitude sine: rms = 0.5/sqrt(2), peak ~0.5, 1.0 s
    assert abs(s["rms"] - 0.5 / math.sqrt(2)) < 1e-3
    assert abs(s["peak"] - 0.5) < 1e-3
    assert abs(s["duration_s"] - 1.0) < 1e-9

    import pytest as _pytest
    with _pytest.raises(ValueError):
        wav_pcm_stats(b"RIFFxxxxWAVE")          # missing chunks
    with _pytest.raises(ValueError):
        wav_pcm_stats(b"nope")


def test_ppm_pixel_stats():
    import numpy as np

    from ahrd_spark.operators.multimodal import ppm_encode, ppm_pixel_stats

    # left half pure red, right half pure blue, 4x2
    arr = np.zeros((2, 4, 3), dtype=np.uint8)
    arr[:, :2, 0] = 255
    arr[:, 2:, 2] = 255
    s = ppm_pixel_stats(ppm_encode(arr))
    assert s["mean_r"] == 127.5 and s["mean_b"] == 127.5 and s["mean_g"] == 0
    # luma: half 0.299*255, half 0.114*255
    expect = 255 * (0.299 + 0.114) / 2
    assert abs(s["luma_mean"] - expect) < 1e-9
    assert s["luma_std"] > 0


def test_shard_assign_stable_and_balanced(spark):
    from ahrd_spark.operators.sampling import shard_assign

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = shard_assign(df, 8)
    counts = {r["shard"]: r["count"]
              for r in out.groupBy("shard").count().collect()}
    assert set(counts) == set(range(8))
    assert max(counts.values()) < 2 * min(counts.values())
    # pure function of the id: re-computation matches exactly
    a = {(r["doc_id"], r["shard"]) for r in out.collect()}
    b = {(r["doc_id"], r["shard"]) for r in shard_assign(df, 8).collect()}
    assert a == b


def test_mixture_materialize_is_nested_hash_sample(spark):
    from ahrd_spark.operators.corpus import mixture_plan
    from ahrd_spark.operators.sampling import mixture_materialize

    rows = [(i, "s0" if i % 2 == 0 else "s1", "tok " * 10)
            for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    # s0 wants ~40% of its tokens, s1 none
    plan = mixture_plan(docs, {"s0": 0.4, "s1": 0.0}, token_budget=2000)
    out = mixture_materialize(docs, plan)
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "s1" not in per
    assert 0 < per["s0"] < 500
    # nested-sample property: halving the budget yields a subset
    plan2 = mixture_plan(docs, {"s0": 0.4, "s1": 0.0}, token_budget=1000)
    ids2 = {r["doc_id"] for r in mixture_materialize(docs, plan2).collect()}
    ids1 = {r["doc_id"] for r in out.collect()}
    assert ids2 <= ids1


def test_fixed_histogram_clamps_tails(spark):
    from ahrd_spark.operators.profile import fixed_histogram

    rows = [(-5.0,), (0.0,), (9.9,), (10.0,), (25.0,), (999.0,), (None,)]
    df = spark.createDataFrame(rows, "v double")
    got = {r["bin"]: (r["bin_lo"], r["n"])
           for r in fixed_histogram(df, "v", lo=0.0, width=10.0,
                                    n_bins=3).collect()}
    # -5 clamps into bin 0; 25 in bin 2; 999 clamps into bin 2; NULL drops
    assert got[0] == (0.0, 3)
    assert got[1] == (10.0, 1)
    assert got[2] == (20.0, 2)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        fixed_histogram(df, "v", lo=0.0, width=0.0, n_bins=3)


def test_global_topk_plan_avoids_full_sort(spark):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["global_topk"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert len(rows) == 20
    prices = [r["price_r"] for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_cube_counts_all_grouping_sets(spark):
    from ahrd_spark.operators.events import cube_counts

    rows = [("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 4.0)]
    df = spark.createDataFrame(rows, "d1 string, d2 int, v double")
    got = {(r["d1"], r["d2"], r["g_d1"], r["g_d2"]): (r["n"], r["sum_value_r"])
           for r in cube_counts(df, ["d1", "d2"], value_col="v").collect()}
    assert got[(None, 1, 1, 0)] == (2, 5.0)      # d2 slice: CUBE-only cell
    assert got[("a", None, 0, 1)] == (2, 3.0)    # d1 slice
    assert got[(None, None, 1, 1)] == (3, 7.0)   # grand total
    assert got[("b", 1, 0, 0)] == (1, 4.0)
    assert len(got) == 3 + 2 + 2 + 1             # cells+d1s+d2s+total


def test_top_terms_expr_order_and_ties(spark):
    from ahrd_spark.operators.textstats import top_terms_expr

    df = spark.createDataFrame(
        [(1, "b b b a a c z z"), (2, ""), (3, "  x  ")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["t"] for r in df.select(
        "doc_id", top_terms_expr(F.col("text"), k=3).alias("t")).collect()}
    # b(3) first; a and z tie at 2 -> lexicographic a before z
    assert got[1] == ["b", "a", "z"]
    assert got[2] == []
    assert got[3] == ["x"]


def test_compression_ratio_separates_repetitive_text(spark):
    import zlib

    from ahrd_spark.operators.textstats import compression_ratio

    rows = [(1, "spam " * 400),                       # hyper-repetitive
            (2, "the quick brown fox jumps over the lazy dog. " * 40),
            (3, ""),                                   # empty -> NULL ratio
            (4, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert got[1]["ratio"] < 0.05                     # collapses
    assert got[1]["n_compressed"] == len(zlib.compress(
        ("spam " * 400).encode(), 6))                 # deterministic
    assert got[2]["ratio"] < 0.2
    assert got[1]["ratio"] < got[2]["ratio"]
    assert got[3]["ratio"] is None and got[3]["n_bytes"] == 0
    assert got[4]["ratio"] is None                    # NULL text == empty
    assert len(got) == 4


def test_geometric_mean_udaf_matches_codegen_identity(spark):
    from ahrd_spark.operators.profile import geometric_mean_udaf

    rows = [("g", 2.0), ("g", 8.0), ("g", -1.0),     # non-positive ignored
            ("h", 5.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    gmean = geometric_mean_udaf()
    got = {r["k"]: r["gm"] for r in
           df.groupBy("k").agg(gmean("v").alias("gm")).collect()}
    assert abs(got["g"] - 4.0) < 1e-12               # sqrt(2*8)
    assert abs(got["h"] - 5.0) < 1e-12               # exp(ln(5)) round-trip
    # parity with the codegen identity exp(avg(ln(x)))
    ref = {r["k"]: r["gm"] for r in
           df.filter(F.col("v") > 0).groupBy("k")
             .agg(F.exp(F.avg(F.log("v"))).alias("gm")).collect()}
    assert all(abs(got[k] - ref[k]) < 1e-12 for k in ref)


def test_mad_outliers_flags_robustly(spark):
    from ahrd_spark.operators.profile import mad_outliers

    # nine values near 10 plus one wild point: std-based z would be
    # dragged by the outlier; MAD flags it cleanly
    rows = [("g", float(v)) for v in (9, 9, 10, 10, 10, 10, 11, 11, 12)]
    rows.append(("g", 1000.0))
    df = spark.createDataFrame(rows, "k string, v double")
    out = {r["v"]: (r["is_outlier"], r["med"], r["mad"])
           for r in mad_outliers(df, ["k"], "v").collect()}
    assert out[1000.0][0] == 1
    assert all(flag == 0 for v, (flag, _, _) in out.items() if v != 1000.0)
    assert out[10.0][1] == 10.0 and out[10.0][2] == 1.0
    # constant group: MAD = 0 -> no flags, NULL z
    const = spark.createDataFrame([("c", 5.0)] * 4, "k string, v double")
    rows2 = mad_outliers(const, ["k"], "v").collect()
    assert all(r["is_outlier"] == 0 and r["mad_z"] is None for r in rows2)


def test_kcore_raises_when_max_rounds_too_small(spark):
    """kcore() promises the exact k-core; exiting via max_rounds before the
    fixpoint must raise instead of silently returning degree < k survivors
    (a path peels only 2 nodes per round, so long paths need many rounds)."""
    import pytest as _pytest

    from ahrd_spark.operators.graph import kcore

    path = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(8)], "src string, dst string"
    )
    with _pytest.raises(RuntimeError, match="max_rounds"):
        kcore(path, k=2, max_rounds=1)
    # with enough rounds the same input converges (to the empty 2-core)
    assert kcore(path, k=2).count() == 0


def test_blocking_quality_metrics(spark):
    from ahrd_spark.operators.dedup import blocking_quality

    cand = spark.createDataFrame(
        # unordered dupes + a self-pair that must be dropped
        [("1", "2"), ("2", "1"), ("3", "4"), ("5", "6"), ("7", "7")],
        "a STRING, b STRING",
    )
    gold = spark.createDataFrame(
        [("2", "1"), ("3", "4"), ("8", "9")], "a STRING, b STRING"
    )
    row = blocking_quality(cand, gold, n_records=10).collect()[0]
    assert (row.n_cand, row.n_gold, row.n_matched) == (3, 3, 2)
    assert row.pair_completeness_r == pytest.approx(2 / 3, abs=1e-6)
    assert row.pair_precision_r == pytest.approx(2 / 3, abs=1e-6)
    # 1 - 3/45
    assert row.reduction_ratio_r == pytest.approx(1 - 3 / 45, abs=1e-6)


def test_blocking_quality_no_n_records_null_rr(spark):
    from ahrd_spark.operators.dedup import blocking_quality

    cand = spark.createDataFrame([("1", "2")], "a STRING, b STRING")
    gold = spark.createDataFrame([("1", "2")], "a STRING, b STRING")
    row = blocking_quality(cand, gold).collect()[0]
    assert row.reduction_ratio_r is None
    assert row.pair_completeness_r == 1.0


def test_blocking_quality_empty_gold(spark):
    from ahrd_spark.operators.dedup import blocking_quality

    cand = spark.createDataFrame([("1", "2")], "a STRING, b STRING")
    gold = spark.createDataFrame([], "a STRING, b STRING")
    row = blocking_quality(cand, gold).collect()[0]
    assert row.n_gold == 0 and row.pair_completeness_r is None


def test_link_prediction_metrics_realistic_ties(spark):
    from ahrd_spark.operators.evaluation import link_prediction_metrics

    rows = [
        # q1: gold a ties with c at the top -> realistic rank 1.5
        ("q1", "a", 0.9, True),
        ("q1", "b", 0.8, False),
        ("q1", "c", 0.9, False),
        # q2: gold d behind e -> rank 2
        ("q2", "d", 0.5, True),
        ("q2", "e", 0.7, False),
        ("q2", "f", 0.3, False),
    ]
    df = spark.createDataFrame(
        rows, "query_id STRING, candidate STRING, score_r DOUBLE,"
        " is_gold BOOLEAN"
    )
    row = link_prediction_metrics(df).collect()[0]
    assert row.n_gold == 2
    assert row.mrr_r == pytest.approx((1 / 1.5 + 1 / 2) / 2, abs=1e-6)
    assert row.hits1_r == 0.0
    assert row.hits3_r == 1.0 and row.hits10_r == 1.0


def test_link_prediction_multiple_golds_per_query(spark):
    from ahrd_spark.operators.evaluation import link_prediction_metrics

    rows = [
        ("q", "a", 0.9, True),   # rank 1
        ("q", "b", 0.5, True),   # rank 2
        ("q", "c", 0.1, False),
    ]
    df = spark.createDataFrame(
        rows, "query_id STRING, candidate STRING, score_r DOUBLE,"
        " is_gold BOOLEAN"
    )
    row = link_prediction_metrics(df).collect()[0]
    assert row.n_gold == 2
    assert row.mrr_r == pytest.approx((1 + 0.5) / 2, abs=1e-6)


def test_calibration_bins_and_ece(spark):
    from ahrd_spark.operators.evaluation import calibration_bins

    rows = [(0.05, 0), (0.15, 0), (0.95, 1), (0.85, 1), (0.85, 0)]
    df = spark.createDataFrame(rows, "prob_r DOUBLE, label INT")
    got = {r.bin: (r.n, r.conf_r, r.acc_r, r.ece_r)
           for r in calibration_bins(df).collect()}
    assert got[0] == (1, 0.05, 0.0, pytest.approx(0.19, abs=1e-6))
    assert got[8][0] == 2 and got[8][2] == 0.5
    assert got[9] == (1, 0.95, 1.0, pytest.approx(0.19, abs=1e-6))


def test_calibration_top_bin_includes_prob_one(spark):
    from ahrd_spark.operators.evaluation import calibration_bins

    df = spark.createDataFrame([(1.0, 1)], "prob_r DOUBLE, label INT")
    rows = calibration_bins(df).collect()
    assert len(rows) == 1 and rows[0].bin == 9


def test_setsim_join_exact_vs_bruteforce(spark):
    import itertools

    from ahrd_spark.operators.dedup import setsim_join

    rows = [
        ("1", ["a", "b", "c", "d"]),
        ("2", ["a", "b", "c", "e"]),      # J(1,2)=3/5=0.6
        ("3", ["a", "b", "c", "d"]),      # J(1,3)=1.0
        ("4", ["x", "y"]),
        ("5", ["x", "y", "z"]),           # J(4,5)=2/3
        ("6", ["q"]),
        ("7", ["a", "a", "b", "c", "d"]),  # dup token: set == doc 1
    ]
    df = spark.createDataFrame(rows, "doc_id STRING, toks ARRAY<STRING>")
    for theta in (0.5, 0.6, 0.75, 1.0):
        got = {
            (r.id_a, r.id_b): r.jaccard_r
            for r in setsim_join(df, theta).collect()
        }
        want = {}
        sets = {i: set(t) for i, t in rows}
        for x, y in itertools.combinations(sorted(sets), 2):
            inter = len(sets[x] & sets[y])
            j = round(inter / len(sets[x] | sets[y]), 6)
            if j >= round(theta, 6):
                want[(x, y)] = j
        assert got == want, theta


def test_setsim_join_low_threshold_guard(spark):
    """t < 0.5 leaves the subquadratic prefix-filter regime: raise by
    default (the scale-killer guard), run with an explicit opt-in."""
    import pytest as _pytest

    from ahrd_spark.operators.dedup import setsim_join

    rows = [("1", ["a", "b"]), ("2", ["a", "c"])]  # J = 1/3
    df = spark.createDataFrame(rows, "doc_id STRING, toks ARRAY<STRING>")
    with _pytest.raises(ValueError, match="subquadratic"):
        setsim_join(df, 0.3)
    with _pytest.warns(RuntimeWarning, match="threshold regime"):
        got = {
            (r.id_a, r.id_b)
            for r in setsim_join(
                df, 0.3, allow_low_threshold=True
            ).collect()
        }
    assert got == {("1", "2")}


def test_setsim_join_ulp_safe_ceil(spark):
    from ahrd_spark.operators.dedup import setsim_join

    # 0.6 * 5 is 3.0000000000000004 in fp: a naive ceil would shrink the
    # prefix and silently drop qualifying pairs
    rows = [
        ("1", ["a", "b", "c", "d", "e"]),
        ("2", ["a", "b", "c", "d", "f"]),  # J = 4/6 = 0.666667 >= 0.6
    ]
    df = spark.createDataFrame(rows, "doc_id STRING, toks ARRAY<STRING>")
    got = {(r.id_a, r.id_b) for r in setsim_join(df, 0.6).collect()}
    assert got == {("1", "2")}
