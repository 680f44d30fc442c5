"""Semantic tests for the corpus-statistics operators (TF-IDF, bigram LM
quality, mixture planning) and cross-snapshot incremental dedup — the
invariants the DuckDB value-replay oracles can't express."""

import math

from pyspark.sql import functions as F

from ahrd_spark.operators.corpus import (
    bigram_lm_scores,
    mixture_plan,
    tfidf_top_terms,
)
from ahrd_spark.operators.dedup import incremental_novelty, minhash_signature


def test_tfidf_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple cherry"),
            (3, "banana banana banana date"),
        ],
        "doc_id bigint, text string",
    )
    rows = tfidf_top_terms(docs, k=2, salt_buckets=4).collect()
    got = {(r["doc_id"], r["term"]): (r["tf"], r["doc_freq"], r["tfidf"]) for r in rows}
    # hand math: N=3; idf(t) = ln(4/(df+1)) + 1
    idf = lambda df_: math.log(4.0 / (df_ + 1)) + 1  # noqa: E731
    assert got[(1, "apple")][0] == 2 and got[(1, "apple")][1] == 2
    assert abs(got[(1, "apple")][2] - 2 * idf(2)) < 1e-12
    assert abs(got[(3, "banana")][2] - 3 * idf(2)) < 1e-12
    # k=2: doc 1 has exactly 2 terms; rarer 'cherry' (df=1) outranks
    # 'apple' (df=2) in doc 2 on idf at equal tf
    d2 = sorted(
        [(t, v[2]) for (d, t), v in got.items() if d == 2],
        key=lambda x: -x[1],
    )
    assert d2[0][0] == "cherry"


def test_tfidf_rank_determinism_on_ties(spark):
    # equal tfidf -> term ASC breaks the tie, and k caps rows per doc
    docs = spark.createDataFrame(
        [(1, "zz aa"), (2, "zz aa")], "doc_id bigint, text string"
    )
    rows = tfidf_top_terms(docs, k=1, salt_buckets=2).collect()
    assert {(r["doc_id"], r["term"]) for r in rows} == {(1, "aa"), (2, "aa")}


def test_bigram_lm_scores_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat ran"),
            (3, "the cat sat"),
            (4, "xqj zzk"),
            (5, "single"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in bigram_lm_scores(docs, add_k=0.5).collect()}
    # <2 tokens -> no bigram positions, NULL score
    assert out[5]["n_bigrams"] == 0 and out[5]["avg_logp"] is None
    assert out[1]["n_bigrams"] == 2
    # corpus-frequent transitions score higher than a one-off rare pair
    assert out[1]["avg_logp"] > out[4]["avg_logp"]
    # identical docs score identically
    assert out[1]["avg_logp"] == out[3]["avg_logp"]
    # hand math for doc 4: V=7 distinct unigrams (the cat sat ran xqj zzk
    # single); c('xqj zzk')=1, c('xqj')=1
    expect = math.log((1 + 0.5) / (1 + 0.5 * 7))
    assert abs(out[4]["avg_logp"] - expect) < 1e-12


def test_mixture_plan_arithmetic(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c", "web"),
            (2, "d e", "web"),
            (3, "f g h i", "books"),
            (4, "j", "forum"),
        ],
        "doc_id bigint, text string, source string",
    )
    out = {
        r["source"]: r
        for r in mixture_plan(
            docs, {"web": 0.5, "books": 0.5}, token_budget=20
        ).collect()
    }
    assert out["web"]["n_tokens"] == 5 and out["books"]["n_tokens"] == 4
    # books wants 10 tokens but has 4 -> oversample (epochs 2.5), capped frac
    assert abs(out["books"]["epochs"] - 2.5) < 1e-12
    assert out["books"]["sample_fraction"] == 1.0
    # web wants 10 of 5 -> epochs 2.0; forum absent from weights -> 0
    assert abs(out["web"]["epochs"] - 2.0) < 1e-12
    assert out["forum"]["target_tokens"] == 0.0
    assert out["forum"]["sample_fraction"] == 0.0


def test_incremental_novelty(spark):
    corpus = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(3)],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon zeta"),  # exact dup
            (101, "totally different words entirely here now"),
        ],
        "doc_id bigint, text string",
    )
    sig = lambda d: minhash_signature(d, num_hashes=4)  # noqa: E731
    out = {
        r["doc_id"]: r["novel"]
        for r in incremental_novelty(
            sig(new), sig(corpus), bands=2, rows_per_band=2
        ).collect()
    }
    assert out == {100: False, 101: True}


def test_duplicate_spans_golden(spark):
    """Hand-checked span merge: a 4-gram passage shared by docs 1 and 2
    yields one merged span per doc covering exactly the shared region;
    doc 3 (internal repetition only, no cross-doc gram) is not flagged."""
    from ahrd_spark.operators.dedup import duplicate_spans

    shared = "the quick brown fox jumps"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} over one lazy dog"),       # tokens 1-5 shared
            (2, f"intro words here {shared} outro"),  # tokens 4-8 shared
            (3, "solo solo solo solo solo solo"),     # within-doc only
        ],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicate_spans(docs, k=4, min_docs=2).collect()
    }
    # k=4 windows inside the 5-token shared run: starts s and s+1 -> the
    # merged span covers the full 5 shared tokens, 2 windows each
    assert rows == {1: (1, 5, 2), 2: (4, 8, 2)}


def test_duplicate_spans_merges_adjacent_windows(spark):
    """Two disjoint shared passages separated by a unique token stay two
    spans; windows overlapping-or-adjacent collapse into one."""
    from ahrd_spark.operators.dedup import duplicate_spans

    a = "alpha beta gamma"
    b = "delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"{a} unique1 {b}"),
            (2, f"{a} unique2 {b}"),
        ],
        "doc_id bigint, text string",
    )
    out = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(docs, k=3, min_docs=2).collect()
    )
    # tokens: a=1-3, unique=4, b=5-7 -> two spans per doc, split at token 4
    assert out == [(1, 1, 3), (1, 5, 7), (2, 1, 3), (2, 5, 7)]


def test_remove_duplicate_spans_golden(spark):
    """Cleaned text drops exactly the shared passage; untouched docs keep
    their (normalized) token stream; an all-boilerplate doc empties."""
    from ahrd_spark.operators.dedup import remove_duplicate_spans

    shared = "the quick brown fox"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} went home today"),
            (2, f"{shared}"),                    # all boilerplate
            (3, "совершенно unique content here"),
        ],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(docs, k=4, min_docs=2).collect()
    }
    assert rows == {
        1: ("went home today", 7, 4),
        2: ("", 4, 4),
        3: ("совершенно unique content here", 4, 0),
    }


def test_bm25_golden(spark):
    from ahrd_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple cherry"),
            (3, "banana banana banana date"),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    queries = spark.createDataFrame(
        [(10, "apple banana"), (11, "cherry"), (12, "missing")],
        "query_id bigint, query string",
    )
    rows = bm25_topk(docs, queries, k=10, k1=1.2, b=0.75, salt_buckets=4).collect()
    got = {(r["query_id"], r["doc_id"]): (r["n_hit_terms"], r["score"]) for r in rows}

    # hand math: N=4 (empty doc counts), avgdl = (3+2+4+0)/4 = 2.25
    def idf(df_):
        return math.log(1.0 + (4.0 - df_ + 0.5) / (df_ + 0.5))

    def part(tf, df_, dl):
        return idf(df_) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 2.25))

    assert got[(10, 1)][0] == 2
    assert abs(got[(10, 1)][1] - (part(2, 2, 3) + part(1, 2, 3))) < 1e-12
    assert got[(10, 3)] == (1, got[(10, 3)][1])
    assert abs(got[(10, 3)][1] - part(3, 2, 4)) < 1e-12
    assert got[(11, 2)][0] == 1
    assert abs(got[(11, 2)][1] - part(1, 1, 2)) < 1e-12
    # unmatched query yields no rows; empty doc never appears
    assert not [k for k in got if k[0] == 12]
    assert not [k for k in got if k[1] == 4]
    # doc 1 (tf=2 apple + banana hit, shorter) outranks docs 2 and 3 for q10
    q10 = sorted([(d, s) for (q, d), (_, s) in got.items() if q == 10],
                 key=lambda x: -x[1])
    assert q10[0][0] == 1


def test_bm25_topk_cap_and_tie_determinism(spark):
    from ahrd_spark.operators.retrieval import bm25_topk

    # 5 identical docs -> identical scores; k=3 must keep lowest doc_ids
    docs = spark.createDataFrame(
        [(i, "alpha beta") for i in range(5)], "doc_id bigint, text string"
    )
    queries = spark.createDataFrame([(1, "alpha")], "query_id bigint, query string")
    rows = bm25_topk(docs, queries, k=3, salt_buckets=4).collect()
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 2]
    assert len({round(r["score"], 12) for r in rows}) == 1


def _ref_bpe(word_counts, n_merges):
    """Pure-Python Sennrich BPE reference: returns (merges, final_vocab)."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (l, r), pc = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, pc))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges, vocab


def test_bpe_matches_reference_sennrich(spark):
    from ahrd_spark.operators.bpe import learn_bpe_merges, segment_vocab

    # the classic example corpus (no end-of-word sentinel) plus a
    # same-char-run word to pin the greedy-run merge semantics
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaaa": 4}
    text = " ".join(w for w, c in sorted(counts.items()) for _ in range(c))
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")

    got = learn_bpe_merges(docs, n_merges=6)
    want, ref_vocab = _ref_bpe(counts, 6)
    assert got == want

    seg = {r["word"]: (r["n_pieces"], r["pieces"])
           for r in segment_vocab(docs, got).collect()}
    ref_seg = {"".join(s): s for s in ref_vocab}
    for w, (n, pieces) in seg.items():
        assert tuple(pieces.split("  ")) == ref_seg[w], w
        assert n == len(ref_seg[w])
    # the run word merged greedily: aaaa -> (aa, aa), never (aa, a, a)
    assert seg["aaaa"][1] == "aa  aa"


def test_bpe_matches_reference_random_corpora(spark):
    import random

    from ahrd_spark.operators.bpe import learn_bpe_merges

    rng = random.Random(7)
    for trial in range(3):
        words = {}
        for _ in range(30):
            w = "".join(rng.choice("abc") for _ in range(rng.randint(1, 7)))
            words[w] = words.get(w, 0) + rng.randint(1, 9)
        text = " ".join(w for w, c in sorted(words.items()) for _ in range(c))
        docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        got = learn_bpe_merges(docs, n_merges=5)
        want, _ = _ref_bpe(words, 5)
        assert got == want, (trial, got, want)


def test_bpe_batched_rounds(spark):
    from ahrd_spark.operators.bpe import learn_bpe_merges

    # disjoint top pairs: one batched round == three sequential rounds,
    # counts included
    text = " ".join(["ab"] * 9 + ["cd"] * 8 + ["ef"] * 7)
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    seq = learn_bpe_merges(docs, n_merges=3, batch_k=1)
    bat = learn_bpe_merges(docs, n_merges=3, batch_k=3)
    assert seq == bat == [(1, "a", "b", 9), (2, "c", "d", 8), (3, "e", "f", 7)]

    # documented divergence: a pair CREATED by a round-1 merge can only be
    # picked next round, so a disjoint lower-count pair jumps ahead of it
    text2 = " ".join(["abc"] * 10 + ["de"] * 9)
    docs2 = spark.createDataFrame([(1, text2)], "doc_id bigint, text string")
    assert learn_bpe_merges(docs2, n_merges=3, batch_k=1) == [
        (1, "a", "b", 10), (2, "ab", "c", 10), (3, "d", "e", 9)]
    assert learn_bpe_merges(docs2, n_merges=3, batch_k=2) == [
        (1, "a", "b", 10), (2, "d", "e", 9), (3, "ab", "c", 10)]


def test_bpe_segment_staged_chain_matches_unbatched(spark):
    from ahrd_spark.operators.bpe import learn_bpe_merges, segment_vocab

    text = " ".join(["newest"] * 6 + ["widest"] * 3 + ["low"] * 5)
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    merges = learn_bpe_merges(docs, n_merges=5)
    one = {tuple(r) for r in segment_vocab(docs, merges).collect()}
    staged = {tuple(r)
              for r in segment_vocab(docs, merges, exprs_per_stage=2).collect()}
    assert one == staged


def test_pmi_collocations_hand_golden(spark):
    import math

    from ahrd_spark.operators.corpus import pmi_collocations

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id bigint, text string"
    )
    # unigram positions: c(a)=3 c(b)=2 c(c)=1, T=6; bigrams: (a,b)x2 (a,c)x1, B=3
    rows = pmi_collocations(docs, min_count=2).collect()
    assert len(rows) == 1
    [r] = rows
    assert (r["w1"], r["w2"], r["pair_count"]) == ("a", "b", 2)
    want = math.log((2 / 3) / ((3 / 6) * (2 / 6)))  # ln 4
    assert abs(r["pmi"] - want) < 1e-12

    # min_count=1 exposes the hapax pair too
    got = {
        (r["w1"], r["w2"]): r["pmi"]
        for r in pmi_collocations(docs, min_count=1).collect()
    }
    assert abs(got[("a", "c")] - math.log((1 / 3) / ((3 / 6) * (1 / 6)))) < 1e-12


def test_pmi_collocations_short_docs_ignored(spark):
    from ahrd_spark.operators.corpus import pmi_collocations

    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "x y")], "doc_id bigint, text string"
    )
    rows = pmi_collocations(docs, min_count=1).collect()
    assert {(r["w1"], r["w2"]) for r in rows} == {("x", "y")}
