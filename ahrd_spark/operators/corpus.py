"""Corpus-statistics operators for training-data curation: TF-IDF term
ranking, corpus-trained bigram LM quality scoring, and mixture planning.

These are the "decide what to train on" layer above the per-doc signals in
``textstats.py``: they need CORPUS aggregates (document frequency, n-gram
counts, per-source token totals) joined back to documents, so unlike the
textstats expressions they shuffle — every shuffle here is keyed by a
token/bigram/source value (key cardinality >> executor count) with map-side
partial aggregation, and the one genuinely skew-prone aggregate (document
frequency of web-scale stopwords) reuses the salted two-phase pattern from
``skew.py``.  No Python UDFs anywhere; DuckDB replays every formula.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ahrd_spark.operators.skew import salted_agg

# the dedup family's order-preserving whitespace tokenizer (NOT the AHRD T1
# tokenizer, which dedupes per doc and would flatten every tf to 1)
def _ws_tokens(text_col: str):
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt_buckets: int = 32,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document:

        (doc_id, term, tf, doc_freq, tfidf)

    tf        raw term count within the document (whitespace tokens),
    doc_freq  number of documents containing the term,
    tfidf     tf * (ln((N + 1) / (doc_freq + 1)) + 1)   (smoothed idf —
              the scikit-learn formulation, never divides by zero),
    ranked per doc by (tfidf DESC, term ASC) — fully deterministic.

    Scale shape: the tf aggregate is keyed by (doc, term) so a hot term
    never concentrates on one reducer; document frequency is the salted
    two-phase aggregate from skew.py; the tf->df join is keyed by term
    (hot-term buckets are exactly what AQE skew-join splits); the final
    top-k window partitions by doc — uniform by construction.  N (corpus
    size) rides in as a broadcast scalar via a literal-free cross join of a
    1-row aggregate, not a driver collect, so the plan stays a single job.
    """
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_ws_tokens(text_col)).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_counts = salted_agg(
        tf.select("term", "doc_id"),
        key="term",
        aggs=[F.count("*").alias("partial")],
        merge_aggs=[F.sum("partial").cast("bigint").alias("doc_freq")],
        salt_buckets=salt_buckets,
        salt_source="doc_id",
    )
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(df_counts, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * (
                F.log((F.col("n_docs") + 1.0) / (F.col("doc_freq") + 1.0))
                + 1.0
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "doc_freq", "tfidf")
    )


def bigram_lm_scores(
    docs: DataFrame,
    add_k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-trained bigram language-model score per document:

        (doc_id, n_bigrams, avg_logp)

    avg_logp = mean over the doc's bigram positions of
    ln P(w2 | w1) under add-k smoothing trained on the corpus itself:

        P(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k * V)

    with V the corpus unigram vocabulary size.  This is the cheap
    self-trained stand-in for the CCNet/KenLM perplexity quality filter:
    documents whose word transitions are unlike the corpus (boilerplate,
    gibberish, wrong-language) score low; ``avg_logp`` is directly
    thresholdable or feedable to stratified sampling.  Docs with fewer than
    2 tokens have no bigram positions -> n_bigrams 0, avg_logp NULL.

    Scale shape: two corpus-count aggregates (keys: bigram, unigram — both
    partial-aggregated map-side; the unigram count of a web-scale stopword
    is the classic hot key, but the per-doc stream aggregates by
    (doc, bigram) FIRST, so the hot join fan-in is bounded by distinct
    bigrams per doc, and AQE splits any residual hot bucket).  V rides in
    as a 1-row broadcast, never a driver value.
    """
    toks = _ws_tokens(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks"), F.size(toks).alias("n")
    )
    # bigram occurrences: explode start positions, index the carried array
    # (the shuffle-free shingling shape from dedup.minhash_signature)
    pos = F.explode(F.sequence(F.lit(1), F.greatest(F.col("n") - 1, F.lit(1))))
    occ = (
        base.filter(F.col("n") >= 2)
        .select("doc_id", "toks", pos.alias("pos"))
        .select(
            "doc_id",
            F.try_element_at("toks", F.col("pos")).alias("w1"),
            F.try_element_at("toks", F.col("pos") + 1).alias("w2"),
        )
    )
    doc_bi = occ.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("m"))

    uni = (
        docs.select(F.explode(_ws_tokens(text_col)).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    vocab = uni.agg(F.count("*").cast("double").alias("v"))
    bi = doc_bi.groupBy("w1", "w2").agg(F.sum("m").alias("c12"))

    logp = F.log(
        (F.col("c12") + F.lit(add_k))
        / (F.col("c1") + F.lit(add_k) * F.col("v"))
    )
    per_doc = (
        doc_bi.join(bi, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("bigint").alias("n_bigrams"),
            (F.sum(F.col("m") * logp) / F.sum("m")).alias("avg_logp"),
        )
    )
    # docs with < 2 tokens never reach `occ`; reattach them with NULL score
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0).cast("bigint")).alias("n_bigrams"),
            "avg_logp",
        )
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Adjacent-bigram pointwise mutual information over the corpus ->
    (w1, w2, pair_count, pmi): the classic collocation / phrase-mining
    signal (word2vec-style phrase detection) —

        pmi = ln( (c12 / B) / ((c1 / T) * (c2 / T)) )

    with c12 the bigram-position count, c1/c2 unigram-position counts,
    B/T the corpus bigram/unigram position totals.  High-PMI pairs are
    multi-word entities ("binding protein", "transcription factor") worth
    fusing into single mention tokens before linking; ``min_count``
    suppresses the unstable hapax tail.

    Scale shape: bigrams come from the shuffle-free position-explode
    shingling (no self-join); the three aggregates are keyed by bigram /
    unigram values with map-side partial agg; position totals ride 1-row
    broadcast frames.  The uni ⋈ bi join on a web-scale stopword w1 is
    fan-in-bounded by the distinct-bigram dictionary (AQE splits any
    residual hot bucket).  Same tokenizer as ``bigram_lm_scores``.
    """
    toks = _ws_tokens(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks"), F.size(toks).alias("n")
    )
    pos = F.explode(F.sequence(F.lit(1), F.greatest(F.col("n") - 1, F.lit(1))))
    occ = (
        base.filter(F.col("n") >= 2)
        .select("toks", pos.alias("pos"))
        .select(
            F.try_element_at("toks", F.col("pos")).alias("w1"),
            F.try_element_at("toks", F.col("pos") + 1).alias("w2"),
        )
    )
    bi = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    uni = (
        docs.select(F.explode(_ws_tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t_total = uni.agg(F.sum("c").cast("double").alias("t"))
    b_total = bi.agg(F.sum("pair_count").cast("double").alias("b"))
    return (
        bi.filter(F.col("pair_count") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(b_total))
        .select(
            "w1",
            "w2",
            "pair_count",
            F.log(
                (F.col("pair_count") / F.col("b"))
                / ((F.col("c1") / F.col("t")) * (F.col("c2") / F.col("t")))
            ).alias("pmi"),
        )
    )


def mixture_plan(
    docs: DataFrame,
    target_weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Training-mixture plan: per source, how much of it the target mixture
    wants and the deterministic sampling fraction that delivers it:

        (source, n_docs, n_tokens, target_tokens, sample_fraction, epochs)

    target_tokens   = target_weights[source] * token_budget
    epochs          = target_tokens / n_tokens  (>1 -> the source must be
                      repeated; the standard over-sampling signal)
    sample_fraction = min(epochs, 1.0) — feed it straight to
    ``sampling.stratified_sample`` (same allowlist semantics: sources
    absent from ``target_weights`` get weight 0 and fraction 0).

    One groupBy(source) — source cardinality is tiny, the aggregate is
    all map-side partials; the weight map is a literal, never a join.
    """
    wmap = F.create_map(
        *[F.lit(x) for kv in sorted(target_weights.items()) for x in kv]
    )
    per_source = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.when(F.trim(F.col(text_col)) == "", 0).otherwise(
                F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
            )
        ).cast("bigint").alias("n_tokens"),
    )
    target = F.coalesce(wmap[F.col("source")], F.lit(0.0)) * F.lit(
        float(token_budget)
    )
    epochs = target / F.col("n_tokens")
    return per_source.select(
        "source",
        "n_docs",
        "n_tokens",
        target.alias("target_tokens"),
        F.least(epochs, F.lit(1.0)).alias("sample_fraction"),
        epochs.alias("epochs"),
    )
