"""Full-text retrieval over the corpus: BM25 ranked search.

The keyword-search counterpart to the embedding ANN family in
``similarity.py`` — a training-data pipeline needs both (e.g. targeted
corpus probes, "find documents about X" curation passes, retrieval-based
decontamination).  Like the rest of the corpus layer this is pure
relational Spark: the posting-list build is the same (doc, term) tf
aggregate TF-IDF uses, document frequency is the salted two-phase
aggregate from ``skew.py``, and the query side is dictionary-sized and
broadcast.  No Python UDFs; DuckDB replays the whole formula.

Reference framing: the reference engine (groupschoof/AHRD) ranks
candidate descriptions per protein with a lexical token-overlap score
(DescriptionScoreCalculator.java); BM25 is the corpus-level
generalization of that idea — rank *documents* for a *query* by shared
informative tokens — so it slots naturally beside the AHRD scoring core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ahrd_spark.operators.corpus import _ws_tokens
from ahrd_spark.operators.skew import salted_agg


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query",
    salt_buckets: int = 32,
) -> DataFrame:
    """Top-``k`` documents per query under BM25:

        (query_id, doc_id, n_hit_terms, score)

    score(q, d) = sum over DISTINCT query terms t present in d of

        idf(t) * tf(t,d) * (k1 + 1)
        ------------------------------------------
        tf(t,d) + k1 * (1 - b + b * dl(d) / avgdl)

    with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)) — the Lucene
    "plus one" variant, strictly positive so a stopword can never
    subtract relevance.  Ties rank deterministically by (score DESC,
    doc_id ASC).  Documents matching no query term are absent (score 0).

    Scale shape (100 TB corpus, dictionary-sized query set): tf is keyed
    by (doc, term) — a hot term never concentrates; df is the salted
    two-phase aggregate; N and avgdl ride in as a broadcast 1-row
    aggregate (no driver collect); the query-terms frame is tiny and
    broadcast into the posting join, so the only full shuffles are the
    tf groupBy and the final per-(query, doc) sum — both uniformly keyed.
    The top-k window partitions by query over an already score-reduced
    frame (rows <= matched docs x queries, not postings).
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
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("double").alias("dl"))
    df_counts = salted_agg(
        tf.select("term", "doc_id"),
        key="term",
        aggs=[F.count("*").alias("partial")],
        merge_aggs=[F.sum("partial").cast("double").alias("df")],
        salt_buckets=salt_buckets,
        salt_source="doc_id",
    )
    # N over ALL docs (token-less docs still count toward idf), avgdl over
    # tokenized length — one broadcast row, no driver round-trip
    stats = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(dl, "doc_id", "left")
        .agg(
            F.count("*").cast("double").alias("n_docs"),
            F.avg(F.coalesce("dl", F.lit(0.0))).alias("avgdl"),
        )
    )
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(_ws_tokens(query_text_col)).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    # query side is dictionary-sized by contract, and df restricted to
    # query terms inherits that bound -> explicit broadcast is safe
    # (see test_no_broadcast_hint_on_data_sized_frames allowance)
    q_df = df_counts.join(qterms.select("term").distinct(), "term")
    matched = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(q_df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    contrib = matched.withColumn(
        "contrib",
        F.log1p((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * (F.col("tf") * (k1 + 1.0))
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        ),
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.count("*").cast("bigint").alias("n_hit_terms"),
        F.sum("contrib").alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "doc_id", "n_hit_terms", "score")
    )


def rrf_fuse(
    rankings: DataFrame,
    k: int = 60,
    topn: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of N retrievers' ranked lists ->
    (query_id, doc_id, n_retrievers, rrf_score, rrf_rank).

    Input: one row per (retriever, query_id, doc_id, rank) with 1-based
    per-retriever ranks; ``rrf_score = sum over retrievers of
    1 / (k + rank)`` (Cormack et al. 2009) — the standard way to combine
    a lexical (BM25) and a semantic (ANN cosine) retriever without score
    calibration, since only RANKS enter the formula.  Ties order by
    (rrf_score DESC, doc_id ASC); ``topn`` truncates per query.

    Scale shape: one (query, doc)-keyed partial agg + one per-query
    window — both keyed by query hash; the candidate universe is already
    top-k-bounded per retriever, so the fused frame is
    |queries| * k * n_retrievers at worst, never corpus-sized.
    """
    fused = rankings.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).alias("n_retrievers"),
        F.sum(F.lit(1.0) / (F.lit(k) + F.col("rank"))).alias("rrf_score"),
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    out = fused.withColumn("rrf_rank", F.row_number().over(win))
    if topn is not None:
        out = out.filter(F.col("rrf_rank") <= topn)
    return out


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_postings: int | None = None,
) -> DataFrame:
    """Distributed inverted-index build -> (term, df, postings):
    per-term document frequency and the sorted posting list of document
    ids, the core artifact behind every lexical retrieval system (the
    batch analog of what ``bm25_topk`` computes on the fly).

    ``min_df`` drops hapax noise; ``max_postings`` caps each posting
    array at the first N ids (ascending) — the stopword guard: at corpus
    scale a term appearing in half the documents would otherwise build a
    single multi-billion-element array on one reducer.  ``df`` always
    counts ALL matching documents, so a capped list is detectable as
    ``df > len(postings)``.

    Scale shape: one explode of per-doc DISTINCT tokens (tokenize_expr
    dedupes, so the shuffle carries doc-frequency rows, not term
    frequency).  Uncapped, the build is one term-keyed aggregation and
    the collect_list is exact but reducer-heavy (a hot term lands on one
    task).  With ``max_postings`` the build goes two-phase salted: each
    (term, doc%S) bucket keeps only its N smallest ids, then the S
    partial lists merge and re-cap — identical output to global
    sort+slice (the global N smallest are the N smallest of the salted
    minima), but no reducer ever holds more than S*N ids of a hot term,
    and ``df`` arrives as a sum of salted partial counts.
    """
    from ahrd_spark.functions.text import tokenize_expr

    pairs = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(tokenize_expr(F.col(text_col))).alias("term"),
    )
    if max_postings is None:
        grouped = pairs.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(F.collect_list("doc")).alias("postings"),
        )
        return grouped.filter(F.col("df") >= min_df)
    salt_buckets = 16
    # hash-salt works for any id type; the salt is intermediate-only, so
    # Spark's non-portable hash() never reaches an oracle-compared value
    part = pairs.groupBy(
        "term", F.pmod(F.hash("doc"), F.lit(salt_buckets)).alias("_salt")
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.slice(
            F.sort_array(F.collect_list("doc")), 1, max_postings
        ).alias("p"),
    )
    grouped = part.groupBy("term").agg(
        F.sum("c").alias("df"),
        F.slice(
            F.sort_array(F.flatten(F.collect_list("p"))), 1, max_postings
        ).alias("postings"),
    )
    return grouped.filter(F.col("df") >= min_df)
