"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All are single-pass native column expressions over a text column — no
shuffle, no UDFs; they run inside the scan's codegen stage, which is the
only formulation that survives a 100 TB corpus scan.

The tokenizer is the engine's AHRD tokenizer (T1) so the whole stack shares
one tokenization semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ahrd_spark.functions.text import patternize_expr, tokenize_expr

# tiny built-in stopword lists for the n-gram/stopword language heuristic
LANG_STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "a", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "en", "que"],
}


def ws_token_count_expr(text: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count_expr(text: Column) -> Column:
    """BPE-ish subword-unit estimate: maximal word runs + each non-space
    punctuation character as its own unit (a cheap, deterministic proxy for
    tokenizer cost accounting over a corpus).  Formulated without regex
    lookarounds so the same expression runs on RE2-based engines."""
    word_runs = F.size(F.filter(F.split(text, r"\W+"), lambda p: p != ""))
    punct_chars = F.length(F.regexp_replace(text, r"[\w\s]", ""))
    return word_runs + punct_chars


def stopword_ratio_expr(tokens: Column, stopwords: list[str]) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    n = F.size(tokens)
    hits = F.size(F.array_intersect(tokens, sw))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def lang_id_expr(text: Column) -> Column:
    """Stopword-vote language heuristic -> language code (or 'und').
    Ties break alphabetically (deterministic)."""
    toks = tokenize_expr(text)
    scores = [
        (code, F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in sw]))))
        for code, sw in sorted(LANG_STOPWORDS.items())
    ]
    best = None
    best_code = F.lit("und")
    for code, score in scores:
        if best is None:
            best, best_code = score, F.when(score > 0, F.lit(code)).otherwise(F.lit("und"))
        else:
            cond = score > best
            best_code = F.when(cond, F.lit(code)).otherwise(best_code)
            best = F.when(cond, score).otherwise(best)
    return best_code


def quality_score_expr(text: Column) -> Column:
    """Document quality in [0,1]: combines length band, alpha ratio,
    punctuation density and mean word length band — the standard cheap
    pre-filter for web-scale corpora."""
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^\p{Punct}]", ""))
    n_words = ws_token_count_expr(text)
    mean_wl = F.when(n_words > 0, n_chars.cast("double") / n_words).otherwise(F.lit(0.0))
    len_score = F.when((n_chars >= 50) & (n_chars <= 20000), F.lit(1.0)).otherwise(
        F.lit(0.25)
    )
    alpha_ratio = F.when(n_chars > 0, n_alpha.cast("double") / n_chars).otherwise(
        F.lit(0.0)
    )
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(
        F.lit(0.0)
    )
    wl_score = F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return (
        F.lit(0.25) * len_score
        + F.lit(0.35) * alpha_ratio
        + F.lit(0.25) * (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0)))
        + F.lit(0.15) * wl_score
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_token_max_frac: float = 0.20,
    dup_bigram_max_frac: float = 0.20,
) -> DataFrame:
    """Gopher-style repetition / boilerplate signals, one row per document:

        (doc_id, n_tokens, n_distinct_tokens, top_token_frac,
         dup_token_frac, dup_bigram_frac, repetitive)

    ``top_token_frac``   most frequent token's share of all tokens,
    ``dup_token_frac``   1 - distinct/total tokens,
    ``dup_bigram_frac``  1 - distinct/total token bigrams,
    ``repetitive``       top_token_frac > ``top_token_max_frac`` OR
                         dup_bigram_frac > ``dup_bigram_max_frac``
    (thresholds follow the published Gopher repetition-filter defaults).

    Tokenization is the dedup family's order-preserving whitespace split
    (NOT the AHRD T1 tokenizer, which dedupes and would zero every signal).

    Scale shape: both signals are two-level hash aggregations —
    (doc, token) / (doc, bigram) partial-aggregate map-side, then one
    doc-keyed reduce — so a hot token never concentrates on one reducer
    (the first-level key includes the token).  No UDFs, no windows, no
    per-doc O(n^2) array lambdas (interpreted higher-order functions cost
    ~1 ms/doc; see dedup.minhash_signature's measurement note).
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"),
                     F.size(toks).alias("n"))

    tok_rows = base.select("doc_id", F.explode("toks").alias("tok"))
    tok_stats = (
        tok_rows.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_distinct_tokens"),
            F.max("c").alias("top_c"),
        )
    )

    # bigram occurrences: explode start positions, index the carried array
    # (codegen throughout — same formulation as dedup.minhash_signature)
    pos = F.explode(
        F.sequence(F.lit(1), F.greatest(F.col("n") - 1, F.lit(1)))
    )
    bigram = F.concat_ws(
        " ",
        F.try_element_at("toks", F.col("pos")),
        F.try_element_at("toks", F.col("pos") + 1),
    )
    bi_stats = (
        base.select("doc_id", pos.alias("pos"), "toks")
        .select("doc_id", bigram.alias("g"))
        .groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_bigrams"), F.count("*").alias("n_distinct_bigrams"))
    )

    top_frac = F.col("top_c").cast("double") / F.col("n_tokens")
    dup_tok = F.lit(1.0) - F.col("n_distinct_tokens").cast("double") / F.col("n_tokens")
    dup_bi = F.lit(1.0) - F.col("n_distinct_bigrams").cast("double") / F.col("n_bigrams")
    return (
        tok_stats.join(bi_stats, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct_tokens",
            F.round(top_frac, 6).alias("top_token_frac"),
            F.round(dup_tok, 6).alias("dup_token_frac"),
            F.round(dup_bi, 6).alias("dup_bigram_frac"),
            (
                (top_frac > top_token_max_frac)
                | (dup_bi > dup_bigram_max_frac)
            ).alias("repetitive"),
        )
    )


def corpus_profile(
    docs: DataFrame,
    text_col: str = "text",
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-language corpus length-distribution profile ->
    (lang, n_docs, mean_chars, chars_p50, chars_p90, chars_p99, toks_p90).

    The pre-training "what is in this corpus" dashboard: doc counts and
    char/token length percentiles per detected language drive mixture
    planning, truncation budgets, and outlier hunting.

    ``exact=True`` uses the exact interpolated percentile (sorts each
    group's values on one executor — fine for the bounded language-key
    cardinality here, and replayable by DuckDB ``quantile_cont``).  At
    100 TB per-group value lists no longer fit: pass ``exact=False`` for
    ``approx_percentile`` (t-digest-style sketch, mergeable map-side,
    bounded memory at any scale) — same schema, sketch-accurate values,
    not oracle-checked."""
    text = F.col(text_col)
    base = docs.select(
        lang_id_expr(text).alias("lang"),
        F.length(text).alias("n_chars"),
        ws_token_count_expr(text).alias("n_toks"),
    )

    if exact:
        def pct(c, p):
            return F.percentile(c, F.lit(p))
    else:
        def pct(c, p):
            return F.approx_percentile(c, F.lit(p), F.lit(accuracy)).cast(
                "double"
            )

    return base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("n_chars").alias("mean_chars"),
        pct(F.col("n_chars"), 0.5).alias("chars_p50"),
        pct(F.col("n_chars"), 0.9).alias("chars_p90"),
        pct(F.col("n_chars"), 0.99).alias("chars_p99"),
        pct(F.col("n_toks"), 0.9).alias("toks_p90"),
    )


def iqr_outliers(
    df: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    k: float = 1.5,
) -> DataFrame:
    """Tukey-fence outlier flags per group -> input columns +
    (q1, q3, is_outlier) with ``is_outlier = value < q1 - k*IQR or
    value > q3 + k*IQR`` — the standard cheap anomaly gate for corpus
    curation (freak-length documents, metric spikes per source).

    Exact interpolated quartiles per group (same DuckDB ``quantile_cont``
    replay and the same scale caveat as ``corpus_profile``: per-group
    exact percentiles sort on one executor — bounded group keys only; at
    unbounded scale switch the agg to ``approx_percentile``).  With no
    ``keys`` the 1-row global quartile frame broadcasts."""
    keys = keys or []
    value = F.col(value_col)
    stats = df.groupBy(*keys).agg(
        F.percentile(value, F.lit(0.25)).alias("q1"),
        F.percentile(value, F.lit(0.75)).alias("q3"),
    )
    joined = (
        df.join(stats, keys) if keys else df.crossJoin(F.broadcast(stats))
    )
    iqr = F.col("q3") - F.col("q1")
    return joined.withColumn(
        "is_outlier",
        (value < F.col("q1") - F.lit(k) * iqr)
        | (value > F.col("q3") + F.lit(k) * iqr),
    )


def fingerprint_expr(text: Column) -> Column:
    """Deterministic document fingerprint: md5 over the patternized
    (sorted-unique-token) form — T2 patternize lifted to documents; equal
    fingerprints <=> equal token sets (mod hash collisions)."""
    return F.md5(patternize_expr(tokenize_expr(text)))


def top_terms_expr(text, k: int = 3):
    """Per-document top-``k`` terms by in-document frequency, ties by
    term (ascending) -> ARRAY<STRING>, computed ENTIRELY with
    higher-order array functions — no explode, no shuffle: the whole
    per-doc ranking runs inside the row's projection, which is what
    keeps a 10^12-doc pass embarrassingly parallel.

    Formulation: distinct tokens -> (count, term) pairs -> array_sort by
    (-count, term) via a comparator encoded in the sort key (zero-padded
    count descending) -> slice -> strip keys.
    """
    from pyspark.sql import functions as F

    toks = F.split(F.lower(F.trim(text)), r"\s+")
    toks = F.filter(toks, lambda t: t != F.lit(""))
    uniq = F.array_distinct(toks)
    # key: (9999999999 - count) zero-padded, then the term -> lexicographic
    # sort of the key IS (count desc, term asc)
    keyed = F.transform(
        uniq,
        lambda u: F.concat(
            F.lpad(
                (F.lit(9999999999) - F.size(F.filter(toks, lambda t: t == u)))
                .cast("string"),
                10,
                "0",
            ),
            F.lit("\t"),
            u,
        ),
    )
    top = F.slice(F.array_sort(keyed), 1, k)
    return F.transform(top, lambda s: F.element_at(F.split(s, "\t"), 2))


def gopher_rules_expr(text):
    """Gopher-style document quality gate (the published heuristic
    bundle from the Gopher corpus paper, arXiv:2112.11446 Appendix A)
    -> STRUCT<n_words, mean_word_len, symbol_ratio, bullet_ratio,
    passes:int>.  A doc passes when: 50 <= words <= 100000, mean word
    length in [3, 10], symbol-to-word ratio (# or ellipsis) <= 0.1, and
    < 90% of lines start with a bullet.  Pure codegen expressions —
    the gate costs one projection at any corpus size."""
    from pyspark.sql import functions as F

    words = F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words)
    mean_len = F.when(
        n_words > 0,
        F.aggregate(
            words, F.lit(0).cast("double"),
            lambda acc, w: acc + F.length(w),
        ) / n_words,
    )
    n_symbols = (
        F.size(F.split(text, r"#", -1)) - 1
        + F.size(F.split(text, r"\.\.\.", -1)) - 1
    )
    symbol_ratio = F.when(n_words > 0, n_symbols / n_words)
    lines = F.split(text, r"\n", -1)
    n_lines = F.size(lines)
    n_bullets = F.size(
        F.filter(lines, lambda l: F.trim(l).startswith("-")
                 | F.trim(l).startswith("*"))
    )
    bullet_ratio = F.when(n_lines > 0, n_bullets / n_lines)
    passes = (
        (n_words >= 50) & (n_words <= 100_000)
        & mean_len.between(3.0, 10.0)
        & (symbol_ratio <= 0.1)
        & (bullet_ratio < 0.9)
    ).cast("int")
    return F.struct(
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_ratio"),
        F.coalesce(passes, F.lit(0)).alias("passes"),
    )


def compression_ratio(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-doc zlib compression ratio -> (id, n_bytes, n_compressed,
    ratio) — the classic redundancy gate (highly repetitive/boilerplate
    text compresses far below natural text's ~0.3-0.5; near-random
    payloads sit near 1.0).  zlib level 6, deterministic across runs.

    Arrow-batched ``mapInPandas`` (no per-row Python, no JVM round-trip
    of the text beyond the one Arrow transfer); the only non-codegen
    text op in the curation family, kept Python-side because no SQL
    engine exposes a deterministic compressor."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    schema = (
        f"{id_col} bigint, n_bytes int, n_compressed int, ratio double"
    )

    def batches(it):
        import zlib

        for pdf in it:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            nb = raw.str.len().astype("int32")
            nc = raw.map(lambda b: len(zlib.compress(b, 6))).astype("int32")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": nb,
                    "n_compressed": nc,
                    "ratio": (nc / nb.where(nb > 0)).astype("float64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(batches, schema)
