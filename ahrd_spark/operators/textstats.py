"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All are single-pass native column expressions over a text column — no
shuffle, no UDFs; they run inside the scan's codegen stage, which is the
only formulation that survives a 100 TB corpus scan.

The tokenizer is the engine's AHRD tokenizer (T1) so the whole stack shares
one tokenization semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
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


def fingerprint_expr(text: Column) -> Column:
    """Deterministic document fingerprint: md5 over the patternized
    (sorted-unique-token) form — T2 patternize lifted to documents; equal
    fingerprints <=> equal token sets (mod hash collisions)."""
    return F.md5(patternize_expr(tokenize_expr(text)))
