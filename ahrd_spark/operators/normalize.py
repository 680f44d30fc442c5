"""Text normalization & cleaning for web-scale corpus curation.

Three layers, cheapest first:

1. ``strip_controls_expr`` / ``collapse_ws_expr`` / ``clean_text_expr`` —
   native column expressions (JVM codegen, run inside the scan stage).
   Control-char stripping runs FIRST so the whitespace collapse can use an
   explicit ``[ \\t\\n\\f\\r]`` class that means the same thing in Java
   regex and RE2 (Java's ``\\s`` includes ``\\x0B``, RE2's does not — the
   control strip removes ``\\x0B`` before either engine sees it).
2. ``nfc_normalize`` — Unicode NFC composition via an Arrow-batched
   ``mapInPandas`` pass.  This is the one operator in the text stack with
   no JVM kernel (Spark SQL exposes no Unicode normalizer, and pyarrow
   16's ``utf8_normalize`` reorders but does NOT compose, verified:
   ``e + U+0301`` stays decomposed).  The batch body quick-checks
   ``unicodedata.is_normalized`` per value — a fast-path that makes the
   common all-ASCII / already-NFC corpus nearly free — and only calls the
   full normalizer on the rare decomposed string.
3. ``c4_line_filter`` — C4-style line-level boilerplate removal (Raffel et
   al. 2020, "Exploring the Limits of Transfer Learning", §2.2): keep only
   lines that (a) have >= ``min_line_words`` words, (b) end in terminal
   punctuation, and (c) contain no boilerplate phrase; reject whole
   documents containing ``{`` / ``lorem ipsum`` (code & filler tells).
   All native expressions — ``split`` + higher-order ``filter`` over the
   line array (line counts per document are small, so the interpreted-HOF
   cost noted in textstats.py does not bite here).

Scale shape: 1 and 3 are per-row map work with no shuffle — they pipeline
into whatever scan or checkpoint stage hosts them.  2 is also shuffle-free
(mapInPandas preserves partitioning) but crosses the JVM<->Python boundary;
place it once, early (before dedup/fingerprinting, which want canonical
bytes), not per-consumer.
"""

from __future__ import annotations

import unicodedata
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# C0 controls except \t \n \r (kept: meaningful whitespace), plus DEL.
_CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
# Explicit whitespace class — identical semantics in Java regex and RE2.
_WS_RUN = r"[ \t\n\f\r]+"

# C4 boilerplate phrases (lowercased substring match per line) and
# document-level reject tells, per the paper's published filter list.
C4_LINE_BLOCKLIST = ("javascript", "cookie", "terms of use", "privacy policy")
C4_DOC_REJECT_SUBSTRINGS = ("{", "lorem ipsum")
_TERMINAL_PUNCT = r"""[.!?"']$"""


def strip_controls_expr(text: Column) -> Column:
    """Remove C0 control characters (except tab/newline/CR) and DEL."""
    return F.regexp_replace(text, _CONTROL_CLASS, "")


def collapse_ws_expr(text: Column) -> Column:
    """Collapse whitespace runs to one space and trim the ends."""
    return F.trim(F.regexp_replace(text, _WS_RUN, " "))


def clean_text_expr(text: Column) -> Column:
    """Control strip, then whitespace collapse (order matters — see module
    docstring)."""
    return collapse_ws_expr(strip_controls_expr(text))


def nfc_normalize(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """Unicode-NFC-compose the given string columns (schema unchanged).

    Arrow-batched ``mapInPandas``; per-value ``unicodedata.is_normalized``
    quick-check fast-path (ASCII and already-composed text never pays the
    normalizer).  Shuffle-free: partitioning is preserved.
    """
    names = list(cols)
    for c in names:
        if c not in df.columns:
            raise ValueError(f"nfc_normalize: no column {c!r} in {df.columns}")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for c in names:
                vals = pdf[c].tolist()
                pdf[c] = [
                    v
                    if v is None
                    or not isinstance(v, str)
                    or unicodedata.is_normalized("NFC", v)
                    else unicodedata.normalize("NFC", v)
                    for v in vals
                ]
            yield pdf

    return df.mapInPandas(_batches, schema=df.schema)


def _line_ok_expr(line: Column, min_line_words: int,
                  blocklist: tuple[str, ...]) -> Column:
    t = F.trim(line)
    words = F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, _WS_RUN)))
    ok = (words >= F.lit(min_line_words)) & t.rlike(_TERMINAL_PUNCT)
    low = F.lower(t)
    for phrase in blocklist:
        ok = ok & ~low.contains(phrase)
    return ok


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 3,
    line_blocklist: tuple[str, ...] = C4_LINE_BLOCKLIST,
    doc_reject_substrings: tuple[str, ...] = C4_DOC_REJECT_SUBSTRINGS,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """C4-style line-level cleaning, one row per document:

        (doc_id, clean_text, n_lines, n_lines_kept, doc_rejected)

    ``clean_text``  the kept lines re-joined with ``\\n`` (empty string if
                    nothing survives or the document is rejected),
    ``doc_rejected``  TRUE when the document contains any of
                    ``doc_reject_substrings`` (case-insensitive) — C4 drops
                    these documents outright rather than line-filtering.

    ``keep_cols`` pass extra input columns through unchanged (so pipeline
    callers don't need a re-join to recover them).

    Pure per-row map work (split -> filter -> rejoin), no shuffle, no UDF.
    """
    lines = F.split(F.col(text_col), r"\n")
    kept = F.filter(
        lines, lambda l: _line_ok_expr(l, min_line_words, line_blocklist)
    )
    low = F.lower(F.col(text_col))
    rejected = F.lit(False)
    for s in doc_reject_substrings:
        rejected = rejected | low.contains(s)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(rejected, F.lit("")).otherwise(
            F.array_join(F.transform(kept, F.trim), "\n")
        ).alias("clean_text"),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.when(rejected, F.lit(0)).otherwise(F.size(kept))
        .cast("bigint").alias("n_lines_kept"),
        rejected.alias("doc_rejected"),
        *[F.col(c) for c in keep_cols],
    )
