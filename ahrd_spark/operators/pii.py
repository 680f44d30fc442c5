"""PII scrubbing for training-data pipelines: detect + redact emails,
IPv4 addresses, and international-format phone numbers in a text column.

Single-pass native column expressions (regexp_count / regexp_replace inside
the scan's codegen stage — no shuffle, no UDFs), the only formulation that
survives a 100 TB corpus scan.  Patterns deliberately avoid lookarounds and
backreferences so the SAME pattern string runs identically on java.util.regex
(Spark) and RE2-based engines (DuckDB oracle, Go/Rust scanners a compliance
team might run independently).

Replacement tokens follow the common convention of typed placeholders
(``<EMAIL>``, ``<IP>``, ``<PHONE>``) so downstream tokenizers see a stable
vocabulary item instead of a hole.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# order matters: emails are redacted FIRST so the digits inside e.g.
# ``user123@host`` cannot be half-eaten by the phone pattern, and IPs before
# phones so dotted quads don't match the phone digit-run.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d ()-]{6,}\d", "<PHONE>"),
)


def pii_counts_expr(text: Column) -> list[Column]:
    """Per-category match counts (pre-redaction, on the raw text)."""
    return [
        F.regexp_count(text, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _tok in PII_PATTERNS
    ]


def redact_expr(text: Column) -> Column:
    """Serially replace every category's matches with its placeholder."""
    out = text
    for _name, pat, tok in PII_PATTERNS:
        out = F.regexp_replace(out, F.lit(pat), F.lit(tok))
    return out


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (doc_id, redacted, n_email, n_ip, n_phone, has_pii)."""
    text = F.col(text_col)
    counts = pii_counts_expr(text)
    return df.select(
        F.col(id_col).alias("doc_id"),
        redact_expr(text).alias("redacted"),
        *counts,
    ).withColumn(
        "has_pii",
        (F.col("n_email") + F.col("n_ip") + F.col("n_phone")) > 0,
    )
