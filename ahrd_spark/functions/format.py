"""Output formatting — number formatting and the AHRD quality code.

Parity:
- T6 number format   AbstractOutputWriter.java:22-33 (DecimalFormat
  "#,###0.###", NaN/Infinity -> literal "NA")
- B2 quality code    AbstractOutputWriter.java:94-108 (the CODE, which
  disagrees with README.textile:167-170 — code wins)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def format_number_expr(col: Column) -> Column:
    """Format a double like Java's DecimalFormat("#,###0.###"): grouping
    separators, up to 3 fractional digits (half-even), no trailing zeros;
    NaN/Infinity -> "NA"."""
    rounded = F.round(col, 3)
    s = F.format_number(rounded, 3)
    # strip trailing zeros then a trailing dot: 1.500 -> 1.5, 2.000 -> 2
    s = F.regexp_replace(s, r"0+$", "")
    s = F.regexp_replace(s, r"\.$", "")
    return (
        F.when(F.isnan(col) | (F.abs(col) == F.lit(float("inf"))), F.lit("NA"))
        .otherwise(s)
    )


def quality_code_expr(
    bit_score: Column,
    e_value: Column,
    overlap_score: Column,
    description_high_score: Column,
) -> Column:
    """3-char quality code of the winning hit:
    pos1 '*' iff bitScore > 50 and eValue < 0.1
    pos2 '*' iff overlapScore > 0.6
    pos3 '*' iff descriptionHighScore >= 0.5
    """
    star = lambda c: F.when(c, F.lit("*")).otherwise(F.lit("-"))  # noqa: E731
    return F.concat(
        star((bit_score > 50.0) & (e_value < 0.1)),
        star(overlap_score > 0.6),
        star(description_high_score >= 0.5),
    )
