"""Portable 60-bit hash shared by every engine-replayable operator.

The first 60 bits of the md5 digest as a non-negative bigint is the ONE
hash construction used wherever another engine must replay the bucketing
(the DuckDB oracle gate today, any warehouse tomorrow): minhash shingle
values, deterministic sampling buckets, sequence-packing buckets, and the
classifier's feature buckets.  It lives here once — per-operator copies
of the expression would silently diverge the replayability guarantee the
moment one of them changed.

SQL replay: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex15(col: Column) -> Column:
    """The same 60-bit family as a 15-char lowercase-hex STRING (its
    lexicographic order IS the numeric order, the property the KMV
    sketch sorts by).  SQL replay: ``substr(md5(x), 1, 15)``."""
    return F.substring(F.md5(col), 1, 15)


def md5_prefix60(col: Column) -> Column:
    """First 60 bits of md5(col) as a non-negative BIGINT.  15 hex chars
    keep the value comfortably inside a signed 64-bit range, so the same
    number comes out of every engine's hex parse."""
    return F.conv(md5_hex15(col), 16, 10).cast("bigint")
