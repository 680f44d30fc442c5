"""Bin-bucketed range join — match left rows whose scalar value falls in
``[lo, hi]`` of an interval table without a cartesian product.

Spark's optimizer turns a bare ``l.v BETWEEN r.lo AND r.hi`` predicate
into BroadcastNestedLoopJoin (every row against every interval) — fine
for a handful of intervals, catastrophic for millions.  The standard
distributed strategy, used here: discretize the value axis into
fixed-width bins, explode each interval over the bins it covers, and
equi-join on the bin id before applying the exact BETWEEN filter.  The
join is then an ordinary hash join keyed by (keys..., bin) — shuffle-
partitionable, AQE-skewable — and the exact predicate only sees
candidates from overlapping bins.

Choosing ``bin_width``: ~ the typical interval width.  Each interval
explodes into ``(hi - lo) / bin_width + 1`` rows, so giant intervals
against a tiny width inflate the build side; a huge width degrades
toward all-pairs within a bin.  Both failure modes are data-visible
(explosion factor = interval rows emitted / intervals) and the factor is
cheap to audit upstream.

``keys`` adds equality columns (per-entity ranges); ``how='left'`` keeps
unmatched left rows with NULL interval payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 1.0,
    keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """-> left columns + the matching interval's columns (one output row
    per (left row, overlapping interval) pair)."""
    if bin_width <= 0:
        raise ValueError("bin_width must be > 0")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    keys = keys or []
    w = float(bin_width)

    lb = left.withColumn(
        "_bin", F.floor(F.col(value_col) / F.lit(w)).cast("long")
    )
    ib = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(w)).cast("long"),
            )
        ),
    )
    cond = F.col(value_col).between(F.col(lo_col), F.col(hi_col))
    matched = lb.join(ib, keys + ["_bin"]).filter(cond).drop("_bin")
    if how == "inner":
        return matched
    # left join: reattach left rows with no overlapping interval
    probe = matched.select(*left.columns)
    missing = lb.drop("_bin").join(probe, left.columns, "left_anti")
    for c in intervals.columns:
        if c not in keys:
            missing = missing.withColumn(
                c, F.lit(None).cast(dict(intervals.dtypes)[c])
            )
    return matched.unionByName(missing)
