"""Backward as-of join — attach to each left row the most recent right row
(same key) with ``right_ts <= left_ts``.

The canonical temporal-enrichment operator (point-in-time feature lookup,
"state as of the event"): joining an event stream to the latest preceding
snapshot/quote/profile row.  Spark has no built-in as-of join; the
sort-merge formulation here is the standard distributed shape:

    union(left, right) -> one shuffle keyed by the join keys ->
    per-key time-ordered window -> last_value(right payload, ignorenulls)
    carried forward -> keep left rows.

ONE shuffle total (the window's partitionBy), no range-explosion join, no
per-row Python.  At 100 TB both sides co-partition on the key hash and the
window sort is per-key; a hot key (one user with millions of events) is a
single-partition sort — the documented skew caveat shared with every
window operator in the engine.

Tie semantics (cross-engine determinism): at equal timestamps the right
row sorts BEFORE the left row (so an exactly-simultaneous right row IS
matched — same as DuckDB ``ASOF JOIN``'s ``>=``), and multiple right rows
on the same (key, ts) resolve by ascending payload-struct order, i.e. the
LARGEST payload wins deterministically.  Feed a (key, ts)-unique right
side (pre-aggregate) when you need a specific tie rule.

``tolerance_s`` (seconds) nulls out matches older than
``left_ts - tolerance_s`` — pandas ``merge_asof(tolerance=...)``
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list[str] | None = None,
    prefix: str = "asof_",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Left as-of-backward join -> all left columns plus
    ``<prefix><right_ts>`` and ``<prefix><payload_col>`` for each payload
    column (NULL when no right row precedes the left row within
    tolerance)."""
    if payload_cols is None:
        payload_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    r_struct = F.struct(
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        r_struct.alias("_r"),
    )
    r_type = r.schema["_r"].dataType
    left_cols = list(left.columns)
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r_type).alias("_r"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_l"),
    )
    r = r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType))
    u = l.unionByName(r)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc(), F.col("_r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_r", ignorenulls=True).over(w)
    out = u.withColumn("_m", carried).filter(F.col("_is_left") == 1)
    if tolerance_s is not None:
        fresh = F.col("_m._rts").cast("double") >= (
            F.col("_ts").cast("double") - float(tolerance_s)
        )
        out = out.withColumn(
            "_m", F.when(fresh, F.col("_m")).otherwise(F.lit(None).cast(r_type))
        )
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left_cols],
        F.col("_m._rts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
