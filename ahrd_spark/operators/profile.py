"""One-pass per-column table profiling (the data-quality census).

Before a 100 TB table is admitted into a training mixture you profile
it: null fractions, cardinalities, and value ranges per column catch
schema drift, broken upstream extractors (a suddenly-constant column),
and unit regressions (a max that jumped 1000x) without reading the data
twice.

Scale shape: ONE aggregation job.  With ``approx=False`` the exact
``count_distinct`` per column makes Catalyst plan an Expand (one input
replica per distinct-aggregate) — exact but k-times the scan width, the
right trade at test scale.  With ``approx=True`` every distinct count is
an ``approx_count_distinct`` HLL sketch, keeping the plan a single
partial+final hash aggregate with no Expand — the 100 TB path (sketches
merge associatively, so map-side partials do almost all the work).
Min/max/null counts are plain partial aggregates either way.  The final
explode runs on the one-row aggregate result, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {
    "tinyint", "smallint", "int", "bigint", "float", "double", "decimal"
}


def table_profile(df: DataFrame, approx: bool = False) -> DataFrame:
    """-> one row per column: (col_name, nulls, n_distinct, min_num,
    max_num, min_str, max_str).

    ``min_num``/``max_num`` are populated for numeric columns (cast to
    double, 6 dp) and timestamps (exact integer epoch-microseconds);
    ``min_str``/``max_str`` for strings (binary collation).  Other types
    (arrays, structs, binary) report only nulls + distinct counts.
    """
    aggs: list = []
    structs: list = []
    for name, dtype in df.dtypes:
        c = F.col(name)
        base = dtype.split("(")[0]
        aggs.append(F.sum(c.isNull().cast("bigint")).alias(f"{name}__nulls"))
        dcnt = (
            F.approx_count_distinct(c) if approx else F.count_distinct(c)
        )
        aggs.append(dcnt.alias(f"{name}__distinct"))
        if base in ("timestamp", "timestamp_ntz"):
            num = F.unix_micros(c.cast("timestamp")).cast("double")
        elif base in _NUMERIC:
            num = c.cast("double")
        else:
            num = None
        if num is not None:
            aggs.append(F.round(F.min(num), 6).alias(f"{name}__min_num"))
            aggs.append(F.round(F.max(num), 6).alias(f"{name}__max_num"))
        if base == "string":
            aggs.append(F.min(c).alias(f"{name}__min_str"))
            aggs.append(F.max(c).alias(f"{name}__max_str"))
        null_d = F.lit(None).cast("double")
        null_s = F.lit(None).cast("string")
        structs.append(
            F.struct(
                F.lit(name).alias("col_name"),
                F.col(f"{name}__nulls").alias("nulls"),
                F.col(f"{name}__distinct").alias("n_distinct"),
                (F.col(f"{name}__min_num") if num is not None else null_d)
                .alias("min_num"),
                (F.col(f"{name}__max_num") if num is not None else null_d)
                .alias("max_num"),
                (F.col(f"{name}__min_str") if base == "string" else null_s)
                .alias("min_str"),
                (F.col(f"{name}__max_str") if base == "string" else null_s)
                .alias("max_str"),
            )
        )
    row = df.agg(*aggs)
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


__all__ = ["table_profile"]
