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


def ref_integrity(
    child: DataFrame,
    parent: DataFrame,
    fk_col: str,
    pk_col: str,
) -> DataFrame:
    """Cross-table census: one row of referential-integrity metrics for
    a child->parent relationship — (child_rows, orphan_rows,
    null_fk_rows, parent_rows, dup_pk_values, dup_pk_rows).

    ``orphan_rows`` counts child rows whose non-NULL foreign key misses
    every parent primary key (NULL fks are reported separately — SQL
    join semantics would silently orphan them); ``dup_pk_*`` report
    primary-key uniqueness violations on the parent.  Together with
    ``table_profile`` this is the pre-admission contract check a
    pipeline runs before trusting a delivered table pair.

    Scale shape: one anti-join on the key (AQE broadcasts a small
    parent) plus one pk-keyed count; the metric assembly cross-joins
    three SINGLE-ROW aggregates — a no-op at any scale.
    """
    fk = F.col(fk_col)
    child_stats = child.agg(
        F.count(F.lit(1)).alias("child_rows"),
        F.sum(fk.isNull().cast("bigint")).alias("null_fk_rows"),
    )
    orphans = (
        child.filter(fk.isNotNull())
        .join(parent, fk == F.col(pk_col), "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_rows"))
    )
    pk_counts = parent.groupBy(pk_col).agg(F.count(F.lit(1)).alias("c"))
    parent_stats = pk_counts.agg(
        F.sum("c").alias("parent_rows"),
        F.sum((F.col("c") > 1).cast("bigint")).alias("dup_pk_values"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
        .alias("dup_pk_rows"),
    )
    return (
        child_stats.crossJoin(orphans)
        .crossJoin(parent_stats)
        .select(
            "child_rows", "orphan_rows", "null_fk_rows",
            "parent_rows", "dup_pk_values", "dup_pk_rows",
        )
    )


__all__ = [
    "table_profile", "ref_integrity", "group_quantiles", "winsorize",
    "group_mode", "fixed_histogram", "geometric_mean_udaf", "mad_outliers",
]


def group_quantiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    qs: list[float],
    approx: bool = False,
) -> DataFrame:
    """Per-group quantiles -> one row per (group, q): key columns +
    (q, quantile) using linear interpolation (SQL ``percentile_cont``
    semantics, engine-portable).

    ``approx=False`` is exact: Spark's ``percentile`` buffers each
    group's values on its reducer — right for bounded groups (segments,
    languages, shards), wrong for billion-row groups.  ``approx=True``
    switches to ``approx_percentile`` (t-digest-style sketch, bounded
    memory, map-side mergeable) — the 100 TB path, at the price of
    engine-specific results the oracle can't replay.
    """
    fn = F.approx_percentile if approx else F.percentile
    arr = fn(F.col(value_col), F.array(*[F.lit(q) for q in qs]))
    wide = df.groupBy(*key_cols).agg(arr.alias("_qv"))
    pairs = F.arrays_zip(
        F.array(*[F.lit(q).cast("double") for q in qs]).alias("q"),
        F.col("_qv").alias("quantile"),
    )
    return wide.select(
        *key_cols, F.explode(pairs).alias("p")
    ).select(*key_cols, F.col("p.q").alias("q"),
             F.col("p.quantile").alias("quantile"))


def winsorize(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    approx: bool = False,
) -> DataFrame:
    """Per-group winsorization -> input columns plus ``clipped`` (the
    value clamped to the group's [lo_q, hi_q] quantile band) and
    ``was_clipped`` — the standard outlier treatment before averaging
    noisy per-doc stats into corpus metrics (one crawler bug otherwise
    moves the mean arbitrarily; clipping bounds any single row's
    influence).

    Two jobs by design: a small per-group quantile aggregate (exact or
    sketch via ``approx``, see :func:`group_quantiles`) joined back onto
    the data — group count sizes the join's build side, so AQE
    broadcasts it for any realistic group cardinality.
    """
    bounds = group_quantiles(
        df, key_cols, value_col, [lo_q, hi_q], approx=approx
    )
    lo = bounds.filter(F.col("q") == lo_q).select(
        *key_cols, F.col("quantile").alias("_lo")
    )
    hi = bounds.filter(F.col("q") == hi_q).select(
        *key_cols, F.col("quantile").alias("_hi")
    )
    v = F.col(value_col)
    clipped = F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    return (
        df.join(lo, key_cols)
        .join(hi, key_cols)
        .withColumn("clipped", clipped)
        .withColumn("was_clipped", (clipped != v).cast("int"))
        .drop("_lo", "_hi")
    )


def group_mode(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Per-group mode -> key columns + (mode_value, n): the group's most
    frequent value, ties broken by smallest value so the result is
    deterministic in every engine (the SQL ``mode()`` aggregate leaves
    ties implementation-defined — unusable under cross-engine replay).

    Scale shape: one (key, value)-keyed count with map-side partials,
    then a key-keyed argmax window over the (small) distinct-value
    counts — the window input is one row per distinct value, not per
    input row.
    """
    from pyspark.sql import Window

    counts = df.groupBy(*key_cols, value_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("n").desc(), F.col(value_col).asc()
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *key_cols, F.col(value_col).alias("mode_value"), "n"
        )
    )


def fixed_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    width: float,
    n_bins: int,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-width histogram -> (key columns..., bin, bin_lo, n): counts
    per ``[lo + i*width, lo + (i+1)*width)`` bucket, with underflow
    clamped to bin 0 and overflow to bin ``n_bins - 1`` (edge buckets
    absorb the tails, so the bin count — and the output size — is fixed
    no matter what garbage arrives).  NULL values are dropped.

    One aggregation with map-side partials; output is ``n_bins`` rows
    per key.  Fixed-width beats quantile bins when histograms must be
    MERGEABLE across shards/days — identical bin edges everywhere.
    """
    if width <= 0 or n_bins < 1:
        raise ValueError("width must be > 0 and n_bins >= 1")
    keys = key_cols or []
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    b = F.least(
        F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)
    ).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "bin_lo",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6),
        )
        .select(*keys, "bin", "bin_lo", "n")
    )


def geometric_mean_udaf():
    """Arrow-vectorized grouped aggregation (``pandas_udf`` GROUPED_AGG)
    computing the geometric mean of positive values — the remaining
    sanctioned Python surface after mapInPandas (codecs/scorers) and
    applyInPandasWithState (streaming): partial batches stream through
    as NumPy arrays, never Python rows.

    For plain geometric means PREFER the codegen identity
    ``exp(avg(ln(x)))`` (which the oracle uses); this UDAF exists as the
    template for aggregates that genuinely need NumPy/SciPy bodies.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _gmean(v):
        x = v.to_numpy(dtype="float64")
        x = x[x > 0]
        if x.size == 0:
            return float("nan")
        return float(np.exp(np.mean(np.log(x))))

    # real annotation objects (the module's `from __future__ import
    # annotations` stringizes inline hints, which pandas_udf can't
    # resolve from its own scope)
    _gmean.__annotations__ = {"v": pd.Series, "return": float}
    return pandas_udf(_gmean, "double")


def mad_outliers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    k: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier flags via median absolute deviation ->
    input columns + (med, mad, mad_z, is_outlier).  ``mad_z`` is the
    0.6745-scaled modified z-score (Iglewicz-Hoaglin); rows with
    ``|mad_z| > k`` flag.  MAD survives what wrecks mean/std outlier
    rules (one gigantic value inflates std enough to hide itself) and
    complements the Tukey-fence IQR operator with a tighter robust
    scale.  NULL ``mad_z`` when MAD is 0 (constant-majority groups) —
    guarded division, no engine-specific x/0.

    Two grouped percentile passes joined back on the key (AQE
    broadcasts the group-level frames); exact medians buffer per group
    — same bounded-groups contract as :func:`group_quantiles`.
    """
    med = df.groupBy(*key_cols).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("med")
    )
    dev = df.join(med, key_cols).withColumn(
        "_ad", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(*key_cols).agg(
        F.percentile(F.col("_ad"), F.lit(0.5)).alias("mad")
    )
    z = F.when(
        F.col("mad") > 0,
        F.lit(0.6745) * (F.col(value_col) - F.col("med")) / F.col("mad"),
    )
    return (
        dev.join(mad, key_cols)
        .withColumn("mad_z", z)
        .withColumn(
            "is_outlier",
            F.coalesce(F.abs(F.col("mad_z")) > F.lit(k), F.lit(False))
            .cast("int"),
        )
        .drop("_ad")
    )
