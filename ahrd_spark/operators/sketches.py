"""Deterministic, engine-replayable sketches for corpus profiling.

At 100 TB the profiling questions ("how many distinct canonical entities
per predicate?", "how often does this descriptor token occur?") cannot
afford an exact global pass per question; production engines answer them
with mergeable sketches.  Spark's built-ins (``approx_count_distinct``'s
HLL++, the datasketches functions) are estimate-correct but NOT
replayable by another engine, which would break this repo's DuckDB oracle
gate and any cross-engine audit.  These operators instead build the two
classic sketches from the one portable hash the package already
standardizes on (``functions/hashing.py::md5_prefix60``), so the exact
same sketch — bit for bit — comes out of Spark and out of the SQL replay:

* ``kmv_distinct``   — K-Minimum-Values distinct-count sketch
  (Bar-Yossef et al., RANDOM 2002): keep the k smallest value hashes per
  group; below k the count is exact, above it the kth smallest hash's
  position in the hash space estimates the cardinality.
* ``kmv_merge``      — union previously-computed KMV sketches without
  touching raw data (the actual scale path: per-partition/per-day
  sketches roll up associatively).
* ``countmin_table`` / ``countmin_merge`` / ``countmin_query`` —
  Count-Min frequency estimation (Cormode & Muthukrishnan, J.Alg 2005):
  depth x width bucket counts (additive -> mergeable across batches),
  point queries answered by the min over depth rows — an upper bound
  that is exact until buckets collide.  ``countmin_freqs`` composes
  build + query for the one-shot case.

No reference analog (AHRD profiles nothing); this extends the engine's
table-profiling family (operators/profile.py) with the sublinear-state
estimators a training-data pipeline runs continuously.

Scale shape: ``kmv_distinct``'s full pass dedups (group, hash) with
map-side partials then takes bottom-k per group via a window over the
already-deduped rows (external sort, spill-safe); the UNGROUPED build
pre-reduces to a per-partition local bottom-k first so no single task
ever sorts the full distinct-hash stream; its OUTPUT is k hashes
per group, and ``kmv_merge`` folds outputs together with array
expressions only — incremental rebuilds never rescan history.
``countmin_freqs`` is one hash aggregate over (row, depth) pairs keyed by
(depth, bucket) — map-side combinable, output bounded by depth x width
regardless of input size — plus a broadcast join against the
driver-sized probe panel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ahrd_spark.functions.hashing import md5_hex15, md5_prefix60

# 16^15 == 2^60, the size of the md5_prefix60 hash space; exactly
# representable as a double, and quoted verbatim in the SQL replay.
HASH_SPACE = 1152921504606846976.0


def _kmv_estimate(k: int, n_seen, kth_hash):
    """Shared estimate expression: exact below k, else the KMV estimator
    floor((k-1) * |space| / kth) — floor, not round, so the SQL replay
    cannot diverge on banker's-rounding edge cases."""
    kth_val = F.conv(kth_hash, 16, 10).cast("bigint").cast("double")
    return F.when(n_seen < k, n_seen.cast("bigint")).otherwise(
        F.floor(F.lit(float(k - 1)) * F.lit(HASH_SPACE) / kth_val).cast(
            "bigint"
        )
    )


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    k: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """K-Minimum-Values distinct-count sketch per group ->
    ``(group..., hashes: array<string>, n_seen: bigint,
    kth_hash: string, est_distinct: bigint)``.

    ``hashes`` is the sorted bottom-k of the 15-hex-char md5 prefixes of
    the distinct values (fixed-length lowercase hex, so lexicographic
    order IS numeric order); ``est_distinct`` is exact when the group
    has fewer than k distinct values and the standard (k-1)/kth-fraction
    estimator otherwise.  Every column is a pure function of the value
    set — stable across runs, partition layouts, and engines.

    NULL values are excluded (SQL distinct-count convention).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    groups = list(group_cols or [])
    v = F.col(value_col).cast("string")
    hashed = (
        df.where(v.isNotNull())
        .select(*groups, md5_hex15(v).alias("h"))
        .distinct()
    )
    if groups:
        w = Window.partitionBy(*groups).orderBy("h")
        bottom = hashed.withColumn("rn", F.row_number().over(w)).where(
            F.col("rn") <= k
        )
    else:
        # ungrouped: a row_number window over partitionBy(lit(1)) would
        # funnel EVERY distinct hash through one task's external sort —
        # a single-partition bottleneck at scale.  Two-level bottom-k
        # instead (the kmv_merge shape applied to the build): level 1
        # takes the bottom-k of each post-dedup partition in parallel
        # (window keyed on spark_partition_id — per-partition external
        # sorts, spill-safe; result is layout-independent because the
        # global bottom-k is contained in the union of local bottom-ks
        # whatever the partitioning), so only <= k x n_partitions
        # survivor rows reach the level-2 global window.
        wp = Window.partitionBy("_pid").orderBy("h")
        local = (
            hashed.withColumn("_pid", F.spark_partition_id())
            .withColumn("rn", F.row_number().over(wp))
            .where(F.col("rn") <= k)
            .drop("_pid", "rn")
        )
        wg = Window.partitionBy(F.lit(1)).orderBy("h")
        bottom = local.withColumn("rn", F.row_number().over(wg)).where(
            F.col("rn") <= k
        )
    agg = bottom.groupBy(*[F.col(g) for g in groups]).agg(
        F.array_sort(F.collect_list("h")).alias("hashes")
    )
    n_seen = F.size("hashes").cast("bigint")
    kth = F.element_at("hashes", -1)
    return agg.select(
        *groups,
        "hashes",
        n_seen.alias("n_seen"),
        kth.alias("kth_hash"),
        _kmv_estimate(k, n_seen, kth).alias("est_distinct"),
    )


def kmv_merge(
    sketches: DataFrame,
    k: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Union KMV sketches (rows shaped like ``kmv_distinct`` output,
    possibly keyed by finer groups than ``group_cols``) into one sketch
    per ``group_cols`` — same output schema.  The union of two value
    sets' bottom-k is the bottom-k of the concatenated sketches, so the
    merge is array_sort + slice per group: no raw data, no rescans —
    associative and commutative, the property that makes per-day /
    per-partition sketch rollups work at scale.

    Correct only when all inputs were built with the same ``k`` (a
    smaller input k would under-represent its value set's tail).
    """
    groups = list(group_cols or [])
    merged = sketches.groupBy(*[F.col(g) for g in groups]).agg(
        F.slice(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("hashes")))
            ),
            1,
            k,
        ).alias("hashes")
    )
    n_seen = F.size("hashes").cast("bigint")
    kth = F.element_at("hashes", -1)
    return merged.select(
        *groups,
        "hashes",
        n_seen.alias("n_seen"),
        kth.alias("kth_hash"),
        _kmv_estimate(k, n_seen, kth).alias("est_distinct"),
    )


def countmin_table(
    df: DataFrame,
    value_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Build the Count-Min bucket table -> ``(j, bucket, c)``: ``depth``
    independent hash rows of ``width`` buckets, each value occurrence
    incrementing one bucket per row (hash = ``md5_prefix60(j || '|' ||
    value) % width``).  Output is bounded by depth x width regardless of
    input size, making it the persistable / mergeable sketch state:
    bucket counts are ADDITIVE, so ``countmin_merge`` folds per-day /
    per-partition tables with one sum — the Count-Min twin of
    ``kmv_merge`` (merge correctness requires identical width/depth
    across inputs)."""
    if width < 1 or depth < 1:
        raise ValueError("width and depth must be >= 1")
    v = F.col(value_col).cast("string")
    rows = F.array([F.lit(j) for j in range(depth)])
    return (
        df.where(v.isNotNull())
        .select(v.alias("v"), F.explode(rows).alias("j"))
        .select(
            "j",
            (
                md5_prefix60(
                    F.concat_ws("|", F.col("j").cast("string"), F.col("v"))
                )
                % width
            ).alias("bucket"),
        )
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def countmin_merge(tables: DataFrame) -> DataFrame:
    """Union Count-Min bucket tables (rows shaped like ``countmin_table``
    output, possibly concatenated across batches) into one table — bucket
    counts are additive, so the merge is a single (j, bucket) hash
    aggregate; associative and commutative, no raw data rescans."""
    return tables.groupBy("j", "bucket").agg(F.sum("c").alias("c"))


def countmin_query(
    counts: DataFrame,
    probes: DataFrame,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Answer point queries against a Count-Min bucket table ->
    ``(probe: string, est_count: bigint)``: min over the probe's
    ``depth`` buckets, an upper bound on the true count that is exact
    until buckets collide; an untouched bucket reads 0, so a
    definitely-absent probe estimates 0.

    ``probes`` — one ``probe`` string column; a driver-sized panel
    (heavy-hitter candidates, watchlist tokens).  ``width``/``depth``
    must match the build call.
    """
    if width < 1 or depth < 1:
        raise ValueError("width and depth must be >= 1")
    rows = F.array([F.lit(j) for j in range(depth)])
    probe_cells = (
        probes.select(F.col("probe").cast("string").alias("probe"))
        .distinct()
        .select("probe", F.explode(rows).alias("j"))
        .select(
            "probe",
            "j",
            (
                md5_prefix60(
                    F.concat_ws(
                        "|", F.col("j").cast("string"), F.col("probe")
                    )
                )
                % width
            ).alias("bucket"),
        )
    )
    # the bucket table is bounded by depth x width rows regardless of
    # input size -> broadcast it; an untouched bucket means count 0 (the
    # empty-bucket read is what makes a definitely-absent probe estimate
    # 0).  Local name keeps the broadcast-hint allowlist specific.
    cm_counts = counts
    return (
        probe_cells.join(
            F.broadcast(cm_counts), ["j", "bucket"], "left_outer"
        )
        .groupBy("probe")
        .agg(
            F.min(F.coalesce("c", F.lit(0)))
            .cast("bigint")
            .alias("est_count")
        )
    )


def countmin_freqs(
    df: DataFrame,
    value_col: str,
    probes: DataFrame,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """One-shot Count-Min point-frequency estimates ->
    ``(probe, est_count)``: ``countmin_table`` + ``countmin_query``
    composed (build the bucket table, read the probe panel).  Use the
    staged pair directly when the sketch state should be persisted and
    merged across batches."""
    return countmin_query(
        countmin_table(df, value_col, width=width, depth=depth),
        probes,
        width=width,
        depth=depth,
    )
