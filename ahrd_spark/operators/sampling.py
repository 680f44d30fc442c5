"""Deterministic sampling operators for training-data curation.

``df.sample()`` is seed-dependent per RUN (partition-seeded RNG): the same
row can be in today's sample and out of tomorrow's, which poisons dataset
reproducibility and incremental rebuilds.  These operators decide per ROW
from a content hash, so membership is a pure function of (id, salt) —
stable across runs, executors, partition layouts, and engines (the DuckDB
oracle replays the exact md5 arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SAMPLE_BUCKETS = 10_000


def _hash_bucket(id_col: Column, salt: str) -> Column:
    """Uniform bucket in [0, SAMPLE_BUCKETS) from the first 60 bits of
    md5(id ':' salt) — md5 (not xxhash64) so any engine can replay it."""
    from ahrd_spark.functions.hashing import md5_prefix60

    h = F.concat_ws(":", id_col.cast("string"), F.lit(salt))
    return md5_prefix60(h) % SAMPLE_BUCKETS


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows keyed on ``id_col``.
    Disjoint samples come from different salts; nested samples (a 1% subset
    OF the 10% sample) from the same salt with a smaller fraction."""
    thr = int(round(fraction * SAMPLE_BUCKETS))
    return df.filter(_hash_bucket(F.col(id_col), salt) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the standard rebalancing move
    for training mixtures (e.g. downsample a crawl source to 10% while
    keeping curated sources whole).  Strata absent from ``fractions`` are
    DROPPED (explicit allowlist; silent pass-through of an unexpected new
    source into a training set is an incident).  Pure narrow filter: no
    shuffle, fully pushdown-friendly, scales to any corpus size."""
    thr = F.create_map(
        *[
            F.lit(x)
            for kv in fractions.items()
            for x in (kv[0], int(round(kv[1] * SAMPLE_BUCKETS)))
        ]
    )
    bucket = _hash_bucket(F.col(id_col), salt)
    return df.filter(
        bucket < F.coalesce(thr[F.col(strata_col)], F.lit(0))
    )


def group_split(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str,
    salt: str = "",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: adds a ``split`` column
    decided by the hash bucket of the GROUP value (canonical dedup group,
    domain, URL host...), so every row of a group lands in the SAME split
    — near-duplicates can never straddle train and test, the standard
    contamination bug a row-hashed split silently commits.

    ``weights`` maps split name -> probability mass; they must sum to ~1.
    Bucket ranges are assigned in sorted-name order, so the layout is a
    pure function of (group, salt, weights) — stable across runs, engines,
    and cluster sizes.  NULL groups get the ``split`` of the empty-string
    group (hash of ':salt') rather than a NULL split — silent row loss in
    a later ``split = 'train'`` filter is an incident.

    Pure narrow projection: no shuffle, no UDF; the DuckDB oracle replays
    the exact md5 arithmetic.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    bad = {k: v for k, v in weights.items() if not 0.0 < v <= 1.0}
    if bad:
        raise ValueError(f"each split weight must be in (0, 1], got {bad}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = _hash_bucket(F.coalesce(F.col(group_col), F.lit("")), salt)
    expr = None
    cum = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        cum += weights[name]
        thr = int(round(cum * SAMPLE_BUCKETS))
        case = F.when(bucket < F.lit(thr), F.lit(name))
        expr = case if expr is None else expr.when(bucket < F.lit(thr), F.lit(name))
    # last split takes the remainder so rounding never drops a bucket
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn("split", expr)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (top-``k``):
    the Efraimidis-Spirakis A-ES scheme with hash-derived uniforms —
    every row gets ``score = ln(u) / w`` where ``u`` in (0, 1] comes from
    the portable 60-bit md5 of (id, salt), and the ``k`` largest scores
    win.  Inclusion probability is proportional to weight (quality score,
    source boost, dedup-cluster mass) with no replacement and NO
    randomness: the same (corpus, salt) always picks the same sample, a
    different salt draws an independent one — the reproducibility
    contract every training-mixture build needs.

    Rows with NULL or non-positive weight are excluded (they'd have
    inclusion probability 0 anyway; a negative weight is a caller bug
    surfaced by the documented filter, not a crash).

    Scale shape: one narrow projection + ``orderBy(...).limit(k)``, which
    Spark executes as TakeOrdered — per-partition top-k then a k-sized
    driver merge; no full sort, no shuffle of the losers.  k is the
    sample size (thousands, not corpus-sized) by contract."""
    from ahrd_spark.functions.hashing import md5_prefix60

    if k < 1:
        raise ValueError("k must be >= 1")
    h = md5_prefix60(
        F.concat(F.col(id_col).cast("string"), F.lit(":ws:" + salt))
    )
    # u in (0, 1]: (h + 1) / 2^60, the divisor exactly representable
    u = (h.cast("double") + F.lit(1.0)) / F.lit(1152921504606846976.0)
    score = F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_ws_score", score)
        .orderBy(F.col("_ws_score").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("_ws_score")
    )


def shard_assign(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Deterministic output sharding -> input columns + ``shard`` in
    [0, n_shards): the data-loader bucketing step.  The shard id is a
    pure function of the row id (portable md5 arithmetic, replayable in
    any engine), so re-running the pipeline lands every document in the
    same shard — which is what makes shard-level caching and resumable
    training-data publication work.  Uniformity comes from the hash, so
    shards balance to ~1/sqrt(rows-per-shard) relative error with no
    shuffle at all (the column is computed map-side; writers partition
    by it).
    """
    from ahrd_spark.functions.hashing import md5_prefix60

    h = F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))
    return df.withColumn(
        "shard", (md5_prefix60(h) % F.lit(n_shards)).cast("int")
    )


def mixture_materialize(
    docs: DataFrame,
    plan: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
) -> DataFrame:
    """Materialize a training mixture: apply each source's planned
    ``sample_fraction`` (from :func:`ahrd_spark.operators.corpus.
    mixture_plan`) as a deterministic hash filter -> the sampled docs.
    Sources absent from the plan are dropped (inner join — an unplanned
    source in the mixture is a bug, not a default).

    The per-source threshold is computed IN the plan frame
    (``round(fraction * buckets)``), so the filter is one broadcast-able
    join plus a map-side predicate — no shuffle of the corpus, same
    nested-sample guarantees as ``hash_sample`` (same salt -> a smaller
    fraction is a subset of a larger one).
    """
    from ahrd_spark.functions.hashing import md5_prefix60

    thr = plan.select(
        source_col,
        F.round(F.col("sample_fraction") * SAMPLE_BUCKETS)
        .cast("bigint")
        .alias("_thr"),
    )
    h = F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))
    return (
        docs.join(thr, source_col)
        .filter((md5_prefix60(h) % SAMPLE_BUCKETS) < F.col("_thr"))
        .drop("_thr")
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    n: int,
    salt_buckets: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact per-key top-``n`` under ``ORDER BY order_cols`` — the
    per-domain document cap every web-curation pipeline runs (RefinedWeb /
    C4-style: bound any single host's contribution to the corpus).

    -> input columns + ``key_rank`` (1-based position within the key).

    The naive ``row_number() OVER (PARTITION BY key)`` sends EVERY row of
    a hot key to one reducer — the canonical skew failure when one domain
    owns 10% of a 10^12-row crawl.  This is the salted two-phase exact
    version instead:

    1. pre-prune: rank within ``(key, salt)`` where salt = id-hash mod
       ``salt_buckets``; keep local rank <= n.  Any global top-n row is
       top-n within its own salt bucket, so the prune is lossless, and
       the hot key's rows split across ``salt_buckets`` reducers.
    2. final: rank the <= n * salt_buckets survivors per key and keep
       ``rank <= n`` — the heavy key now contributes a bounded row count
       to the final window.

    Deterministic: callers' ``order_cols`` should end with a tiebreaker
    (the id column is appended automatically).
    """
    from pyspark.sql import Window

    if n < 1:
        raise ValueError("n must be >= 1")
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    order.append(F.col(id_col))
    salted = df.withColumn(
        "_salt", (_hash_bucket(F.col(id_col), "cap") % salt_buckets)
    )
    w_local = Window.partitionBy(key_col, "_salt").orderBy(*order)
    pruned = (
        salted.withColumn("_lrk", F.row_number().over(w_local))
        .filter(F.col("_lrk") <= n)
        .drop("_lrk", "_salt")
    )
    w_final = Window.partitionBy(key_col).orderBy(*order)
    return (
        pruned.withColumn(
            "key_rank", F.row_number().over(w_final).cast("bigint")
        )
        .filter(F.col("key_rank") <= n)
    )
