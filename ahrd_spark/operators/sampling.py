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
