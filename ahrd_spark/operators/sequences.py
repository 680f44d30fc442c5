"""Per-key ordered-sequence analytics: first-order transition matrix.

Event-sequence structure is a curation signal the per-event stats can't
see: a scraped-log corpus whose view->click transition probability is 0
or 1 is synthetic/boilerplate; a KG ingestion feed whose
update->rollback probability spikes signals an upstream regression.
``transition_matrix`` folds each key's time-ordered state sequence into
global (from_state, to_state) counts and row-normalized probabilities —
the Markov-chain summary.

Scale shape: ONE shuffle (the per-key window partition) + one
(from, to)-keyed count with map-side partials + one from_state-keyed
window for row sums.  State cardinality (event types), not event count,
bounds the output.  Ties at equal timestamps are broken by the caller's
``order_cols`` — pass a unique tiebreaker (event id) or the transition
pairs at tied instants are undefined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_matrix(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    state_col: str = "state",
) -> DataFrame:
    """-> (from_state, to_state, n, p): global first-order transition
    counts over each key's ordered sequence, with
    ``p = n / sum(n) over from_state``.  Sequences of length 1 contribute
    nothing; NULL states are kept as ordinary states only if present in
    the data (no silent drop)."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    pairs = df.select(
        F.lag(F.col(state_col)).over(w).alias("from_state"),
        F.col(state_col).alias("to_state"),
    ).filter(F.col("from_state").isNotNull())
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_total = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n",
        (F.col("n") / F.sum("n").over(row_total)).alias("p"),
    )


def rolling_window_features(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    windows_s: list[int],
    value_col: str | None = None,
) -> DataFrame:
    """Trailing time-window features per row -> input columns plus, for
    each window length W (seconds), ``cnt_{W}s`` (events in the last W
    seconds incl. the current row) and, when ``value_col`` is given,
    ``sum_{W}s`` — the standard behavioral / rate-limit / burst features
    for event corpora, computed with RANGE windows so rows at the exact
    same timestamp are peers (identical semantics in every engine).

    ``ts_col`` must be NUMERIC seconds (cast timestamps with
    ``unix_micros(...) / 1e6`` upstream — or pass microseconds and scale
    ``windows_s`` accordingly; the operator treats units opaquely).

    Scale shape: ONE shuffle (the per-key window partition) shared by
    every window length; per-key ordering is a single sort.  Hot keys are
    the shared window caveat."""
    if not windows_s:
        raise ValueError("windows_s must be non-empty")
    out = df
    base = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    for w in windows_s:
        frame = base.rangeBetween(-w, 0)
        out = out.withColumn(f"cnt_{w}s", F.count(F.lit(1)).over(frame))
        if value_col is not None:
            out = out.withColumn(f"sum_{w}s", F.sum(value_col).over(frame))
    return out
