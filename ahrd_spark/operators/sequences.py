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


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    attr_col: str,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) build -> one row per run of
    consecutive equal ``attr_col`` values within each key's ordered
    history: key columns + (attr, valid_from, valid_to, n_events).
    ``valid_from`` is the run's first order-key value, ``valid_to`` the
    NEXT run's start (NULL for the key's current run) — the half-open
    validity interval a temporal KG stores per fact.

    Classic gaps-and-islands: a change flag (null-safe lag comparison)
    cumulated into a run id, one aggregate per run, one lead() for the
    closing bound.  Scale shape: a single per-key shuffle reused by both
    windows and the aggregation; run count, not event count, sizes the
    output.  ``order_cols`` must be a total order per key (append a
    unique tiebreaker) or run boundaries at ties are undefined.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    chg = (
        ~F.lag(F.col(attr_col)).over(w).eqNullSafe(F.col(attr_col))
    ).cast("int")
    runs = df.withColumn(
        "_run",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    first_order = order_cols[0]
    grouped = runs.groupBy(*key_cols, F.col("_run")).agg(
        F.first(attr_col).alias("attr"),
        F.min(first_order).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy(*key_cols).orderBy(F.col("valid_from").asc())
    return grouped.select(
        *key_cols,
        "attr",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )


def decayed_sum(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    half_life: float,
) -> DataFrame:
    """Recency-weighted per-key feature -> key columns +
    (decayed_value, n, last_ts): ``sum(value * 0.5^((last_ts - ts) /
    half_life))`` where ``last_ts`` is the key's latest event — the
    standard exponential-decay engagement/trust score (an event one
    half-life before the key's last activity counts half).

    ``ts_col`` and ``half_life`` share units (opaque to the operator).
    Scale shape: one per-key shuffle; the max-ts window and the
    aggregation reuse the same partitioning, and the weighted sum is a
    plain codegen expression (no per-row Python).
    """
    w = Window.partitionBy(*key_cols)
    weighted = df.withColumn("_last", F.max(ts_col).over(w)).withColumn(
        "_w",
        F.pow(
            F.lit(0.5),
            (F.col("_last") - F.col(ts_col)) / F.lit(float(half_life)),
        ),
    )
    return weighted.groupBy(*key_cols).agg(
        F.sum(F.col(value_col) * F.col("_w")).alias("decayed_value"),
        F.count(F.lit(1)).alias("n"),
        F.max(ts_col).alias("last_ts"),
    )


def session_paths(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    state_col: str,
    gap: int,
    min_count: int = 1,
) -> DataFrame:
    """Mine session paths -> (path, n_sessions): split each key's
    ordered event stream into sessions at inactivity gaps > ``gap``
    (units of ``order_cols[0]``, exact integers recommended), serialize
    each session's state sequence as a '>'-joined path string, and count
    sessions per distinct path — the navigation/behavior summary whose
    degenerate distribution (one path dominating) flags scripted
    traffic.

    Scale shape: one per-key shuffle shared by the gap window and the
    session aggregation (session id = cumulative sum of gap breaks),
    then a path-keyed count.  Path length is bounded by session length;
    pathological never-idle keys are the caller's watermark problem.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    t = F.col(order_cols[0])
    brk = (
        F.when(t - F.lag(t).over(w) > F.lit(gap), F.lit(1))
        .otherwise(F.lit(0))
    )
    sess = df.withColumn(
        "_sess",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ordered = sess.groupBy(*key_cols, F.col("_sess")).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            *[F.col(c) for c in order_cols],
                            F.col(state_col).alias("s"),
                        )
                    )
                ),
                lambda x: x["s"],
            ),
            ">",
        ).alias("path")
    )
    return (
        ordered.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .filter(F.col("n_sessions") >= min_count)
    )


def novelty_curve(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """Per-event novelty counter -> input columns plus ``is_new`` (1 on
    the key's first occurrence of its state) and ``distinct_so_far``
    (running distinct-state count) — the vocabulary-growth curve.  A
    crawler feed whose curve goes flat is re-crawling what it already
    has; a user whose curve never flattens is exploring (or synthetic).

    Exact streaming-free formulation: first occurrences are
    ``row_number() == 1`` over (key, state) ordered by ``order_cols``,
    and the running count is the cumulative sum of that flag over the
    key's timeline.  Scale shape: two window shuffles with DIFFERENT
    keys — (key, state) then (key) — which is the honest minimum: any
    single-shuffle plan would need per-task distinct state (the
    stateful-streaming formulation).  State cardinality never
    materializes; only a 0/1 flag rides the second shuffle.
    """
    order = [F.col(c).asc() for c in order_cols]
    w_first = Window.partitionBy(*key_cols, state_col).orderBy(*order)
    w_cum = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = df.withColumn(
        "is_new",
        (F.row_number().over(w_first) == 1).cast("int"),
    )
    return flagged.withColumn(
        "distinct_so_far", F.sum("is_new").over(w_cum).cast("bigint")
    )


def rolling_zscore(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    window: int,
) -> DataFrame:
    """Trailing-window anomaly score -> input columns plus ``z`` — how
    many trailing standard deviations the current value sits from the
    trailing mean (window = last ``window`` units of ``ts_col``,
    RANGE-framed so equal timestamps are peers).  NULL when the window
    has no spread (fewer than 2 points, or constant values — division
    guarded explicitly so every engine agrees instead of relying on
    divide-by-zero behavior).

    The streaming-corpus outlier gate: a value feed whose |z| spikes is
    broken upstream; a doc whose stat leaves the trailing band gets
    quarantined.  Scale shape: one per-key shuffle; mean and stddev ride
    the same RANGE frame.
    """
    frame = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc())
        .rangeBetween(-window, 0)
    )
    mean = F.mean(value_col).over(frame)
    std = F.stddev_samp(value_col).over(frame)
    z = F.when(std > 0, (F.col(value_col) - mean) / std)
    return df.withColumn("z", z)


def key_trend(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key OLS trend -> key columns + (slope, intercept, n): simple
    linear regression of ``y_col`` on ``x_col`` within each key, via the
    SQL-standard ``regr_slope``/``regr_intercept`` aggregates — drift
    detection over feeds (is this user's engagement trending down? is
    this crawler's doc quality decaying?) as one map-side-combinable
    aggregation, no ML library.

    NULL slope when a key has < 2 points or zero x-variance (the
    SQL-standard contract).  Scale by centering ``x_col`` upstream
    (epoch-days, not epoch-micros) so the sums stay well-conditioned in
    doubles.
    """
    return df.groupBy(*key_cols).agg(
        F.regr_slope(F.col(y_col), F.col(x_col)).alias("slope"),
        F.regr_intercept(F.col(y_col), F.col(x_col)).alias("intercept"),
        F.count(F.lit(1)).alias("n"),
    )
