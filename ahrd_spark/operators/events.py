"""Event-corpus analytics: ordered funnels, cohort retention, rollups.

These are the standard questions asked of a web-scale event table
(clickstream, ingestion logs, crawler telemetry) before its documents
are admitted into a training corpus: does the view->click->purchase
funnel convert like organic traffic (bot farms don't), do user cohorts
persist across weeks (synthetic accounts don't), and what do the
per-type/per-day volumes look like at every rollup level.

Scale shapes
------------
* ``funnel_counts`` — one shuffle on the entity key, then k-1
  key-co-partitioned join+agg rounds (k = number of steps); every join
  is on the same key, so AQE reuses the exchange.  Output is k rows.
* ``cohort_retention`` — two key-keyed aggregations joined on the key
  (first-activity period, then distinct-entity counts per
  (cohort, offset) cell); output is bounded by periods², not events.
* ``rollup_counts`` — a single ROLLUP aggregation; Spark expands one
  input row per grouping set but partial (map-side) aggregation makes
  the shuffle carry only group cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_reach(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within: int | None = None,
) -> DataFrame:
    """Per-key ordered-funnel reach times -> (key, t1..tk).

    ``t1`` is the key's earliest ``steps[0]`` event; ``t_i`` (i>1) the
    earliest ``steps[i-1]`` event strictly after ``t_{i-1}`` and — when
    ``within`` is given — no later than ``t1 + within`` (window anchored
    at funnel entry, the classic definition).  ``ts_col`` units are
    opaque (pass exact integer microseconds for engine portability).
    Keys that never reach step 1 are absent; later unreached steps are
    NULL.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    reach = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        cond = (F.col(type_col) == step) & (F.col(ts_col) > F.col(f"t{i-1}"))
        if within is not None:
            cond = cond & (F.col(ts_col) <= F.col("t1") + F.lit(within))
        nxt = (
            df.join(reach, key_col)
            .filter(cond)
            .groupBy(key_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        reach = reach.join(nxt, key_col, "left")
    return reach


def funnel_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within: int | None = None,
) -> DataFrame:
    """-> (step_idx, step, keys_cnt, conv_r): how many keys reached each
    funnel step, plus conversion relative to step 1 (6 dp)."""
    reach = funnel_reach(df, key_col, ts_col, type_col, steps, within)
    counts = reach.agg(
        *[
            F.count(f"t{i}").alias(f"c{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    rows = [
        F.struct(
            F.lit(i).alias("step_idx"),
            F.lit(step).alias("step"),
            F.col(f"c{i}").alias("keys_cnt"),
            # guarded: an empty funnel (c1 = 0) must yield NULL, not an
            # ANSI divide-by-zero (hypothesis-caught on empty corpora)
            F.round(
                F.when(F.col("c1") > 0, F.col(f"c{i}") / F.col("c1")), 6
            ).alias("conv_r"),
        )
        for i, step in enumerate(steps, start=1)
    ]
    return counts.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


def cohort_retention(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    period: int,
    anchor: int = 0,
) -> DataFrame:
    """-> (cohort_period, period_offset, active_cnt): classic retention
    triangle.  A key's cohort is the period of its first event
    (``(ts - anchor) div period``, exact integer division — pass
    integer-microsecond timestamps); ``active_cnt`` counts distinct keys
    of that cohort active ``period_offset`` periods later.
    """
    # integer floor division: inputs are non-negative by contract
    base = df.select(
        F.col(key_col).alias("k"),
        F.expr(f"CAST(({ts_col} - {anchor}) DIV {period} AS BIGINT)").alias(
            "p"
        ),
    )
    first = base.groupBy("k").agg(F.min("p").alias("cohort_period"))
    return (
        base.join(first, "k")
        .groupBy(
            "cohort_period",
            (F.col("p") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.count_distinct("k").alias("active_cnt"))
    )


def rollup_counts(
    df: DataFrame, dims: list[str], value_col: str | None = None
) -> DataFrame:
    """ROLLUP aggregate over ``dims`` -> one row per grouping-set cell
    with per-dim ``g_<dim>`` flags (1 = rolled up, disambiguating real
    NULL keys), ``n`` and optionally ``sum_value_r`` (6 dp)."""
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value_r"))
    out = df.rollup(*dims).agg(
        *[F.grouping(d).cast("int").alias(f"g_{d}") for d in dims], *aggs
    )
    return out.select(
        *dims, *[f"g_{d}" for d in dims], "n",
        *(["sum_value_r"] if value_col is not None else []),
    )


def cube_counts(
    df: DataFrame, dims: list[str], value_col: str | None = None
) -> DataFrame:
    """CUBE aggregate over ``dims`` — every grouping-set combination
    (2^len(dims) sets), same output contract as :func:`rollup_counts`
    (per-dim ``g_<dim>`` flags disambiguate real NULL keys).  Use CUBE
    when slices along EVERY dim combination are wanted (dashboards);
    ROLLUP when only the drill-down chain is."""
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value_r"))
    out = df.cube(*dims).agg(
        *[F.grouping(d).cast("int").alias(f"g_{d}") for d in dims], *aggs
    )
    return out.select(
        *dims, *[f"g_{d}" for d in dims], "n",
        *(["sum_value_r"] if value_col is not None else []),
    )


def pivot_counts(
    df: DataFrame,
    key_cols: list[str],
    pivot_col: str,
    values: list[str],
) -> DataFrame:
    """Wide per-key feature row -> key columns plus one ``n_<value>``
    count column per pivot value (0 when absent) — the one-hot count
    vector fed to downstream classifiers/profilers.

    ``values`` is REQUIRED: passing the pivot domain explicitly keeps
    the plan a single aggregation (Spark otherwise runs an extra
    distinct job to discover columns) and pins the output schema, which
    at corpus scale is the difference between a plannable query and a
    schema that drifts with the data.  Conditional-count formulation, so
    partial aggregation happens map-side like any other count.
    """
    aggs = [
        F.sum((F.col(pivot_col) == v).cast("bigint")).alias(f"n_{v}")
        for v in values
    ]
    return df.groupBy(*key_cols).agg(*aggs)


__all__ = [
    "funnel_reach",
    "funnel_counts",
    "cohort_retention",
    "rollup_counts",
    "pivot_counts",
]


def session_stats(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    state_col: str,
    gap: int,
) -> DataFrame:
    """Session-level rollup -> one row per (key, session): key columns +
    (session_start, session_end, duration, n_events, n_states, bounce).
    Sessions split at inactivity gaps > ``gap`` in ``order_cols[0]``
    units (same gaps-and-islands split as ``session_paths`` — the two
    operators are different aggregates over the same session frame).
    ``bounce`` flags single-event sessions, the classic junk-traffic
    signal.

    Scale shape: one per-key shuffle shared by the gap window and the
    session aggregation; output is session count, not event count.
    """
    from pyspark.sql import Window

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
    return sess.groupBy(*key_cols, F.col("_sess")).agg(
        F.min(order_cols[0]).alias("session_start"),
        F.max(order_cols[0]).alias("session_end"),
        (F.max(order_cols[0]) - F.min(order_cols[0])).alias("duration"),
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct(state_col).alias("n_states"),
        (F.count(F.lit(1)) == 1).cast("int").alias("bounce"),
    ).drop("_sess")


def active_users_window(
    df: DataFrame,
    key_col: str,
    day_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Rolling active-entity counts -> (day, dau, wau): per calendar day,
    the exact count of distinct keys active that day (``dau``) and in
    the trailing ``window_days`` ending that day (``wau``) — the
    engagement health metric, and at corpus scale the dedup-rate /
    crawler-coverage metric.

    Exact sliding DISTINCT without a sliding state store: each distinct
    (key, day) activity CONTRIBUTES to the ``window_days`` days it
    supports (an explode bounded by the window length), and a plain
    per-day distinct count over the contributions is exactly the
    trailing-window distinct.  Days past the data's end are clipped via
    one scalar max.  Shuffle volume = distinct activity x window_days —
    linear, no per-day rescan.
    """
    ud = df.select(
        F.col(key_col).alias("k"), F.col(day_col).alias("day")
    ).distinct()
    contrib = ud.select(
        "k",
        F.explode(
            F.sequence(
                F.col("day"), F.col("day") + F.lit(window_days - 1)
            )
        ).alias("day"),
    )
    wau = contrib.groupBy("day").agg(F.count_distinct("k").alias("wau"))
    dau = ud.groupBy("day").agg(F.count_distinct("k").alias("dau"))
    last = ud.agg(F.max("day").alias("_max"))
    return (
        wau.join(dau, "day", "left")
        .crossJoin(last)
        .filter(F.col("day") <= F.col("_max"))
        .select(
            "day",
            F.coalesce("dau", F.lit(0)).alias("dau"),
            "wau",
        )
    )
