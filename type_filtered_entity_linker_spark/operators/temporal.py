"""Temporal joins over event streams — the as-of join Spark lacks as a
builtin, expressed as a composition of existing DataFrame ops (the
build brief's 'custom operators' rule: composition first, UDFs only if
semantics demand them — none do here).

``asof_join`` attaches, to every left row, the most recent right row
with the same key and ``right.ts <= left.ts`` (backward as-of, the
trade-matching / feature-at-time semantics). Plan: tag both sides,
``unionByName``, ONE window pass per key ordered by (ts, side) with a
running ``last(..., ignorenulls=True)`` carry-forward — a single
shuffle on the key, no per-key merge loops, no range self-join blowup.

Scale notes: state is one row of carried values per window frame —
Spark's window operator streams partition-sorted rows, so memory is
O(1) per key beyond the sort. A pathologically hot key serializes its
own rows through one task (inherent to per-key ordering); cap or
pre-bucket upstream if a single key exceeds a task's sort budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: left rows + the latest right row at-or-before
    their timestamp (per key). Right columns arrive as
    ``{ts_col}{suffix}`` and ``{v}{suffix}``; left rows with no prior
    right row keep nulls (LEFT ASOF semantics)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (*on, ts_col)
    ]
    l_tag = left.withColumn("_side", F.lit(0))
    # the whole right row is carried as ONE struct: carrying value
    # columns independently with last(ignorenulls) would skip a NULL
    # value in the most recent right row and mix it with an older
    # row's non-null value — true ASOF semantics must return the
    # latest ROW, nulls and all
    r_tag = (
        right.select(*on, ts_col, *value_cols)
        .withColumn(
            "_r",
            F.struct(
                F.col(ts_col).alias(f"{ts_col}{suffix}"),
                *[F.col(v).alias(f"{v}{suffix}") for v in value_cols],
            ),
        )
        .withColumn("_side", F.lit(1))
    )
    tagged = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort BEFORE left rows at equal timestamps (_side desc)
    # so an exactly-simultaneous right row is visible to the left row —
    # the inclusive <= of ASOF semantics. The trailing _r ordering makes
    # duplicate (key, ts) right rows resolve deterministically (the
    # struct-greatest row wins) instead of by partition luck.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").desc(), F.col("_r").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [f"{ts_col}{suffix}"] + [f"{v}{suffix}" for v in value_cols]
    out = tagged.withColumn("_c", F.last("_r", ignorenulls=True).over(w))
    return out.where(F.col("_side") == 0).select(
        *[c for c in left.columns],
        *[F.col(f"_c.{c}").alias(c) for c in carried],
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    trunc_unit: str = "hour",
) -> DataFrame:
    """Interval-overlap (range) join: all (left, right) pairs whose
    closed intervals intersect — ``l_start <= r_end AND r_start <=
    l_end``. A naive theta-join is a cross product; this is the
    standard BANDED plan made exactly-once:

    1. each side explodes to the ``trunc_unit`` buckets its interval
       covers (``sequence(date_trunc(u, start), date_trunc(u, end))``
       — narrow, no shuffle),
    2. EQUI-join on the bucket (one hash shuffle; Catalyst/AQE treat
       it like any key join),
    3. keep a pair only in the ONE bucket containing
       ``greatest(l_start, r_start)`` — the anchor bucket. Any
       overlapping pair's anchor lies inside both intervals, so it is
       emitted exactly once and never needs a dedup shuffle.

    Bucket width is the skew/fan-out dial: per-pair emitted rows =
    interval length / width, and per-bucket join fan-in = concurrent
    intervals per bucket. Pick the unit near the median interval
    length (DuckDB's IEJoin and Spark's own range-join hints make the
    same trade internally). Left/right column names must be disjoint.

    Preconditions: intervals must be well-formed (start <= end on both
    sides — an inverted interval would make F.sequence throw deep in
    execution with no hint of the offending row; filter or fix such
    rows upstream), and ``trunc_unit`` must be a supported bucket
    width (advice r03)."""
    units = {
        "hour": "INTERVAL 1 HOUR",
        "day": "INTERVAL 1 DAY",
        "minute": "INTERVAL 1 MINUTE",
        "week": "INTERVAL 1 WEEK",
    }
    if trunc_unit not in units:
        raise ValueError(
            f"trunc_unit={trunc_unit!r} not supported; "
            f"pick one of {sorted(units)}"
        )
    unit_interval = units[trunc_unit]

    def banded(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.date_trunc(trunc_unit, F.col(start)),
                    F.date_trunc(trunc_unit, F.col(end)),
                    F.expr(unit_interval),
                )
            ),
        )

    lb = banded(left, l_start, l_end)
    rb = banded(right, r_start, r_end)
    anchor = F.date_trunc(
        trunc_unit, F.greatest(F.col(l_start), F.col(r_start))
    )
    return (
        lb.join(rb, "_bucket")
        .where(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("_bucket") == anchor)
        )
        .drop("_bucket")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention — the standard engagement matrix: users
    grouped by first-seen week (the cohort), each later week's row
    counting how many of them came back. On crawl/event telemetry the
    same shape answers 'do hosts keep getting recrawled' / 'do users
    return'; the matrix is the input to every retention chart.

    Week boundaries are Monday-start (both engines' date_trunc
    'week'); the offset is exact integer arithmetic (day difference of
    two Monday truncations divided by 7), so there is no float in the
    key path. Shape: one per-user min aggregate, one distinct
    (user, week) projection, a user-keyed join, then a (cohort,
    offset) count-distinct; cohort sizes broadcast back for the rate.

    Returns (cohort_week, week_offset, n_active, n_cohort,
    retention_rate [6dp]); week_offset 0 rows carry retention 1.0 by
    construction.
    """
    first = events.groupBy(F.col(user_col).alias("u")).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cw")
    )
    active = events.select(
        F.col(user_col).alias("u"),
        F.date_trunc("week", F.col(ts_col)).alias("w"),
    ).distinct()
    j = active.join(first, "u").select(
        "u",
        "cw",
        (F.datediff(F.col("w"), F.col("cw")) / 7)
        .cast("long")
        .alias("week_offset"),
    )
    cells = j.groupBy("cw", "week_offset").agg(
        F.countDistinct("u").cast("long").alias("n_active")
    )
    sizes = first.groupBy("cw").agg(
        F.count("*").cast("long").alias("n_cohort")
    )
    return (
        cells.join(F.broadcast(sizes), "cw")
        .select(
            F.col("cw").alias("cohort_week"),
            "week_offset",
            "n_active",
            "n_cohort",
            F.round(F.col("n_active") / F.col("n_cohort"), 6).alias(
                "retention_rate"
            ),
        )
    )


def event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
) -> DataFrame:
    """First-order transition matrix over per-key event sequences:
    for each ordered consecutive pair of states (by event time within
    a key), the count and the row-normalized transition probability —
    the Markov summary behind funnel debugging ('what actually
    follows a view?') and bot detection (near-deterministic rows).

    Determinism: ties in event time order by a documented secondary
    sort on the state value, so same-timestamp events produce a
    stable successor in both engines. Shape: one per-key window pass
    for lead() (per-key ordering — per-key row counts bound the sort,
    the asof_join caveat applies to pathological keys), then a
    (from_state, to_state) hash aggregate and a broadcast-joined
    per-from_state total.

    Returns (from_state, to_state, n, p [6dp]).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(state_col).asc()
    )
    seq = events.select(
        F.col(state_col).alias("from_state"),
        F.lead(state_col).over(w).alias("to_state"),
    ).where(F.col("to_state").isNotNull())
    counts = seq.groupBy("from_state", "to_state").agg(
        F.count("*").cast("long").alias("n")
    )
    totals = counts.groupBy("from_state").agg(
        F.sum("n").cast("long").alias("t")
    )
    return counts.join(F.broadcast(totals), "from_state").select(
        "from_state",
        "to_state",
        "n",
        F.round(F.col("n") / F.col("t"), 6).alias("p"),
    )
