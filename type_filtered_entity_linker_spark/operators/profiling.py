"""Column-level data profiling — the step a linkage team runs BEFORE
choosing blocking keys and comparison fields (reference: the manual
field inspection implicit in el/entity_linker.py's fixed attribute
choices; industrialized here the way Deequ/ydata-profiling do):
completeness (null rate), distinctness, length statistics and the
modal value per column decide which fields can block (high
distinctness, high completeness) and which can only compare.

Shape: one generate-unpivot (explode over typed structs — rows x
|cols|, map-side, no shuffle)
into (col_name, value), then TWO hash aggregates — per-(col, value)
counts with map-side partial collapse, then per-col rollup. Both are
keyed by col_name (+value), so a 100 TB table profiles in two
shuffles whose reduce keys are at most |cols| x |distinct values|;
no window, no collect, no per-row Python. The modal value rides the
second aggregate as ``max(struct(cnt, value))`` — tie-break is
therefore (highest count, lexicographically LARGEST value), a
documented part of the contract (the DuckDB oracle replays it with
``ORDER BY cnt DESC, value DESC``).

All values are profiled through ``CAST(x AS STRING)`` so one unpivot
covers heterogeneous column types; length stats are character counts
of that string form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile ``cols`` of ``df``: one row per column with
    (col_name, n_rows, n_null, null_rate, n_distinct, avg_len,
    top_value, top_count). ``n_distinct`` counts distinct NON-NULL
    values; ``avg_len``/``top_value`` ignore NULLs (all-NULL column
    -> NULL avg_len/top_value, 0 top_count is not emitted — top
    struct is NULL)."""
    if not cols:
        raise ValueError("profile_columns requires at least one column")
    # typed expressions, not an interpolated selectExpr string: column
    # names with quotes/backticks profile fine (code-review r04)
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.col_name", "kv.value")
    per_val = stacked.groupBy("col_name", "value").agg(
        F.count("*").cast("long").alias("cnt")
    )
    nn = F.col("value").isNotNull()
    prof = per_val.groupBy("col_name").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(~nn, F.col("cnt"))), F.lit(0)
        ).cast("long").alias("n_null"),
        F.count(F.when(nn, True)).cast("long").alias("n_distinct"),
        F.round(
            F.sum(F.when(nn, F.length("value") * F.col("cnt")))
            / F.sum(F.when(nn, F.col("cnt"))),
            6,
        ).alias("avg_len"),
        F.max(
            F.when(
                nn,
                F.struct(
                    F.col("cnt").alias("c"), F.col("value").alias("v")
                ),
            )
        ).alias("_top"),
    )
    return prof.select(
        "col_name",
        "n_rows",
        "n_null",
        F.round(F.col("n_null") / F.col("n_rows"), 6).alias("null_rate"),
        "n_distinct",
        "avg_len",
        F.col("_top.v").alias("top_value"),
        F.col("_top.c").alias("top_count"),
    )


def fd_violations(
    df: DataFrame, deps: "list[tuple[str, str]]"
) -> DataFrame:
    """Functional-dependency check over candidate (determinant →
    dependent) column pairs — the data-quality probe that decides
    whether a field can serve as a linkage KEY (phone → one person?)
    or only as evidence. For each dependency A → B the violation
    count is the minimum number of rows that would have to change for
    the FD to hold exactly (the g3 error of Kivinen & Mannila '95):
    sum over A-groups of (group size − the modal B count).

    Shape per dependency: one (A, B) hash aggregate with map-side
    partial collapse, then one A-keyed rollup taking max(count) and
    sum(count) — two bounded shuffles, no window, no collect; the
    dependencies are independent branches unioned at the end (a
    handful of candidate keys, so the union fan-in is small). NULLs:
    rows with NULL determinant or dependent are excluded first (SQL
    FD semantics are undefined on NULL; the count excluded is
    reported so the exclusion is visible, per the profiling
    contract).

    Returns one row per dependency: (lhs, rhs, n_rows, n_nulls,
    n_groups, n_violations, violation_rate [6dp, 0.0 when no rows],
    holds).
    """
    out: "DataFrame | None" = None
    for lhs, rhs in deps:
        base = df.select(
            F.col(lhs).cast("string").alias("_a"),
            F.col(rhs).cast("string").alias("_b"),
        )
        nn = base.where(
            F.col("_a").isNotNull() & F.col("_b").isNotNull()
        )
        pairs = nn.groupBy("_a", "_b").agg(F.count("*").alias("_c"))
        grp = pairs.groupBy("_a").agg(
            F.sum("_c").alias("_sz"), F.max("_c").alias("_mx")
        )
        row = (
            grp.agg(
                F.coalesce(F.sum("_sz"), F.lit(0))
                .cast("long")
                .alias("n_rows"),
                F.count("*").cast("long").alias("n_groups"),
                F.coalesce(F.sum(F.col("_sz") - F.col("_mx")), F.lit(0))
                .cast("long")
                .alias("n_violations"),
            )
            .crossJoin(
                base.agg(
                    F.coalesce(
                        F.sum(
                            (
                                F.col("_a").isNull()
                                | F.col("_b").isNull()
                            ).cast("long")
                        ),
                        F.lit(0),
                    )
                    .cast("long")
                    .alias("n_nulls")
                )
            )
            .select(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                "n_rows",
                "n_nulls",
                "n_groups",
                "n_violations",
                F.when(F.col("n_rows") > 0,
                       F.round(F.col("n_violations")
                               / F.col("n_rows"), 6))
                .otherwise(F.lit(0.0))
                .alias("violation_rate"),
                (F.col("n_violations") == 0).alias("holds"),
            )
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None, "fd_violations: deps must be non-empty"
    return out
