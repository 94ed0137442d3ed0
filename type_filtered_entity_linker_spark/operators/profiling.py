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
