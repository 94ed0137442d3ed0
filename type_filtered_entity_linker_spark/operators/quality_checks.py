"""Declarative data-quality checks — the Deequ-style verification
suite a pipeline runs as a GATE before linkage or training consumes a
table (reference: the implicit trust el/entity_linker.py places in its
input attributes; industrialized as unit tests FOR DATA): each check
names a column, a metric kind, and a threshold; the report is one row
per check with the measured metric and a pass flag, so CI can fail on
`passed = 0` rows.

Kinds:
- ``completeness``: non-null fraction >= threshold
- ``distinctness``: exact distinct / rows >= threshold
- ``in_set``: fraction of rows whose value is in ``allowed`` >= threshold
  (NULLs count as failures — a NULL is not in any allowed set)
- ``non_negative``: fraction of rows >= 0 on a numeric column >=
  threshold (NULLs count as failures)

Scale shape: ALL metrics compute in ONE aggregate pass over the table
(conditional counts + count-distincts share the scan and the partial
aggregation); the report explodes from that single row, so a 100 TB
table pays one scan regardless of how many checks run. No UDFs, no
window, no collect."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KINDS = ("completeness", "distinctness", "in_set", "non_negative")


def run_quality_checks(df: DataFrame, checks: "list[dict]") -> DataFrame:
    """Evaluate ``checks`` (dicts with name/col/kind/threshold, plus
    ``allowed`` for in_set) against ``df``: returns one row per check
    — (check, col_name, kind, metric, threshold, passed) with metric
    rounded to 6 and passed = (metric >= threshold) as int. An empty
    table yields metric NULL and passed 0 for every check (nothing was
    verified, so nothing passed)."""
    if not checks:
        raise ValueError("run_quality_checks requires at least one check")
    n = F.count(F.lit(1))
    aggs = []
    for i, c in enumerate(checks):
        kind, col = c["kind"], c["col"]
        if kind == "completeness":
            m = F.count(F.col(col)) / n
        elif kind == "distinctness":
            m = F.countDistinct(F.col(col)) / n
        elif kind == "in_set":
            m = (
                F.coalesce(
                    F.sum(
                        F.when(F.col(col).isin(*c["allowed"]), 1).otherwise(0)
                    ),
                    F.lit(0),
                )
                / n
            )
        elif kind == "non_negative":
            m = (
                F.coalesce(
                    F.sum(F.when(F.col(col) >= 0, 1).otherwise(0)), F.lit(0)
                )
                / n
            )
        else:
            raise ValueError(
                f"unknown check kind {kind!r}; supported: {_KINDS}"
            )
        # CASE-guard the division: under ANSI mode an empty table's
        # count(*) = 0 denominator throws instead of yielding NULL
        aggs.append(F.round(F.when(n > 0, m), 6).alias(f"_m{i}"))
    row = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(c["name"]).alias("check"),
            F.lit(c["col"]).alias("col_name"),
            F.lit(c["kind"]).alias("kind"),
            F.col(f"_m{i}").alias("metric"),
            F.lit(float(c["threshold"])).alias("threshold"),
        )
        for i, c in enumerate(checks)
    ]
    return (
        row.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.*")
        .withColumn(
            "passed",
            F.coalesce(
                (F.col("metric") >= F.col("threshold")).cast("int"), F.lit(0)
            ),
        )
    )
