"""Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995):
sort the corpus by a fuzzy key, compare only records within a fixed
rank window. The classic complement to equi-key blocking — typo'd
duplicates that no exact key catches still sort adjacently (a
truncated name is a PREFIX of its original, so it lands immediately
next to it), and the pair count is O(n·w) by construction.

The hard part at 10^12 rows is the GLOBAL rank itself: the naive
``row_number() OVER (ORDER BY key)`` has an empty partition spec, so
Spark funnels the whole corpus through ONE task. ``global_rank``
instead composes the rank in two distributed levels:

1. ``repartitionByRange`` on the sort key (a distributed range
   shuffle — each partition owns a contiguous key range),
2. ``row_number`` partitioned by ``spark_partition_id()`` (parallel),
3. per-partition row counts (|partitions| rows — driver-trivial)
   cumulated into offsets and broadcast back; global rank =
   partition offset + local row number.

The result is the exact global rank under the given total order,
independent of where the sampled range boundaries fall, because
offset + local position IS the global position. Callers must make the
order total (include a unique id as the last sort column) or ranks of
tied rows would be partition-placement-dependent.

``sorted_neighborhood_pairs`` then reuses the rank-bucket equi-join
from the NIL operator (``operators/nil.py``; VERDICT r02 #2): ranks
bucket by ``w``, the left side probes buckets {b, b+1}, and the
neighborhood predicate prunes AFTER an equi-join that only ever
generated ≤ 2·n·w rows — never the n² a raw range join would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global rank of every row under ``order_cols``
    (which must define a TOTAL order), computed without a
    single-task global window — see module docstring.

    NULL sort keys rank LAST (explicit ``asc_nulls_last``, overriding
    Spark's NULLS-FIRST ascending default): the repo's oracle-parity
    convention, matching DuckDB's ASC default — a nullable sort column
    ranks identically in both engines."""
    parts = (
        num_partitions
        or df.sparkSession.sparkContext.defaultParallelism
    )
    cols = [F.col(c).asc_nulls_last() for c in order_cols]
    d = df.repartitionByRange(parts, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    d = d.withColumn("_rn", F.row_number().over(w))
    sizes = d.groupBy("_pid").agg(F.count("*").alias("_n"))
    # |partitions| rows: the one intentionally tiny single-task window
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sizes.withColumn(
        "_off", F.coalesce(F.sum("_n").over(woff), F.lit(0))
    ).select("_pid", "_off")
    return (
        d.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, F.col("_off") + F.col("_rn"))
        .drop("_pid", "_rn", "_off")
    )


def sorted_neighborhood_pairs(
    records: DataFrame,
    sort_cols: list[str],
    window: int,
    id_col: str = "rec_id",
) -> DataFrame:
    """Candidate pairs (id_a, id_b, dist) with ``dist`` = rank gap in
    1..window under the (sort_cols, id_col) total order; id_a is the
    earlier-ranked record. Pair generation is O(n·window)."""
    r = global_rank(
        records.select(id_col, *sort_cols), [*sort_cols, id_col]
    ).select(id_col, "rank")
    r = r.withColumn(
        "bkt", F.floor((F.col("rank") - F.lit(1)) / F.lit(window))
    )
    a = r.select(
        F.col(id_col).alias("id_a"),
        F.col("rank").alias("rank_a"),
        F.explode(F.array(F.col("bkt"), F.col("bkt") + F.lit(1))).alias(
            "bkt"
        ),
    )
    b = r.select(
        F.col(id_col).alias("id_b"), F.col("rank").alias("rank_b"), "bkt"
    )
    return (
        a.join(b, "bkt")
        .where(
            (F.col("rank_b") > F.col("rank_a"))
            & (F.col("rank_b") <= F.col("rank_a") + window)
        )
        .select(
            "id_a",
            "id_b",
            (F.col("rank_b") - F.col("rank_a")).alias("dist"),
        )
    )
