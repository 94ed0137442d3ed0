"""Crawl-frontier scheduling — turning a scored URL frontier into a
politeness-respecting fetch plan (the scheduler half of a Heritrix/
Nutch-style crawler, relationally): each host is a serial queue (you
CANNOT parallelize one host's fetches — politeness is the point), so
the plan is a per-host priority rank and a fetch time = rank * the
host's crawl delay. Cross-host parallelism is unbounded; a viral host
serializes only itself, which is inherent to the problem, not a plan
defect — the per-host window below is therefore the CORRECT shape,
not a skew bug (contrast the global ranks elsewhere, which use the
two-level compose precisely because THEIR order is global).

Scale shape: one window partitioned by host (the politeness queue),
no global sort, no collect."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def schedule_frontier(
    frontier: DataFrame,
    delay: int,
    host_col: str = "host",
    priority_col: str = "priority",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fetch plan for ``frontier`` (id, host, priority): per host,
    URLs rank by (priority DESC, id ASC — a total order), and
    fetch_time = (rank - 1) * ``delay`` seconds. Returns (id, host,
    priority, host_rank, fetch_time)."""
    if delay <= 0:
        raise ValueError("delay must be a positive integer")
    w = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(id_col).asc()
    )
    return frontier.select(
        F.col(id_col),
        F.col(host_col),
        F.col(priority_col),
        F.row_number().over(w).cast("long").alias("host_rank"),
    ).withColumn(
        "fetch_time",
        ((F.col("host_rank") - 1) * F.lit(int(delay))).cast("long"),
    )
