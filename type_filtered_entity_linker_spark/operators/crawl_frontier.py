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


def robots_filter(
    frontier: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Robots-policy audit of a URL frontier — the crawl-side
    counterpart of the politeness scheduler: ``rules`` is the parsed
    robots.txt table (host, disallow_prefix — one row per Disallow
    line, prefix semantics per the robots.txt de-facto standard), and
    every frontier row comes back with ``allowed`` = 0 iff ANY of its
    host's prefixes matches the URL path. An audit column rather than
    a silent filter: curation reviews the blocked set before dropping
    it (same philosophy as the quality gate's pass flags).

    Hosts with no rules are fully allowed (LEFT join). Empty-string
    prefixes are ignored (an empty Disallow line means allow-all in
    robots.txt). Scale shape: one host-keyed join (rules tables are
    small — broadcast) + one (id, host, path)-keyed aggregate; no UDF,
    prefix test is a codegen startswith."""
    r = rules.where(
        F.col("disallow_prefix").isNotNull()
        & (F.col("disallow_prefix") != "")
    ).select(
        F.col(host_col).alias("_rh"), F.col("disallow_prefix").alias("_rp")
    )
    j = frontier.join(
        r, frontier[host_col] == F.col("_rh"), "left"
    ).withColumn(
        "_hit",
        F.when(
            F.col("_rp").isNotNull()
            & F.col(path_col).startswith(F.col("_rp")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    keys = [c for c in frontier.columns]
    return (
        j.groupBy(*keys)
        .agg(
            (F.lit(1) - F.max("_hit")).cast("int").alias("allowed")
        )
    )
