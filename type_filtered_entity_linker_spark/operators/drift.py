"""Model-drift monitoring for the linkage scorer — the check a
production ER deployment schedules between retrains: has the SCORE
DISTRIBUTION moved between two batches (new corpus slice, upstream
extraction change, seasonal shift)? Population Stability Index over
fixed score bins (the standard scorecard-monitoring statistic;
PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 act), with Laplace
smoothing so empty bins never produce log-of-zero.

Scale shape: two single-pass binned aggregates (map-side combinable)
+ one |bins|-row join — the data is touched once per batch regardless
of size; the PSI arithmetic happens on a bins-sized table."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bin_index_expr(value_col: str, edges: "list[float]"):
    """Column expression mapping a value to its half-open bin index:
    bin 0 = (-inf, edges[0]), bin i = [edges[i-1], edges[i]), last =
    [edges[-1], inf). Shared by the batch histogram and the streaming
    histogram state (streaming/incremental.stream_binned_counts)."""
    e = F.col(value_col)
    idx = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        idx = F.when(e < F.lit(float(edges[i])), F.lit(i)).otherwise(idx)
    return idx


def binned_histogram(
    df: DataFrame, value_col: str, edges: "list[float]"
) -> DataFrame:
    """(bin_idx, cnt) histogram of ``value_col`` under
    ``bin_index_expr``'s bins. NULL values are dropped (they carry no
    score)."""
    return (
        df.where(F.col(value_col).isNotNull())
        .select(bin_index_expr(value_col, edges).alias("bin_idx"))
        .groupBy("bin_idx")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def score_drift_psi(
    batch_a: DataFrame,
    batch_b: DataFrame,
    value_col: str = "score",
    edges: "list[float]" = (0.0, 4.0, 8.0, 12.0, 16.0),
) -> DataFrame:
    """PSI between ``batch_a`` (the reference/expected distribution)
    and ``batch_b`` (the observed one) over ``value_col``: one row per
    bin — (bin_idx, n_a, n_b, p_a, p_b, psi_term) with Laplace-
    smoothed proportions p = (cnt + 1) / (n + bins) and psi_term =
    (p_a - p_b) * ln(p_a / p_b), everything rounded to 6. Every bin
    appears (zero-count bins included), so sum(psi_term) IS the PSI
    and the row count is fixed at len(edges) + 1."""
    edges = list(edges)
    return psi_from_histograms(
        binned_histogram(batch_a, value_col, edges),
        binned_histogram(batch_b, value_col, edges),
        len(edges) + 1,
    )


def psi_from_histograms(
    ha: DataFrame, hb: DataFrame, bins: int
) -> DataFrame:
    """PSI report from two (bin_idx, cnt) histograms (e.g. one batch
    reference + one maintained by the streaming monitor) — the same
    contract as score_drift_psi's output. Totals ride as single-row
    aggregates crossJoined in (the repo's one-row metric fan-in
    shape); no driver-side count() action, the whole PSI is one lazy
    plan over bins-sized inputs."""
    spark = ha.sparkSession
    spine = spark.range(bins).select(F.col("id").cast("int").alias("bin_idx"))
    ha = ha.select("bin_idx", F.col("cnt").alias("ca"))
    hb = hb.select("bin_idx", F.col("cnt").alias("cb"))
    na = ha.agg(F.coalesce(F.sum("ca"), F.lit(0)).cast("long").alias("tot_a"))
    nb = hb.agg(F.coalesce(F.sum("cb"), F.lit(0)).cast("long").alias("tot_b"))
    j = (
        spine.join(ha, "bin_idx", "left")
        .join(hb, "bin_idx", "left")
        .crossJoin(na)
        .crossJoin(nb)
        .select(
            "bin_idx",
            F.coalesce("ca", F.lit(0)).cast("long").alias("n_a"),
            F.coalesce("cb", F.lit(0)).cast("long").alias("n_b"),
            "tot_a",
            "tot_b",
        )
    )
    pa = (F.col("n_a") + 1) / (F.col("tot_a") + F.lit(bins))
    pb = (F.col("n_b") + 1) / (F.col("tot_b") + F.lit(bins))
    return j.select(
        "bin_idx",
        "n_a",
        "n_b",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term"),
    )
