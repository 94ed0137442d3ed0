"""Progressive (pay-as-you-go) entity resolution: order the candidate
comparisons so that TRUE matches surface as early as possible, and
report how much recall each slice of the comparison budget buys
(Whang, Marmaros & Garcia-Molina, "Pay-As-You-Go Entity Resolution",
TKDE 2013; Papenbrock, Heise & Naumann, "Progressive Duplicate
Detection", TKDE 2015).

At 10^12 documents nobody runs the full candidate set through the
expensive scorer in one shot — the schedule IS the product: rank pairs
by a cheap proxy similarity, hand the scorer the best decile first,
and stop when the marginal recall flattens. This operator produces
that decision curve: cumulative pairs vs cumulative truth recall per
budget bucket, on labeled data — the chart that justifies (or kills)
an early-stopping threshold.

Scale shape: the ranking uses sorted_neighborhood.global_rank — the
exact two-level distributed rank (range shuffle + per-partition
row_number + offset compose), NEVER a single-task global window. The
bucket roll-up reduces the corpus to ``n_buckets`` rows; the cumsum
window over those rows is driver-trivial by construction (the
"intentionally tiny" window class, see operators/evaluation.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sorted_neighborhood import global_rank


def progressive_recall_curve(
    pairs: DataFrame,
    proxy_col: str = "proxy",
    truth_col: str = "is_true",
    order_cols: "list[str] | None" = None,
    n_buckets: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Cumulative truth recall per comparison-budget bucket.

    ``pairs`` carries one row per candidate comparison with a cheap
    ``proxy_col`` similarity (higher = compare sooner) and a boolean
    ``truth_col``; ``order_cols`` (default [id_a, id_b]) break proxy
    ties to a total order so bucket boundaries are deterministic.

    Returns EXACTLY ``n_buckets`` rows — a bucket spine left-joins the
    per-bucket aggregates, so inputs with fewer pairs than buckets
    yield empty buckets that CARRY the cumulative value forward
    instead of leaving holes in the curve — (bucket, n_pairs_cum,
    n_true_cum, recall_cum) where recall_cum is against ALL truth
    pairs in the input. A perfectly progressive schedule reaches
    recall 1.0 in the first buckets; the diagonal means the proxy is
    uninformative.
    """
    order_cols = order_cols or ["id_a", "id_b"]
    d = pairs.withColumn("_negp", -F.col(proxy_col))
    ranked = global_rank(d, ["_negp", *order_cols], rank_col="_rank")
    totals = pairs.agg(
        F.count("*").cast("long").alias("_total"),
        F.sum(F.col(truth_col).cast("long")).cast("long").alias("_true"),
    )
    b = (
        ranked.crossJoin(F.broadcast(totals))
        .withColumn(
            "bucket",
            (
                F.floor(
                    (F.col("_rank") - 1) * n_buckets / F.col("_total")
                )
                + 1
            ).cast("long"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(F.col(truth_col).cast("long")).cast("long").alias("n_true"),
        )
    )
    spine = (
        pairs.sparkSession.range(1, n_buckets + 1)
        .select(F.col("id").alias("bucket"))
        .crossJoin(F.broadcast(totals))
    )
    b = spine.join(b, "bucket", "left").select(
        "bucket",
        F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
        F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
        "_true",
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return b.select(
        "bucket",
        F.sum("n_pairs").over(w).cast("long").alias("n_pairs_cum"),
        F.sum("n_true").over(w).cast("long").alias("n_true_cum"),
        F.round(
            F.sum("n_true").over(w) / F.col("_true"), round_to
        ).alias("recall_cum"),
    )
