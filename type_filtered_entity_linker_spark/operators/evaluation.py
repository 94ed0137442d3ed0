"""Distributed evaluation: pairwise P/R/F1 of predicted clusters vs
labeled mention pairs (the BASELINE.json acceptance metric; micro-F1
semantics mirroring the reference's sklearn micro scores,
typerec/model.py:196-211, and the pure-Python oracle
``oracle.pairwise_f1`` — kept in lockstep by a parity test).

Plan: two broadcast-able joins of the labeled pairs against the
clusters table (clusters is the big side at scale, so the labeled
pairs drive the join), then one global aggregation — no collect of
cluster assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_f1_spark(clusters: DataFrame, labeled_pairs: DataFrame) -> DataFrame:
    """clusters (mention_key, cluster_id) × labeled_pairs
    (url_a, mention_id_a, url_b, mention_id_b, same_entity) → one-row DataFrame
    (precision, recall, f1, tp, fp, fn, tn). Pairs whose either side is
    not in the clusters table are skipped (oracle semantics)."""
    lp = labeled_pairs.select(
        F.concat_ws("#", "url_a", F.col("mention_id_a").cast("string")).alias("ka"),
        F.concat_ws("#", "url_b", F.col("mention_id_b").cast("string")).alias("kb"),
        F.col("same_entity").cast("boolean").alias("same"),
    )
    ca = clusters.select(
        F.col("mention_key").alias("ka"), F.col("cluster_id").alias("cid_a")
    )
    cb = clusters.select(
        F.col("mention_key").alias("kb"), F.col("cluster_id").alias("cid_b")
    )
    joined = lp.join(ca, "ka").join(cb, "kb")
    pred = F.col("cid_a") == F.col("cid_b")
    counts = joined.agg(
        F.sum((pred & F.col("same")).cast("long")).alias("tp"),
        F.sum((pred & ~F.col("same")).cast("long")).alias("fp"),
        F.sum((~pred & F.col("same")).cast("long")).alias("fn"),
        F.sum((~pred & ~F.col("same")).cast("long")).alias("tn"),
    ).select(
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("tp", "fp", "fn", "tn")]
    )
    p = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(1.0))
    r = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(F.lit(1.0))
    return counts.select(
        p.alias("precision"), r.alias("recall"), "tp", "fp", "fn", "tn"
    ).select(
        "precision",
        "recall",
        F.when(
            F.col("precision") + F.col("recall") > 0,
            2 * F.col("precision") * F.col("recall")
            / (F.col("precision") + F.col("recall")),
        )
        .otherwise(F.lit(0.0))
        .alias("f1"),
        "tp", "fp", "fn", "tn",
        # guards against a vacuous perfect score: if key formats ever
        # drift the joins go empty and f1 would read 1.0 — consumers
        # must check this is > 0
        (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")).alias(
            "n_pairs_evaluated"
        ),
    )
