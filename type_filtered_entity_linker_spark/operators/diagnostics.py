"""Shuffle-key skew diagnostics — the measurement that belongs BEFORE
every big join/groupBy at 100 TB. Every skew mitigation in this repo
(salted blocking keys, DF-cut, block purging, rank-bucketed NIL
neighborhoods, two-phase domain caps) is justified by a fanout
distribution; this operator computes that distribution's summary
cheaply so the decision is measured, not guessed:

- per-key fanout = ONE partially-aggregated shuffle (the same cost
  profile as the groupBy being diagnosed, minus its payload),
- ``selfjoin_pairs`` = Σ f·(f−1)/2 — the exact row count a self-join
  on this key would generate, i.e. the quadratic-blowup predictor,
  computed from the fanout aggregate WITHOUT materializing any pair,
- exact p50/p99 fanout percentiles (Spark ``percentile`` ≡ DuckDB
  ``quantile_cont``, the established oracle-parity pair; swap in
  ``percentile_approx`` at 10^12 keys),
- the top-N heaviest keys via TakeOrdered (per-partition heap, no
  global sort), each annotated with its share of all rows.

Output: ``top_n`` rows — one per heavy key — with the global summary
columns repeated on each (a broadcast of the 1-row aggregate), so one
query answers both "is this key skewed?" and "which values are the
head?".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_stats(
    df: DataFrame, key_cols: list[str], top_n: int = 5
) -> DataFrame:
    fan = df.groupBy(*key_cols).agg(F.count("*").alias("fanout"))
    summary = fan.agg(
        F.sum("fanout").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("fanout").alias("max_fanout"),
        F.round(F.avg("fanout"), 6).alias("mean_fanout"),
        F.round(F.percentile(F.col("fanout"), F.lit(0.5)), 4).alias(
            "p50_fanout"
        ),
        F.round(F.percentile(F.col("fanout"), F.lit(0.99)), 4).alias(
            "p99_fanout"
        ),
        F.coalesce(
            F.sum(F.col("fanout") * (F.col("fanout") - 1) / 2), F.lit(0.0)
        )
        .cast("bigint")
        .alias("selfjoin_pairs"),
    )
    top = fan.orderBy(
        F.desc("fanout"), *[F.asc(c) for c in key_cols]
    ).limit(top_n)
    return top.crossJoin(F.broadcast(summary)).select(
        *key_cols,
        "fanout",
        F.round(F.col("fanout") / F.col("n_rows"), 6).alias("key_share"),
        "n_rows",
        "n_keys",
        "max_fanout",
        "mean_fanout",
        "p50_fanout",
        "p99_fanout",
        "selfjoin_pairs",
    )
