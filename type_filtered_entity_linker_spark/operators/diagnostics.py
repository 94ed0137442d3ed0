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
        # f·(f−1) is always even, so the right-shift is exact; staying
        # in bigint the whole way keeps the "exact pair predictor"
        # claim honest past 2^53 (advice r03: `/ 2` is double division)
        F.coalesce(
            F.sum(F.shiftright(F.col("fanout") * (F.col("fanout") - 1), 1)),
            F.lit(0),
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


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    n_buckets: int = 64,
) -> DataFrame:
    """Mergeable histogram quantile sketch — the scale path for
    percentiles. Exact ``percentile`` buffers per-value counts; at
    10^12 rows the mergeable alternative is a FIXED-width histogram:
    one (min, max) aggregate, one bucket-count aggregate (both
    partial-agg, merge = add), then nearest-rank + uniform-in-bucket
    interpolation over the ≤ n_buckets cumulative rows. Error is
    bounded by bucket width — and this operator MEASURES it: each
    output row carries the sketch estimate, the exact percentile, and
    the absolute error, so the n_buckets dial is tuned against data,
    not guessed (same measured-not-asserted contract as the ANN/
    MinHash recall gates).

    Returns one row per q: (q, hist_est, exact_pctl, abs_err)."""
    from pyspark.sql import Window

    bounds = df.agg(
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
        F.count("*").alias("n"),
    )
    # hi == lo (constant column) guard: the bucket divisor is 0 there
    # (NULL in non-ANSI Spark, engine-dependent in DuckDB) — pin every
    # row to bucket 0; the estimate then degenerates to exactly lo
    # because the interpolation width (hi-lo)/n_buckets is 0 (advice r03)
    b = df.crossJoin(F.broadcast(bounds)).select(
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col(value_col) - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / n_buckets)
                ),
                F.lit(n_buckets - 1),
            )
        )
        .alias("bucket")
    )
    hist = b.groupBy("bucket").agg(F.count("*").alias("cnt"))
    wcum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        "bucket",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
    )
    qdf = df.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    # nearest-rank target k = ceil(q*n); first bucket with cum >= k
    j = (
        qdf.crossJoin(F.broadcast(bounds))
        .crossJoin(F.broadcast(cum))
        .withColumn("k", F.ceil(F.col("q") * F.col("n")))
        .where(F.col("cum") >= F.col("k"))
    )
    wfirst = Window.partitionBy("q").orderBy("bucket")
    first = j.withColumn("_rn", F.row_number().over(wfirst)).where(
        F.col("_rn") == 1
    )
    width = (F.col("hi") - F.col("lo")) / n_buckets
    est = (
        F.col("lo")
        + F.col("bucket") * width
        + ((F.col("k") - (F.col("cum") - F.col("cnt"))) / F.col("cnt")) * width
    )
    exact = df.agg(
        *[
            F.round(F.percentile(F.col(value_col), F.lit(float(q))), 6).alias(
                f"p{i}"
            )
            for i, q in enumerate(qs)
        ]
    )
    exact_long = exact.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(q)).alias("q"),
                        F.col(f"p{i}").alias("exact_pctl"),
                    )
                    for i, q in enumerate(qs)
                ]
            )
        ).alias("e")
    ).select(F.col("e.q").alias("q"), F.col("e.exact_pctl").alias("exact_pctl"))
    return (
        first.select("q", F.round(est, 6).alias("hist_est"))
        .join(exact_long, "q")
        .select(
            "q",
            "hist_est",
            "exact_pctl",
            F.round(F.abs(F.col("hist_est") - F.col("exact_pctl")), 6).alias(
                "abs_err"
            ),
        )
    )


def powerlaw_alpha(
    df: DataFrame, size_col: str, xmin: int = 2
) -> DataFrame:
    """Power-law (Zipf) exponent MLE over a size distribution — the
    quantitative justification for every skew mitigation in this repo.
    "The blocking key is Zipf-headed" stops being an assertion and
    becomes a measured exponent: the continuous-approximation MLE of
    Clauset, Shalizi & Newman (SIAM Rev. 2009, eq. 3.7) over all
    sizes ≥ xmin,

        α̂ = 1 + n_tail / Σ ln(x_i / (xmin − 0.5))

    (the −0.5 is the paper's discreteness correction). α̂ near 2 means
    the head key dominates pair generation quadratically (salt NOW);
    α̂ ≥ 3 means the head is tame enough that AQE alone usually copes.

    Also reports the concrete planning numbers a 100 TB run needs
    next to the exponent: the self-join pairs the whole distribution
    would generate, and the share of those pairs owned by the single
    largest key (the quantity salting actually attacks).

    ONE aggregation over the (already aggregated) size table — at
    10^12 records the input here is the per-key fanout table, orders
    of magnitude smaller than the corpus. Float caveat: the Σ ln(·)
    sum is order-dependent in the last bits; the house round(…, 6)
    absorbs it (same convention as the NMI/entropy metrics)."""
    from .evaluation import comb2

    x = F.col(size_col).cast("double")
    agg = df.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum(F.when(F.col(size_col) >= xmin, 1).otherwise(0))
        .cast("long")
        .alias("n_tail"),
        F.sum(
            F.when(
                F.col(size_col) >= xmin, F.log(x / (xmin - 0.5))
            ).otherwise(0.0)
        ).alias("lnsum"),
        F.max(F.col(size_col)).cast("long").alias("max_size"),
        # comb2: the canonical bigint C(n,2) — an int32 size column
        # with a >46341-member head key would overflow a same-type
        # multiply (code-review w15)
        F.coalesce(F.sum(comb2(size_col)), F.lit(0))
        .cast("long")
        .alias("selfjoin_pairs"),
        F.coalesce(F.max(comb2(size_col)), F.lit(0))
        .cast("long")
        .alias("max_key_pairs"),
    )
    return agg.select(
        "n_keys",
        F.lit(xmin).cast("long").alias("xmin"),
        "n_tail",
        F.round(
            F.when(
                F.col("lnsum") > 0,
                F.lit(1.0) + F.col("n_tail") / F.col("lnsum"),
            ),
            6,
        ).alias("alpha"),
        "max_size",
        "selfjoin_pairs",
        F.round(
            F.when(
                F.col("selfjoin_pairs") > 0,
                F.col("max_key_pairs") / F.col("selfjoin_pairs"),
            ).otherwise(0.0),
            6,
        ).alias("top_key_pair_share"),
    )


def robust_anomalies(
    df: DataFrame,
    key_cols: "list[str]",
    slot_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Median/MAD robust outlier detection per key — the monitoring
    primitive for per-entity time series (a user's hourly event
    counts, a host's daily crawl volume): a slot is anomalous when
    its robust z-score |x − median| / (1.4826·MAD) exceeds ``k``.
    Median+MAD instead of mean+stddev because the contaminated slots
    this exists to find would otherwise inflate their own yardstick
    (the classic breakdown-point argument; 1.4826 rescales MAD to σ
    under normality).

    Degenerate-scale contract: when a key's MAD is 0 (over half its
    slots share one value) robust_z is NULL and a slot is anomalous
    iff it deviates from the median AT ALL — the strictest consistent
    reading, and deterministic in both engines.

    Shape: two median aggregates per key (Spark median == DuckDB
    median: interpolating, double) joined back — three key-partitioned
    shuffles total, no window sort. Returns key_cols + (slot_col,
    value, med, mad, robust_z [6dp, NULL at MAD 0], is_anomaly).
    """
    vals = df.select(
        *key_cols, F.col(slot_col), F.col(value_col).alias("value")
    )
    med = vals.groupBy(*key_cols).agg(F.median("value").alias("med"))
    j = vals.join(med, key_cols)
    mad = (
        j.select(*key_cols, F.abs(F.col("value") - F.col("med")).alias("d"))
        .groupBy(*key_cols)
        .agg(F.median("d").alias("mad"))
    )
    z = (F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad"))
    return j.join(mad, key_cols).select(
        *key_cols,
        slot_col,
        "value",
        "med",
        "mad",
        F.when(F.col("mad") > 0, F.round(z, 6)).alias("robust_z"),
        F.when(
            F.col("mad") > 0, F.abs(z) > F.lit(float(k))
        )
        .otherwise(F.col("value") != F.col("med"))
        .alias("is_anomaly"),
    )


def cusum_anomalies(
    df: DataFrame,
    key_cols: "list[str]",
    slot_col: str,
    value_col: str,
    slack_k: float = 0.5,
    threshold_h: float = 4.0,
) -> DataFrame:
    """One-sided CUSUM level-shift detection per key — the monitoring
    complement to robust_anomalies: a robust-z flags single spikes,
    CUSUM accumulates SMALL sustained drifts (a host slowly turning
    into a spam farm, a sensor drifting) that never individually cross
    a z threshold. Textbook recursion S_i = max(0, S_{i-1} + (x_i − μ
    − kσ)), alarm when S_i > hσ.

    Relational closed form (no sequential recursion): with
    P_i = Σ_{j≤i} (x_j − μ − kσ) an ordered prefix sum and P_0 = 0,
    S_i = P_i − min(0, min_{j≤i} P_j) — two ordered windows per key
    partition, both accumulate in ORDER BY order in every engine, so
    the float sequence (and the alarm decision) is engine-identical.
    μ and σ come from the exact integer moments (n, Σx, Σx²) via
    σ² = (Σx² − (Σx)²/n)/n evaluated in DOUBLE — both engines divide
    the same exact integers (the robust_anomalies convention), never
    a distributed stddev whose partial-merge order could differ.

    Scale shape: the moments are FULL-PARTITION window aggregates over
    the same key partitioning the ordered windows use — one scan of
    the input, ONE key exchange reused by every window (a separate
    moments groupBy + join would scan the input lineage twice; plan
    audit r5). Returns key cols + (slot, value, cusum [6dp],
    sigma [6dp], is_alarm)."""
    from pyspark.sql import Window

    wk = Window.partitionBy(*key_cols)
    n_ = F.count(F.lit(1)).over(wk).cast("long").cast("double")
    s_ = F.sum(F.col(value_col)).over(wk).cast("long").cast("double")
    ss_ = (
        F.sum(F.col(value_col) * F.col(value_col))
        .over(wk)
        .cast("long")
        .cast("double")
    )
    mean = s_ / n_
    var = (ss_ - s_ * s_ / n_) / n_
    # guard float residue: a constant series' var can be -1e-13
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(slot_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = df.withColumn("_sigma", sigma).withColumn(
        "_dev",
        F.col(value_col).cast("double") - mean - F.lit(slack_k) * sigma,
    )
    p = p.withColumn("_p", F.sum("_dev").over(w))
    s = p.withColumn(
        "_cusum",
        F.col("_p") - F.least(F.lit(0.0), F.min("_p").over(w)),
    )
    return s.select(
        *key_cols,
        F.col(slot_col),
        F.col(value_col).alias("value"),
        F.round("_cusum", 6).alias("cusum"),
        F.round("_sigma", 6).alias("sigma"),
        (
            (F.col("_sigma") > 0)
            & (F.col("_cusum") > F.lit(threshold_h) * F.col("_sigma"))
        ).alias("is_alarm"),
    )
