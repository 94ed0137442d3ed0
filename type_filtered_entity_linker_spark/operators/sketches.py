"""Mergeable streaming sketches for corpus statistics at 100 TB:
Count-Min (heavy-hitter token counts in fixed memory) and HyperLogLog
(distinct counts per group in 64 registers). Both are the textbook
constructions (Cormode & Muthukrishnan 2005; Flajolet et al. 2007)
re-expressed as hash aggregations whose state IS the sketch:

- CMS state = ``depth × width`` (row, bucket, count) cells. Building it
  is ONE shuffle with map-side partial aggregation — each partition
  collapses its token stream into ≤ depth·width cells before the
  exchange, so shuffle volume is O(depth·width·partitions) regardless
  of corpus size, and merging partitions is count addition (the sketch
  is a linear projection).
- HLL state = per-group max-rank registers. groupBy(group, bucket)
  max(rho) has the same property: partials collapse to ≤ m rows per
  group per partition, merge = max. The estimator is then a tiny
  per-group fold over ≤ m register rows.

Hashing is dual-path, the SimHash ``hash_fn`` convention
(operators/dedup.py): ``md5`` (identical bytes in every engine,
folded to integers) is the ORACLE path — the DuckDB replicas match
the sketches cell-for-cell, not just approximately — and
``xxhash64`` is the PRODUCTION path (JVM intrinsic, no hex-string
round-trip; benched separately, not oracle-replicable since DuckDB
has no compatible xxhash64). The sketch structure is hash-agnostic;
the property tests run both paths.

No UDFs anywhere: hash/conv/bin/explode/groupBy are all JVM codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 256
HLL_M = 64  # registers (p=6)


def _md5_int(col: F.Column, start: int, length: int) -> F.Column:
    """First ``length`` hex chars of md5(col) from ``start`` (1-based)
    as a non-negative long. length ≤ 15 keeps it under 2^60."""
    return F.conv(F.substring(F.md5(col), start, length), 16, 10).cast("long")


def cms_bucket(
    token: F.Column, row: int, width: int = CMS_WIDTH, hash_fn: str = "md5"
) -> F.Column:
    """Row-``row`` bucket of a token: the salted token hashed mod
    width. Independent rows come from the salt prefix. ``md5`` is the
    cross-engine oracle path; ``xxhash64`` the production path (JVM
    intrinsic, no hex-string round-trip) — same trade as SimHash
    ``hash_fn`` (operators/dedup.py)."""
    salted = F.concat(F.lit(f"{row}|"), token)
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(salted), F.lit(width))
    return _md5_int(salted, 1, 8) % width


def cms_build(
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    hash_fn: str = "md5",
) -> DataFrame:
    """Count-Min sketch of a token stream: (row, bucket, cnt), one row
    per non-empty cell. One explode (depth small constant) + one
    partially-aggregated shuffle."""
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                cms_bucket(F.col(token_col), j, width, hash_fn).alias(
                    "bucket"
                ),
            )
            for j in range(depth)
        ]
    )
    return (
        tokens.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    hash_fn: str = "md5",
) -> DataFrame:
    """Point-query the sketch for each row of ``queries``: est =
    min over rows of the addressed cell. The sketch is ≤ depth·width
    rows — broadcast to the probe side; missing cells read 0 (cannot
    happen for tokens that were fed in, but keeps the estimator total).
    CMS guarantee: est ≥ true count always (overestimate-only)."""
    probes = queries.select(
        F.col(token_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        cms_bucket(F.col(token_col), j, width, hash_fn).alias(
                            "bucket"
                        ),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    ).select(token_col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def cms_heavy_hitters(
    docs: DataFrame,
    k: int = 20,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    hash_fn: str = "md5",
) -> DataFrame:
    """Top-k tokens by exact count, annotated with their Count-Min
    estimate and the (always ≥ 0) overestimate — the error a user
    would see running the sketch instead of the exact count. Exact
    counts double as the verification gate; at 100 TB only the sketch
    pass runs and candidate heavy hitters come from per-partition
    local top-k (the standard CMS+heap pattern)."""
    tokens = docs.select(
        F.explode(F.split(F.col(text_col), r"\s+")).alias("token")
    )
    exact = (
        tokens.groupBy("token")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("token"))
        .limit(k)
    )
    sketch = cms_build(tokens, depth=depth, width=width, hash_fn=hash_fn)
    est = cms_estimate(
        sketch, exact.select("token"), depth=depth, width=width, hash_fn=hash_fn
    )
    return (
        exact.join(est, "token")
        .select(
            "token",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overestimate"),
        )
    )


def hll_rho(col: F.Column, hash_fn: str = "md5") -> F.Column:
    """HLL rank: 1 + leading zeros of a 60-bit hash, computed exactly
    in integer/string ops: rho = 61 - len(bin(v)), v = 0 → 61. (bin()
    drops leading zeros in Spark and DuckDB alike, so the
    binary-string length IS 60 minus the leading-zero count.)
    ``xxhash64``: v = the hash's top 60 bits via unsigned shift —
    production path, not oracle-replicable."""
    if hash_fn == "xxhash64":
        v = F.shiftrightunsigned(F.xxhash64(col), 4)
    else:
        v = _md5_int(col, 3, 15)
    return F.when(v == 0, F.lit(61)).otherwise(
        F.lit(61) - F.length(F.bin(v))
    )


def hll_registers(
    items: DataFrame,
    group_col: str,
    item_col: str,
    m: int = HLL_M,
    hash_fn: str = "md5",
) -> DataFrame:
    """(group, bucket, r): max HLL rank per register. The whole sketch
    state — mergeable by max, ≤ m rows per group after the single
    partially-aggregated shuffle."""
    if hash_fn == "xxhash64":
        bucket = F.pmod(F.xxhash64(F.concat(F.lit("b|"), F.col(item_col))), F.lit(m))
    else:
        bucket = _md5_int(F.col(item_col), 1, 2) % m
    return (
        items.select(
            F.col(group_col).alias("grp"),
            bucket.alias("bucket"),
            hll_rho(F.col(item_col), hash_fn).alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(registers: DataFrame, m: int = HLL_M) -> DataFrame:
    """Flajolet et al. estimator over the register table: raw
    E = alpha_m · m² / Σ 2^(−M_j) (absent registers read M_j = 0),
    with the small-range linear-counting correction
    E ≤ 2.5m ∧ zero-registers V > 0 → m·ln(m/V). Per-group fold over
    ≤ m rows — a tiny aggregation."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy("grp").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("s_obs"),
        F.count("*").alias("n_obs"),
    )
    # registers never touched contribute 2^0 = 1 each and count as zeros
    s = F.col("s_obs") + (F.lit(m) - F.col("n_obs"))
    zeros = F.lit(m) - F.col("n_obs")
    raw = F.lit(alpha * m * m) / s
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select("grp", F.round(est, 6).alias("hll_est"))


def hll_distinct(
    items: DataFrame,
    group_col: str,
    item_col: str,
    m: int = HLL_M,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-group distinct-count comparison: exact countDistinct vs the
    HLL estimate, with signed relative error. Exact is the gate; at
    scale only the register pass runs (countDistinct over 10^10 keys
    is itself a two-shuffle expand, the sketch is one)."""
    exact = (
        items.groupBy(F.col(group_col).alias("grp"))
        .agg(F.countDistinct(item_col).alias("exact_distinct"))
    )
    est = hll_estimate(
        hll_registers(items, group_col, item_col, m=m, hash_fn=hash_fn), m=m
    )
    return (
        exact.join(est, "grp")
        .select(
            F.col("grp").alias(group_col),
            "exact_distinct",
            "hll_est",
            F.round(
                (F.col("hll_est") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                6,
            ).alias("rel_err"),
        )
    )
