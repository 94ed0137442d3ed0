"""Same-session A/B: bucketed vs unbucketed same-key join.

tests/test_bucketed_join.py pins the PLAN contract (bucketed tables →
SortMergeJoin with zero Exchange); this script measures the
payoff on this box so BENCH/AB_R3.md carries a number, not just a
plan. Both paths run interleaved in ONE process (box noise swings
2.7x across sessions — never compare across runs here), reading the
same rows; the only difference is the storage layout.

The workload is two synthetic url-keyed tables (deterministic
spark.range derivation, no RNG) sized so the join is comfortably
shuffle-bound at local[16]. Reported: median of N interleaved repeats
per path + the ratio. At 100 TB the absolute delta is the point: the
unbucketed path shuffles BOTH fact tables on every repeated join; the
bucketed path shuffles at write time once.
"""

from __future__ import annotations

import json
import shutil
import statistics
import time

from pyspark.sql import functions as F

import sys

sys.path.insert(0, "/root/repo")

from type_filtered_entity_linker_spark.session import spark_session
from type_filtered_entity_linker_spark.sources.tableio import write_bucketed

ROWS = 5_000_000
KEYS = 2_000_000
BUCKETS = 16
REPEATS = 5
BASE = "/tmp/bucket_ab"


def main() -> None:
    shutil.rmtree(BASE, ignore_errors=True)
    spark = spark_session(
        app_name="bucket-ab", master="local[16]", shuffle_partitions=16
    )
    spark.sparkContext.setLogLevel("ERROR")
    # forbid broadcast: at 100 TB neither side of a fact-fact join fits
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    left = spark.range(ROWS).select(
        F.concat(F.lit("https://example.org/p"), (F.col("id") % KEYS)).alias("url"),
        (F.col("id") * 2654435761 % 1000).alias("lang_code"),
    )
    right = spark.range(ROWS).select(
        F.concat(F.lit("https://example.org/p"), (F.col("id") % KEYS)).alias("url"),
        (F.col("id") % 97).alias("n_mentions"),
    )
    # stage BOTH layouts (write cost excluded from the read-side A/B;
    # the bucketed write's one extra shuffle is amortized over every
    # later join — that amortization IS the feature)
    left.write.mode("overwrite").parquet(f"{BASE}/left_flat")
    right.write.mode("overwrite").parquet(f"{BASE}/right_flat")
    write_bucketed(left, "ab_left_b", "url", n_buckets=BUCKETS,
                   path=f"{BASE}/left_b")
    write_bucketed(right, "ab_right_b", "url", n_buckets=BUCKETS,
                   path=f"{BASE}/right_b")

    def run_flat() -> float:
        lf = spark.read.parquet(f"{BASE}/left_flat")
        rf = spark.read.parquet(f"{BASE}/right_flat")
        t0 = time.perf_counter()
        lf.join(rf, "url").groupBy("lang_code").agg(
            F.sum("n_mentions")
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def run_bucketed() -> float:
        lb = spark.table("ab_left_b")
        rb = spark.table("ab_right_b")
        t0 = time.perf_counter()
        lb.join(rb, "url").groupBy("lang_code").agg(
            F.sum("n_mentions")
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    import bench  # box-noise probe (same one bench.py embeds)

    probe_start = bench._box_probe()
    run_flat(); run_bucketed()  # warm-up (page cache + codegen)
    flat, buck = [], []
    for _ in range(REPEATS):  # interleaved: noise hits both paths alike
        flat.append(run_flat())
        buck.append(run_bucketed())
    # headline = median of PER-PAIR ratios: each flat run is paired
    # with the bucketed run seconds later, so a co-tenant noise burst
    # degrades both sides of one ratio instead of mispairing medians
    # taken over runs minutes apart (observed 2.7x swings on this box)
    ratios = [f / b for f, b in zip(flat, buck)]
    out = {
        "rows_per_side": ROWS,
        "avg_key_multiplicity": ROWS / KEYS,
        "buckets": BUCKETS,
        "speedup_median_paired": round(statistics.median(ratios), 3),
        "paired_ratios": [round(r, 3) for r in ratios],
        "flat_secs_median": round(statistics.median(flat), 3),
        "bucketed_secs_median": round(statistics.median(buck), 3),
        "flat_runs": [round(t, 3) for t in flat],
        "bucketed_runs": [round(t, 3) for t in buck],
        "box_probe_start": probe_start,
        "box_probe_end": bench._box_probe(),
    }
    print(json.dumps(out))
    spark.sql("DROP TABLE IF EXISTS ab_left_b")
    spark.sql("DROP TABLE IF EXISTS ab_right_b")


if __name__ == "__main__":
    main()
