"""Round-5 A/B adjudication for the two un-adjudicated r4 bench deltas
(VERDICT r04 "What's wrong" #1):

1. ``embed_kmeans`` 2.30 s (r3) -> 5.39 s (r4). Code archaeology first
   (recorded in BENCH/R5_NOTES.md): `operators/kmeans.py`,
   `q_embed_kmeans`, and `_el_base` are byte-identical between the two
   bench revisions (git diff 58f8dea..68f9785 is empty for all three),
   the HEADLINE prefix before it is identical (position 45, same 45
   predecessors), and the query's only input is a direct parquet read
   (no `_el_base` memo dependency that eviction could have perturbed).
   The only remaining hypothesis is box state, which this script tests
   by the house method: interleaved same-session repeats, memo-busted
   so every repeat pays the full first-build cost bench times.

2. The salted(2.39) > unsalted(2.11) inversion in the same r4 slot
   (r3 measured salted 1.43 < unsalted 1.81). Same synthetic Zipf-head
   stress as bench._salt_evidence, but interleaved U,S,U,S,... so
   co-tenant drift hits both variants equally.

Prints one JSON line: all repeats, medians, box probes at both ends.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import _box_probe, _noop_write
from type_filtered_entity_linker_spark.config import LinkerConfig
from type_filtered_entity_linker_spark.operators.blocking import (
    generate_candidates,
)
from type_filtered_entity_linker_spark.plans import driver_queries as dq
from type_filtered_entity_linker_spark.session import spark_session


def _bust_kmeans_memo() -> None:
    for key in [k for k in dq._EL_BASE_CACHE if k[0] == "embed_kmeans_assigned"]:
        dq._EL_BASE_CACHE.pop(key)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rounds = int(os.environ.get("AB_ROUNDS", "5"))
    spark = spark_session(
        app_name=f"ab-r5-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    probe_start = _box_probe()

    # session warm-up identical in spirit to bench.py: python workers,
    # codegen, parquet footer cache
    _noop_write(dq.QUERIES["token_count"](spark, sf_dir))

    # --- salt fixture (same shape as bench._salt_evidence) --------------
    n_head_m, n_tail, fanout = 5000, 50000, 2000
    skew_mentions = (
        spark.range(n_head_m + n_tail)
        .select(
            F.concat(F.lit("u"), F.col("id")).alias("url"),
            F.lit(0).cast("int").alias("mention_id"),
            F.when(F.col("id") < n_head_m, F.lit("head key"))
            .otherwise(F.concat(F.lit("sf"), F.col("id")))
            .alias("sf_norm"),
            F.lit("OTHER").alias("ner_type"),
        )
        .localCheckpoint(eager=True)
    )
    skew_dict = (
        spark.range(fanout)
        .select(
            F.lit("head key").alias("alias_norm"),
            F.concat(F.lit("Q"), F.col("id")).alias("item_id"),
        )
        .union(
            spark.range(n_tail).select(
                F.concat(F.lit("sf"), F.col("id")),
                F.concat(F.lit("Qt"), F.col("id")),
            )
        )
        .localCheckpoint(eager=True)
    )
    for c in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ):
        spark.conf.set(c, "-1")
    unsalted_cfg = LinkerConfig(salt_threshold=1 << 30)
    salted_cfg = LinkerConfig()
    # one untimed warm of each plan shape (bench does the same)
    _noop_write(generate_candidates(skew_mentions, skew_dict, unsalted_cfg))
    _noop_write(generate_candidates(skew_mentions, skew_dict, salted_cfg))

    runs: dict[str, list[float]] = {
        "embed_kmeans": [],
        "blocking_join_unsalted": [],
        "blocking_join_salted": [],
    }
    for _ in range(rounds):
        _bust_kmeans_memo()
        t0 = time.perf_counter()
        _noop_write(dq.QUERIES["embed_kmeans"](spark, sf_dir))
        runs["embed_kmeans"].append(round(time.perf_counter() - t0, 3))

        t0 = time.perf_counter()
        _noop_write(generate_candidates(skew_mentions, skew_dict, unsalted_cfg))
        runs["blocking_join_unsalted"].append(
            round(time.perf_counter() - t0, 3)
        )
        t0 = time.perf_counter()
        _noop_write(generate_candidates(skew_mentions, skew_dict, salted_cfg))
        runs["blocking_join_salted"].append(round(time.perf_counter() - t0, 3))

    out = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "rounds": rounds,
        "runs": runs,
        "medians": {k: statistics.median(v) for k, v in runs.items()},
        "r3_bench": {
            "embed_kmeans": 2.295,
            "blocking_join_unsalted": 1.813,
            "blocking_join_salted": 1.427,
        },
        "r4_bench": {
            "embed_kmeans": 5.39,
            "blocking_join_unsalted": 2.105,
            "blocking_join_salted": 2.394,
        },
        "box_probe_start": probe_start,
        "box_probe_end": _box_probe(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
