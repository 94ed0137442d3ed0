"""10x scale probe for the round-4 ER composites (pipeline CC,
Swoosh, steward loop): synthesize a 10x customer table from sf0.1 by
unioning key-shifted copies and run the real driver queries against
it on local[32].

Copy construction keeps family semantics independent while CREATING
realistic cross-copy skew: keys shift by i*10^7 (so every `% 10`
fixture rule is preserved), names get a per-copy suffix (so no
exact-name rule fires across copies), but the derived phone
(key*7919 mod 10^7) is IDENTICAL across copies by construction —
every phone block grows 10x denser, which is exactly the head-key
stress the blocking stages must absorb (quadratic per-block pair
growth, the Zipf-head shape).

Prints one JSON line; paste into BENCH notes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.session import spark_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("ER_PROBE_COPIES", "10"))
OUT = "/tmp/er_scale_probe_sf"


def build_corpus(spark) -> str:
    if os.path.exists(os.path.join(OUT, "_READY")):
        return OUT
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    parts = []
    for i in range(COPIES):
        parts.append(
            c.select(
                (F.col("c_custkey") + i * 10_000_000).alias("c_custkey"),
                F.concat(
                    F.col("c_name"), F.lit(f"_{i}")
                ).alias("c_name"),
                "c_nationkey",
                "c_acctbal",
                "c_mktsegment",
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(OUT, "customer.parquet")
    )
    # the relational-evidence query also reads orders/lineitem; copy
    # the originals (only copy-0 families gain relational evidence —
    # fine for a timing probe)
    for t in ("orders", "lineitem", "documents"):
        src = f"{SF_DIR}/{t}.parquet"
        dst = os.path.join(OUT, f"{t}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    open(os.path.join(OUT, "_READY"), "w").write("ok")
    return OUT


def main() -> None:
    spark = spark_session(app_name="er-scale-probe")
    from type_filtered_entity_linker_spark.plans.driver_queries import (
        QUERIES,
    )

    sf10 = build_corpus(spark)
    report: dict = {"copies": COPIES, "base_sf": SF_DIR, "queries": {}}
    for name in (
        "er_pipeline_clusters",
        "er_swoosh",
        "er_capture_recapture",
        "er_steward_loop",
        # wave 13/14: the GMD eval replay and the Zipf diagnostic
        # (er_hac is probed separately below at full convergence —
        # the copy construction makes cross-copy A/B names IDENTICAL
        # after truncation, so 10x phone blocks genuinely need ~10x
        # more dendrogram rounds and the driver query's 6-round
        # strict cap would correctly raise)
        "er_gmd",
        "er_zipf_alpha",
    ):
        t = time.time()
        df = QUERIES[name](spark, sf10)
        n = df.count()
        report["queries"][name] = {
            "sec": round(time.time() - t, 2),
            "rows": n,
        }
    # er_hac at FULL convergence (max_rounds high enough for the 10x
    # block depth; strict raise is the contract being honored, not
    # bypassed — a 10x-dense block legitimately needs ~10x rounds):
    from type_filtered_entity_linker_spark.operators.hac import (
        hac_clusters,
    )
    from type_filtered_entity_linker_spark.plans.driver_queries import (
        ER_HAC_THRESHOLD,
        _hac_corpus_pairs,
    )

    for tag, d, rounds in (
        ("er_hac_full", sf10, 4 * COPIES),
        ("er_hac_full_1x", SF_DIR, 8),
    ):
        t = time.time()
        nodes, pairs_df = _hac_corpus_pairs(spark, d)
        n = hac_clusters(
            nodes, pairs_df, threshold=ER_HAC_THRESHOLD, max_rounds=rounds
        ).count()
        report["queries"][tag] = {
            "sec": round(time.time() - t, 2),
            "rows": n,
        }
    hac10 = report["queries"]["er_hac_full"]
    hac10["sec_1x_warm"] = report["queries"].pop("er_hac_full_1x")["sec"]
    hac10["wall_ratio_10x"] = round(
        hac10["sec"] / max(hac10["sec_1x_warm"], 1e-9), 2
    )
    # baseline at 1x for the scale ratio, same session (warm)
    for name in list(report["queries"]):
        if name == "er_hac_full":
            continue
        t = time.time()
        QUERIES[name](spark, SF_DIR).count()
        report["queries"][name]["sec_1x_warm"] = round(time.time() - t, 2)
        report["queries"][name]["wall_ratio_10x"] = round(
            report["queries"][name]["sec"]
            / max(report["queries"][name]["sec_1x_warm"], 1e-9),
            2,
        )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
