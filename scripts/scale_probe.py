"""10x scale probe (verdict r03 item 6): run the flagship linkage
chain and the minhash/ngram dedup family at ~10x the bench fixture on
local[32], and REPORT the scale-relevant internals, not just wall
time:

- DF-cut drop counts (shingle_df_stats on the 10x corpus): how many
  head shingles the posting-list cut removes, and the worst surviving
  posting list;
- salt branch hit rate: how many blocking keys exceeded
  cfg.salt_threshold and what fraction of candidate rows flowed
  through salted keys;
- AQE skew splits: 'skew=true' AQEShuffleRead occurrences in the
  executed adaptive plans of the heavy joins.

Usage: python scripts/scale_probe.py [--pages 25000] [--docs-mult 10]
Prints one JSON line; paste into BENCH/BASELINE.md / BENCH_r{N} notes.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.config import LinkerConfig
from type_filtered_entity_linker_spark.fixtures import (
    INPUT_TABLES,
    make_fixtures,
)
from type_filtered_entity_linker_spark.plans.pipeline import run_pipeline
from type_filtered_entity_linker_spark.session import spark_session


def _exec_final(df) -> tuple[int, int]:
    """Execute df's OWN adaptive plan to completion and return
    (row_count, skew_join_count). ``df.count()`` (and noop writes) run
    a DIFFERENT QueryExecution — their own aggregated plan — leaving
    this DF's adaptive root un-finalized (isFinalPlan=false, which
    never contains skew markers), so the old helper structurally
    reported 0 (code-review r04). An RDD-level count on the adaptive
    root forces getFinalPhysicalPlan(); the finalized string then
    shows ``SortMergeJoin(skew=true)`` / ``AQEShuffleRead … skewed``
    when AQE split skewed partitions (verified empirically on a forced
    90%-one-key join)."""
    qe = df._jdf.queryExecution()
    n = int(qe.executedPlan().execute().count())
    plan = qe.executedPlan().toString()
    assert "isFinalPlan=false" not in plan, "adaptive plan not finalized"
    return n, plan.count("skew=true")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=25000)
    ap.add_argument("--docs-mult", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = spark_session(
        app_name="scale-probe",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"pages": args.pages, "docs_mult": args.docs_mult,
                 "cpus": args.cpus}

    # ---- stage the 10x linkage corpus (untimed; cached across runs)
    stage = f"/tmp/scale_probe_{args.pages}"
    marker = os.path.join(stage, "_STAGED")
    if not os.path.exists(marker):
        shutil.rmtree(stage, ignore_errors=True)
        fx = make_fixtures(
            seed=42, n_pages=args.pages, n_entities=1200,
            head_alias_fanout=900,
        )
        for k in INPUT_TABLES:
            df = spark.createDataFrame(fx[k])
            if k == "pages":
                df = df.repartition(256)
            df.write.mode("overwrite").parquet(os.path.join(stage, k))
        open(marker, "w").write("ok")
    inputs = {
        k: spark.read.parquet(os.path.join(stage, k)) for k in INPUT_TABLES
    }

    # ---- flagship chain e2e at 10x (warm a small slice first)
    cfg = LinkerConfig()
    wd = "/dev/shm/scale_probe_wd"
    shutil.rmtree(wd + "_warm", ignore_errors=True)
    run_pipeline(
        spark, dict(inputs, pages=inputs["pages"].limit(200)),
        wd + "_warm", cfg, resume=False,
    )
    shutil.rmtree(wd, ignore_errors=True)
    t0 = time.perf_counter()
    res = run_pipeline(spark, inputs, wd, cfg, resume=False)
    out["linkage_e2e_secs"] = round(time.perf_counter() - t0, 2)
    out["pipeline_stage_secs"] = {m["stage"]: m["secs"] for m in res.metrics}
    out["pipeline_stage_rows"] = {m["stage"]: m["rows"] for m in res.metrics}
    stage_rows = out["pipeline_stage_rows"]
    out["pairs_scored_per_sec"] = round(
        stage_rows["scored"] / max(out["pipeline_stage_secs"]["scored"], 1e-9)
    )

    # salt branch hit rate: keys above cfg.salt_threshold by dict
    # fanout x mention count, and the candidate-row share they carry
    ali = inputs["entity_aliases"].groupBy(
        F.col("alias_norm").alias("k")
    ).agg(F.count("*").alias("fan"))
    men = res.mentions.groupBy(F.col("sf_norm").alias("k")).agg(
        F.count("*").alias("nm")
    )
    per_key = men.join(ali, "k").select(
        "k", (F.col("nm") * F.col("fan")).alias("rows"), "fan"
    )
    tot = per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("rows").alias("cand_rows"),
        F.sum(F.when(F.col("fan") > cfg.salt_threshold, F.col("rows"))
              .otherwise(0)).alias("salted_rows"),
        F.sum((F.col("fan") > cfg.salt_threshold).cast("int")).alias(
            "salted_keys"),
    ).first()
    out["salt"] = {
        "threshold": cfg.salt_threshold,
        "n_keys": tot["n_keys"],
        "salted_keys": tot["salted_keys"],
        "candidate_rows": int(tot["cand_rows"] or 0),
        "salted_row_share": round(
            (tot["salted_rows"] or 0) / max(tot["cand_rows"] or 1, 1), 4
        ),
    }

    # AQE skew splits in a FRESH candidate join (res.candidates is
    # persisted, so executing its plan would just scan the cache and
    # could never show join-level skew handling) — untimed rerun of
    # the blocking join with its own finalized adaptive plan
    from type_filtered_entity_linker_spark.operators.blocking import (
        generate_candidates,
    )

    cand_rows, cand_skew = _exec_final(
        generate_candidates(res.mentions, inputs["entity_aliases"], cfg)
    )
    out["aqe_skew_splits_candidates"] = cand_skew
    out["candidate_join_rows"] = cand_rows

    # ---- dedup family at docs_mult x documents
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            # copy 0 keeps the text verbatim; others get one appended
            # token -> 10-member NEAR-dup clusters (J just under 1),
            # the shape LSH must catch and CC must fold
            (F.col("text") if i == 0
             else F.concat("text", F.lit(f" v{i}"))).alias("text"),
        )
        for i in range(args.docs_mult)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big = big.repartition(args.cpus * 4).persist()
    out["docs_rows"] = big.count()

    from type_filtered_entity_linker_spark.operators.dedup import (
        near_duplicates_minhash,
        near_duplicates_ngram,
        near_duplicates_simhash,
        shingle_df_stats,
    )

    stats = shingle_df_stats(big).first().asDict()
    out["df_cut"] = {k: int(v) if v is not None else None
                     for k, v in stats.items()}

    # timing uses the same count() action as the ngram/simhash rows
    # below (comparable within the family and across rounds); the
    # skew-metric pass re-executes UNTIMED via _exec_final, because a
    # full-row RDD materialization costs more than the count-only plan
    # and would bias the family comparison (code-review r04)
    t0 = time.perf_counter()
    pairs = near_duplicates_minhash(big, threshold=0.8)
    out["dedup_minhash_pairs"] = pairs.count()
    out["dedup_minhash_secs"] = round(time.perf_counter() - t0, 2)
    _, out["aqe_skew_splits_minhash"] = _exec_final(pairs)

    t0 = time.perf_counter()
    ng = near_duplicates_ngram(big, threshold=0.8)
    out["dedup_ngram_pairs"] = ng.count()
    out["dedup_ngram_secs"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    sh = near_duplicates_simhash(big, max_hamming=6)
    out["dedup_simhash_pairs"] = sh.count()
    out["dedup_simhash_secs"] = round(time.perf_counter() - t0, 2)

    big.unpersist()
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
