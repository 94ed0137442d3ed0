"""Same-session A/B for the two unexplained round-2 bench regressions
(VERDICT r02 #2): `media_features` (+138% r1→r2 with UNCHANGED operator
code) and the linkage pipeline / mentions stage (+15% / +138% after the
r2 join-based detector replaced the r1 driver-collected one).

Method: ONE Spark session, alternating interleaved repeats (variant A,
variant B, A, B, ...) so co-tenant drift hits both variants equally —
the only way this box supports a code-vs-noise attribution (observed
2.7x single-shot swings across sessions).

- media_features has no code variant (unchanged since r1): repeats
  characterize in-session variance; if the spread covers the r1 number,
  the r2 regression was box noise.
- the pipeline runs detector='join' (r2 design, web-scale default) vs
  detector='collected' (r1 design, broadcast-set fast path) — same
  outputs (parity-tested), different plans.

Prints one JSON line with all repeats + medians.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_ENTITIES, BENCH_FILLER, BENCH_PAGES, _noop_write
from type_filtered_entity_linker_spark.config import LinkerConfig
from type_filtered_entity_linker_spark.fixtures import INPUT_TABLES, make_fixtures
from type_filtered_entity_linker_spark.plans.driver_queries import QUERIES
from type_filtered_entity_linker_spark.plans.pipeline import run_pipeline
from type_filtered_entity_linker_spark.session import spark_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    spark = spark_session(
        app_name=f"ab-r3-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- stage the fixture corpus exactly like bench.py ------------------
    import hashlib

    import type_filtered_entity_linker_spark.fixtures as _fx_mod

    with open(_fx_mod.__file__, "rb") as f:
        fx_src_hash = hashlib.md5(f.read()).hexdigest()[:10]
    stage_dir = (
        f"/tmp/bench_fixtures_{BENCH_PAGES}_{BENCH_ENTITIES}_{BENCH_FILLER}"
        f"_{fx_src_hash}"
    )
    marker = os.path.join(stage_dir, "_STAGED")
    if not os.path.exists(marker):
        shutil.rmtree(stage_dir, ignore_errors=True)
        fx = make_fixtures(
            seed=42, n_pages=BENCH_PAGES, n_entities=BENCH_ENTITIES,
            head_alias_fanout=900, page_filler_tokens=BENCH_FILLER,
        )
        for k in INPUT_TABLES:
            df = spark.createDataFrame(fx[k])
            if k == "pages":
                df = df.repartition(128)
            df.write.mode("overwrite").parquet(os.path.join(stage_dir, k))
        with open(marker, "w") as f:
            f.write("ok")
    inputs = {
        k: spark.read.parquet(os.path.join(stage_dir, k))
        for k in INPUT_TABLES
    }

    # --- warm-up: codegen + python workers for both shapes ---------------
    _noop_write(QUERIES["media_features"](spark, sf_dir))
    wd_base = os.environ.get("BENCH_WD_BASE", "/dev/shm") + f"/ab_wd_{cpus}"
    warm_inputs = dict(inputs, pages=inputs["pages"].limit(200))
    for det in ("join", "collected"):
        shutil.rmtree(f"{wd_base}_warm_{det}", ignore_errors=True)
        run_pipeline(
            spark, warm_inputs, f"{wd_base}_warm_{det}",
            LinkerConfig(detector=det), resume=False,
        )

    out: dict = {"media_features": [], "pipeline": {"join": [], "collected": []},
                 "mentions_stage": {"join": [], "collected": []}}
    for r in range(rounds):
        t0 = time.perf_counter()
        _noop_write(QUERIES["media_features"](spark, sf_dir))
        out["media_features"].append(round(time.perf_counter() - t0, 3))
        for det in ("join", "collected"):
            wd = f"{wd_base}_{det}_{r}"
            shutil.rmtree(wd, ignore_errors=True)
            t0 = time.perf_counter()
            res = run_pipeline(
                spark, inputs, wd, LinkerConfig(detector=det), resume=False
            )
            out["pipeline"][det].append(round(time.perf_counter() - t0, 3))
            stage = {m["stage"]: m for m in res.metrics}
            out["mentions_stage"][det].append(stage["mentions"]["secs"])
            shutil.rmtree(wd, ignore_errors=True)
        print(
            f"round {r + 1}/{rounds}: media {out['media_features'][-1]}s, "
            f"e2e join {out['pipeline']['join'][-1]}s "
            f"(mentions {out['mentions_stage']['join'][-1]}s), "
            f"collected {out['pipeline']['collected'][-1]}s "
            f"(mentions {out['mentions_stage']['collected'][-1]}s)",
            file=sys.stderr,
        )

    def med(xs):
        return sorted(xs)[len(xs) // 2]

    out["medians"] = {
        "media_features": med(out["media_features"]),
        "pipeline_join": med(out["pipeline"]["join"]),
        "pipeline_collected": med(out["pipeline"]["collected"]),
        "mentions_join": med(out["mentions_stage"]["join"]),
        "mentions_collected": med(out["mentions_stage"]["collected"]),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
