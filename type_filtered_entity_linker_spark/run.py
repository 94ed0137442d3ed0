"""Cluster entry point: ``spark-submit --py-files pkg.zip run.py ...``.

The reference's CLI driver (run.py:13-52 builds a doc, configures the
linker, prints links) becomes a job submitter: read or synthesize the
pages table + dictionaries, run the checkpointed pipeline, write
clusters/links/metrics under --workdir, print a one-line JSON summary.

On a real cluster the session comes from spark-submit's conf (master,
executor counts); standalone invocation falls back to local[*]. See
scripts/submit.sh for the packaging recipe.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="type-filtered entity linkage job")
    p.add_argument("--input-dir", help="directory of parquet inputs "
                   "(pages/, gazetteer/, entity_aliases/, entity_types/, "
                   "type_closure/, entity_embeddings/, entities/); "
                   "omit to synthesize the seeded fixture corpus")
    p.add_argument("--workdir", required=True, help="checkpoint + output dir")
    p.add_argument("--n-pages", type=int, default=2000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no-resume", action="store_true",
                   help="recompute every stage even if checkpointed")
    p.add_argument("--filter-mode", default="rule",
                   choices=["rule", "model", "span", "none"])
    p.add_argument("--scorer-head", default="cosine",
                   choices=["cosine", "mlp"])
    p.add_argument("--task", default="a2kb", choices=["a2kb", "d2kb"],
                   help="a2kb detects mentions; d2kb links pre-marked "
                   "spans from <input-dir>/premarked_mentions")
    p.add_argument("--pages-warc",
                   help="ingest the pages table from WARC files at this "
                   "path/glob instead of parquet (raw-crawl boundary; "
                   "dictionaries still come from --input-dir or the "
                   "fixture)")
    p.add_argument("--pages-warc-lang",
                   help="stamp this lang on WARC-ingested pages (slice "
                   "language known out-of-band); omit to run the marker "
                   "heuristic per page")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from .config import LinkerConfig
    from .plans.pipeline import run_pipeline
    from .session import spark_session

    active = SparkSession.getActiveSession()
    # inherit_cluster_conf: under spark-submit the submitted --master /
    # --driver-memory must win; standalone runs fall back to local[*]
    spark = active or spark_session(
        app_name="entity-linkage", inherit_cluster_conf=True
    )

    if args.input_dir:
        from .fixtures import INPUT_TABLES as names

        def tbl(n: str):
            d = os.path.join(args.input_dir, n)
            return spark.read.parquet(d if os.path.isdir(d) else d + ".parquet")

        inputs = {n: tbl(n) for n in names}
        version = f"dir:{args.input_dir}"
    else:
        from .fixtures import fixtures_to_spark, make_fixtures

        fx = make_fixtures(seed=args.seed, n_pages=args.n_pages)
        inputs = fixtures_to_spark(spark, fx)
        version = f"fixture:{args.seed}:{args.n_pages}"

    if args.pages_warc:
        from .sources.warc import pages_from_warc

        inputs = dict(inputs)
        inputs["pages"] = pages_from_warc(
            spark, args.pages_warc, default_lang=args.pages_warc_lang
        )
        version += f":warc:{args.pages_warc}"

    premarked = None
    if args.task == "d2kb":
        if not args.input_dir:
            p.error("--task d2kb requires --input-dir with premarked_mentions")
        premarked = tbl("premarked_mentions")

    cfg = LinkerConfig(
        filter_mode=args.filter_mode, scorer_head=args.scorer_head
    )
    t0 = time.perf_counter()
    res = run_pipeline(
        spark, inputs, args.workdir, cfg,
        resume=not args.no_resume, input_version=f"{version}:{args.task}",
        premarked=premarked,
    )
    out = os.path.join(args.workdir, "out_clusters")
    res.clusters.write.mode("overwrite").parquet(out)
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    summary = {
        "n_links": res.links.count(),
        "n_clusters": n_clusters,
        "wall_sec": round(time.perf_counter() - t0, 3),
        "stages": res.metrics,
        "clusters_path": out,
    }
    print(json.dumps(summary))
    if active is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
