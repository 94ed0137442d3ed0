"""Checkpointed table IO with per-partition lineage + metrics.

The reference caches every expensive lookup to flat files so a re-run
resumes where it left off (``inout/wikidata.py:114-146,227-260``,
``inout/pbg.py:97-118``). Here that contract becomes: every pipeline
stage writes its output table plus a JSON manifest recording

- the stage's input fingerprint (hash of upstream manifests + config),
- row count and per-partition row counts (lineage + metrics,
  north-rule requirement),
- the written file list.

``read_or_compute`` skips a stage when a manifest with a matching
fingerprint exists — the resumability gate (SURVEY.md §5.2 item 5).

On a cluster this module swaps to Iceberg
(``df.writeTo(tbl).createOrReplace()`` + snapshot ids); the manifest
fingerprint maps to the Iceberg snapshot's summary properties. The
sandbox has no Iceberg jar, so Parquet + manifest implements the same
contract honestly.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fingerprint(*parts: str) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(p.encode("utf-8"))
        h.update(b"\x00")
    return h.hexdigest()[:16]


def _manifest_path(path: str) -> str:
    return os.path.join(path, "_MANIFEST.json")


def write_table(df: DataFrame, path: str, fp: str, mode: str = "overwrite") -> dict:
    """Write parquet + manifest with per-partition metrics."""
    df.write.mode(mode).parquet(path)
    spark = df.sparkSession
    back = spark.read.parquet(path)
    part_counts = (
        back.groupBy(F.spark_partition_id().alias("partition_id"))
        .count()
        .orderBy("partition_id")
        .collect()
    )
    manifest = {
        "fingerprint": fp,
        "rows": int(sum(r["count"] for r in part_counts)),
        "partitions": [
            {"partition_id": int(r["partition_id"]), "rows": int(r["count"])}
            for r in part_counts
        ],
        "schema": back.schema.simpleString(),
        "written_at": time.time(),
    }
    with open(_manifest_path(path), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def read_manifest(path: str) -> dict | None:
    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return None
    try:
        with open(mp) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        # torn manifest from a mid-run kill → treat stage as dirty
        return None


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: str | list[str],
    n_buckets: int = 64,
    sort_cols: str | list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Save ``df`` as a bucket-sorted catalog table; return the re-read
    table (whose scan carries the bucket partitioning/ordering).

    WHY (100 TB): the linkage pipeline joins page-keyed tables on
    ``url`` over and over (mentions ⋈ candidates ⋈ scores ⋈ links ⋈
    yesterday's links for the incremental path). Every sort-merge join
    of unbucketed tables re-shuffles BOTH sides — at 10^12 pages the
    repeated url shuffle dominates the job. Writing the tables that
    meet in those joins bucketed by the key with the SAME bucket count
    makes each later join shuffle-free: the scan reports
    ``HashPartitioning(key, N)`` so Catalyst drops both Exchanges
    (pinned by tests/test_bucketed_join.py). On Iceberg this maps to a
    ``bucket(N, key)`` partition transform + storage-partitioned
    joins; the session-catalog Parquet bucketing used here implements
    the same contract in the sandbox.

    The pre-write ``repartition(n_buckets, cols)`` uses the same
    Murmur3 hash as the bucket spec, so each write task holds exactly
    one bucket → ONE file per bucket. Without it every task writes a
    sliver of every bucket (tasks × buckets small files — the classic
    bucketBy trap). NOTE: the join's per-partition Sort is NOT
    eliminated — since Spark 3.0 the bucketed scan does not report
    sort ordering by default
    (``spark.sql.legacy.bucketedTableScan.outputOrdering=false``;
    verified on 4.1.2) — only the Exchange is. ``sortBy`` still buys
    within-file key locality (row-group stats / compression).
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    if sort_cols is None:
        sort = cols
    else:
        sort = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    w = (
        df.repartition(n_buckets, *[F.col(c) for c in cols])
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *cols)
        .sortBy(*sort)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)
    return df.sparkSession.table(name)


def read_or_compute(
    spark: SparkSession,
    path: str,
    fp: str,
    compute: Callable[[], DataFrame],
    force: bool = False,
) -> tuple[DataFrame, dict, bool]:
    """Resume-aware stage execution. Returns (df, manifest, was_cached)."""
    if not force:
        m = read_manifest(path)
        if m is not None and m.get("fingerprint") == fp:
            return spark.read.parquet(path), m, True
    m = write_table(compute(), path, fp)
    return spark.read.parquet(path), m, False
