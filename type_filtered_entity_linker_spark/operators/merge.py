"""Key-level merge/upsert (the MERGE INTO shape, computed relationally).

The incremental pipeline writes link batches with dynamic partition
overwrite (streaming/incremental.py — idempotent at PARTITION
granularity). The other sink shape a daily 10^12-page pipeline needs
is KEY granularity: a re-crawled page's links must replace yesterday's
rows for that key while untouched keys survive — Iceberg/Delta
``MERGE INTO target USING source ON key WHEN MATCHED UPDATE WHEN NOT
MATCHED INSERT``. The sandbox has no Iceberg runtime (SURVEY §7.0), so
this computes the merged snapshot with one full-outer join — which is
also exactly what a copy-on-write MERGE does under the hood, minus the
file-level pruning the table format adds.

Scale shape: ONE shuffle of each side on the key (or zero, if both
sides are bucketed by the key — sources/tableio.py::write_bucketed).
An Iceberg MERGE additionally prunes to the files whose key ranges
overlap the source; relationally that is the same join after partition
pruning. ``source`` wins on key match (upsert), optionally honoring a
tombstone column for deletes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str] | str,
    delete_col: str | None = None,
) -> DataFrame:
    """Merged snapshot: source rows replace target rows on key match,
    unmatched target rows survive, unmatched source rows insert.

    ``delete_col``: optional boolean column on ``source``; matched keys
    whose source row has it true are dropped (MERGE's WHEN MATCHED
    DELETE arm) instead of updated. The column is not part of the
    output schema. Both inputs must otherwise share the output schema.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    payload = [c for c in target.columns if c not in ks]
    src_payload = [c for c in source.columns if c not in ks]
    if delete_col is not None:
        src_payload = [c for c in src_payload if c != delete_col]
    if sorted(src_payload) != sorted(payload):
        raise ValueError(
            f"schema mismatch: target payload {sorted(payload)} "
            f"vs source payload {sorted(src_payload)}"
        )
    t = target.select(*ks, F.struct(*payload).alias("_t"))
    s_cols = [*ks, F.struct(*payload).alias("_s"), F.lit(True).alias("_in_s")]
    if delete_col is not None:
        s_cols.append(F.coalesce(F.col(delete_col), F.lit(False)).alias("_del"))
    s = source.select(*s_cols)
    j = t.join(s, ks, "full_outer")
    if delete_col is not None:
        j = j.where(~F.coalesce(F.col("_del"), F.lit(False)))
    merged = j.select(
        *ks,
        *[
            F.when(F.col("_in_s").isNotNull(), F.col("_s")[c])
            .otherwise(F.col("_t")[c])
            .alias(c)
            for c in payload
        ],
    )
    return merged
