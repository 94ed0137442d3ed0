"""JSON dataset source + sink (reference O3/O6,
``inout/dataset.py:15-28,44-53,56-66,69-78``: training/eval sample
arrays read and written as JSON files).

The reference serializes a Python list per file; the engine's shape is
Spark's JSON-lines dataset directory — splittable, schema'd at read
(never inferred in production: pass the schema so the scan prunes
columns and malformed rows fail loudly instead of widening types).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_json_dataset(
    df: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """O6 sink: dataset → JSON-lines files (one per partition; repartition
    upstream if a specific file count is needed)."""
    df.write.mode(mode).json(path)


def read_json_dataset(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """O3 source: JSON-lines dataset → DataFrame. Always pass ``schema``
    outside tests — schema inference costs a full extra pass over the
    data and silently unions drifting types."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
