"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship entity-linkage chain (explode →
blocking equi-join → type-filter semi-join → top-K → score → argmax →
cluster) on /root/testdata/sf0.001. ``queries()`` exposes one callable
per implemented operator family from SURVEY.md §2 plus the
training-data pipeline operators (dedup / similarity / text analysis /
sketches / multimodal); ``oracle_sql()`` gives the DuckDB-equivalent
SQL for EVERY query — including the approximate ops (SimHash, LSH-ANN,
CMS/HLL), whose hash/banding math is replicated exactly in SQL, so
nothing is rows-only.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from type_filtered_entity_linker_spark.plans.driver_queries import (  # noqa: E402
    ORACLES,
    QUERIES,
)

SF_SMALL = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full linkage mini-pipeline to clusters on sf0.001."""
    return QUERIES["el_clusters"](spark, SF_SMALL)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
