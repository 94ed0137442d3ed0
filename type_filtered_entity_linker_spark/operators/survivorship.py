"""Survivorship (golden-record merge) over linkage clusters.

Classic record-linkage pipelines end match → cluster → MERGE: each
entity cluster is collapsed to one canonical record whose fields are
elected from the members by deterministic rules. The reference stops
at links (``el/entity_linker.py`` emits per-mention annotations), so
this is the natural downstream operator its users run next — and the
rules here are the standard ones (mode with lexicographic tie-break,
min/max election, member counts).

Scale shape (10^12 mentions): two partial-aggregated hash shuffles on
``cluster_col`` — the member table never moves twice and the payload
columns are the elected fields only. The mode election windows over
the (cluster, value) AGGREGATE (≤ one row per distinct value per
cluster, ≪ members); its per-cluster width is the cluster size, which
is exactly the quantity ``el_cluster_sizes`` exists to watch — a
mega-cluster is a blocking/scorer regression upstream, not a shape
this operator should silently absorb.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def golden_records(
    members: DataFrame,
    cluster_col: str = "cluster_id",
    mode_col: str = "sf",
    doc_col: str = "doc_id",
    min_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One canonical row per cluster.

    - ``canonical_<mode_col>``: the most frequent member value
      (tie → lexicographically/numerically smallest — deterministic).
    - ``n_members``; ``n_docs`` (distinct ``doc_col``).
    - ``min_<c>`` / ``max_<c>`` for each requested election column.
    """
    counts = members.groupBy(cluster_col, mode_col).agg(
        F.count("*").alias("_n")
    )
    # NULLS LAST matches DuckDB's ASC default (oracle-parity
    # convention): a NULL member value must never beat a real one
    w = Window.partitionBy(cluster_col).orderBy(
        F.col("_n").desc(), F.col(mode_col).asc_nulls_last()
    )
    canon = (
        counts.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            cluster_col, F.col(mode_col).alias(f"canonical_{mode_col}")
        )
    )
    aggs = [
        F.count("*").alias("n_members"),
        F.countDistinct(doc_col).alias("n_docs"),
    ]
    aggs += [F.min(c).alias(f"min_{c}") for c in min_cols]
    aggs += [F.max(c).alias(f"max_{c}") for c in max_cols]
    stats = members.groupBy(cluster_col).agg(*aggs)
    return stats.join(canon, cluster_col)
