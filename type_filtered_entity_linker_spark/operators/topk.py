"""Deterministic top-K candidate cap and argmax winner selection
(reference O19 ``el/entity_linker.py:94-108`` and O23/O24
``el/entity_disambiguator.py:49-78``).

The reference relies on SPARQL arrival order for both truncation and
ties — nondeterministic. We order by numeric Q-id everywhere
(SURVEY.md §4 item 4), which the oracle mirrors exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import LinkerConfig

def qnum() -> F.Column:
    """Numeric Q-id for deterministic ordering."""
    return F.substring("item_id", 2, 18).cast("long")


def cap_candidates(candidates: DataFrame, cfg: LinkerConfig) -> DataFrame:
    """Top-K per mention, K=cfg.candidates_limit (default 500,
    run.py:37), applied AFTER the type filter (el/entity_linker.py:56-62).
    Also the skew guard: bounds per-mention fan-out into the scorer."""
    if cfg.candidates_limit is None:
        return candidates
    w = Window.partitionBy("url", "mention_id").orderBy(qnum().asc())
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cfg.candidates_limit)
        .drop("_rn")
    )


def argmax_links(scored: DataFrame) -> DataFrame:
    """Winner per mention: max score, tie → lowest Q-id (deterministic
    form of the reference's strict-> first-of-max,
    el/entity_disambiguator.py:75). Candidates with null score (missing
    embedding) are skipped (el/entity_disambiguator.py:36-39); mentions
    where ALL candidates were skipped fall back to the first (lowest
    Q-id) candidate with score 0.0 (el/entity_disambiguator.py:49-55).
    """
    w = Window.partitionBy("url", "mention_id").orderBy(
        F.desc("score"), qnum().asc()
    )
    winners = (
        scored.where(F.col("score").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("url", "mention_id", "item_id", "score")
    )
    fallback = (
        scored.join(
            winners.select("url", "mention_id"), ["url", "mention_id"], "left_anti"
        )
        .groupBy("url", "mention_id")
        .agg(F.min(F.struct(qnum().alias("q"), F.col("item_id"))).alias("m"))
        .select(
            "url", "mention_id",
            F.col("m.item_id").alias("item_id"),
            F.lit(0.0).alias("score"),
        )
    )
    return winners.unionByName(fallback)
