"""Collective entity disambiguation: re-rank each mention's candidates
by document-level type coherence on top of the local string score.

The reference links every mention INDEPENDENTLY (its pipeline scores
each mention-candidate pair in isolation, pipeline.py:1-120 /
disamb/model.py); the standard upgrade in the EL literature (Ratinov
et al. ACL'11, Hoffart et al. EMNLP'11 "AIDA") is COLLECTIVE
disambiguation — candidates that cohere with the rest of the document
win over string-closer but contextually isolated ones. The classic
formulation is a mention×mention candidate graph per document, which
is quadratic in document mention count and the reason most collective
linkers don't scale past a shard.

This operator keeps the collective signal but factors the quadratic
graph through a LINEAR type-support table: a candidate's coherence is
the number of *other* mentions in the same document that could also
realize one of the candidate's ontology types,

    coherence(d, m, e) = Σ_{t ∈ types(e)} (support(d, t) − 1)

where support(d, t) = |{mentions in d with ≥1 candidate of type t}|
(the −1 removes the mention's own contribution — every candidate with
type t makes its own mention a t-supporter, so self-support is
constant and would only shift scores). Final score is the integer
2·coherence − levenshtein, argmax per mention with the house
lowest-item-id tie-break.

Scale shape: NO mention×mention join anywhere — two hash aggregations
(distinct candidate-type tuples, then per-(doc, type) support) and two
equi-joins of candidates against tables that are strictly smaller than
the candidate set (support has one row per document×type actually
proposed). The support join key (doc_id, type_id) is the natural
partitioning, so at 10^12 documents every stage shuffles once on keys
with no Zipf head beyond what the candidate generator already carries.
All-integer arithmetic end to end: the oracle parity is exact with no
float rounding involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collective_rerank(
    candidates: DataFrame,
    entity_types: DataFrame,
    coherence_weight: int = 2,
) -> DataFrame:
    """Pick one entity per mention by coherence-adjusted score.

    ``candidates``: (doc_id, sf, item_id, name) — the per-mention
    candidate set (post type-filter, post top-K). ``entity_types``:
    (item_id, type_id). Returns one row per (doc_id, sf):
    (doc_id, sf, item_id, lev, coherence, score) with
    score = coherence_weight·coherence − levenshtein(sf, name),
    winner = max score, ties to the lowest item_id.
    """
    cand_types = (
        candidates.select("doc_id", "sf", "item_id")
        .join(entity_types, "item_id")
        .select("doc_id", "sf", "item_id", "type_id")
        .distinct()
    )
    support = (
        cand_types.select("doc_id", "type_id", "sf")
        .distinct()
        .groupBy("doc_id", "type_id")
        .agg(F.count("*").alias("sup"))
    )
    coherence = (
        cand_types.join(support, ["doc_id", "type_id"])
        .groupBy("doc_id", "sf", "item_id")
        .agg(F.sum(F.col("sup") - 1).cast("long").alias("coherence"))
    )
    scored = (
        candidates.withColumn("lev", F.levenshtein("sf", "name"))
        .join(coherence, ["doc_id", "sf", "item_id"], "left")
        .select(
            "doc_id",
            "sf",
            "item_id",
            "lev",
            F.coalesce("coherence", F.lit(0)).cast("long").alias("coherence"),
        )
        .withColumn(
            "score",
            (
                F.lit(coherence_weight) * F.col("coherence") - F.col("lev")
            ).cast("long"),
        )
    )
    w = Window.partitionBy("doc_id", "sf").orderBy(
        F.col("score").desc(), F.col("item_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "sf", "item_id", "lev", "coherence", "score")
    )
