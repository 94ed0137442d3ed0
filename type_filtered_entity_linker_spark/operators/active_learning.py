"""Active-learning label-queue selection — uncertainty sampling over
probabilistic-linkage scores: pick the K candidate pairs whose score
sits closest to the decision boundary and send exactly those to the
human labeler (Sarawagi & Bhamidipaty KDD'02 ALIAS; the "label a
pair" loop of dedupe.io / Zingg). The reference repo trains its
disambiguation model offline on pre-labeled pairs
(el/model_trainer.py); at web scale the labeling budget is the
scarce resource, so the pipeline must CHOOSE the pairs worth
labeling — highest-entropy first.

Shape: one filter to the review band (clear links and clear
non-links carry no label information, so they never leave the
executors), one column expression for the uncertainty key, then the
repo's two-level ``global_rank`` (range partition + per-partition
row_number + broadcast offset compose — no single-task global sort)
and a rank <= K filter. The queue position is part of the output
contract: labelers consume the queue in order, and re-running the
job yields the same queue (the order key (uncertainty, id_a, id_b)
is total).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sorted_neighborhood import global_rank


def uncertainty_queue(
    scored: DataFrame,
    lower: float,
    upper: float,
    k: int,
    score_col: str = "score",
) -> DataFrame:
    """Top-``k`` most uncertain pairs from ``scored`` (id_a, id_b,
    score): keep score in [lower, upper), rank ascending by
    |score - mid| where mid = (lower + upper) / 2, ties by
    (id_a, id_b). Returns (queue_pos, id_a, id_b, score,
    uncertainty) with queue_pos in 1..k; uncertainty is rounded to 6
    (the repo's oracle-parity convention — the rank key is computed
    from the already-rounded score, so both engines rank the same
    doubles)."""
    mid = (lower + upper) / 2.0
    band = scored.where(
        (F.col(score_col) >= F.lit(lower)) & (F.col(score_col) < F.lit(upper))
    ).withColumn(
        "uncertainty", F.round(F.abs(F.col(score_col) - F.lit(mid)), 6)
    )
    ranked = global_rank(
        band.select("id_a", "id_b", F.col(score_col).alias("score"),
                    "uncertainty"),
        ["uncertainty", "id_a", "id_b"],
        rank_col="queue_pos",
    )
    return ranked.where(F.col("queue_pos") <= F.lit(k)).select(
        "queue_pos", "id_a", "id_b", "score", "uncertainty"
    )
