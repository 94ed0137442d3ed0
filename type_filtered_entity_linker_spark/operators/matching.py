"""One-to-one assignment over scored candidate pairs (clean-clean ER).

Transitive clustering (operators/clustering.py) is the right
resolution for DIRTY ER, where any number of records may co-refer.
Clean-clean ER — linking two individually-duplicate-free sources —
instead needs a matching: each left record pairs with AT MOST one
right record and vice versa, and a chain a-b, b-c must not merge a
and c. The scalable standard is reciprocal-best (mutual nearest
neighbor): keep (a, b) iff b is a's highest-scoring candidate AND a
is b's. It is embarrassingly parallel (two windowed argmaxes + one
join), deterministic under the tie-break, and guarantees one-to-one
output by construction; unlike the greedy sequential matching it
never needs a global score sort, so it is the variant that survives
10^12 rows. (Reciprocal best is also what the reference's argmax
stage, el/entity_linker.py:107-117, degenerates to when both sides
are constrained — the reference only ever constrains one side.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mutual_best_match(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    score_col: str = "score",
) -> DataFrame:
    """Keep the reciprocal-best pairs of a scored bipartite candidate
    set. Ties break deterministically: higher score first, then the
    LOWER partner id (so the result is stable across runs and
    engines). Input columns pass through; output is one-to-one in both
    ``left_col`` and ``right_col``.

    Plan: two row_number windows (one shuffle each, keyed by the
    respective side — skew-bounded by per-record candidate counts,
    which upstream blocking already caps) + an inner join of the two
    rank-1 sets on the pair key. No driver-side state.
    """
    wa = Window.partitionBy(left_col).orderBy(
        F.col(score_col).desc(), F.col(right_col).asc()
    )
    wb = Window.partitionBy(right_col).orderBy(
        F.col(score_col).desc(), F.col(left_col).asc()
    )
    best_for_left = (
        pairs.withColumn("_rn", F.row_number().over(wa))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    best_for_right = pairs.withColumn("_rn", F.row_number().over(wb)).where(
        F.col("_rn") == 1
    )
    return best_for_left.join(
        best_for_right.select(
            F.col(left_col).alias("_la"), F.col(right_col).alias("_rb")
        ),
        on=(F.col(left_col) == F.col("_la"))
        & (F.col(right_col) == F.col("_rb")),
        how="inner",
    ).drop("_la", "_rb")
