"""Isotonic score calibration by pool-adjacent-violators (PAV) —
turning a raw pairwise-match score into a monotone match-probability.

The reliability table (evaluation.py::calibration_table) DIAGNOSES
mis-calibration; this operator FIXES it: the isotonic regression of
the per-band empirical match rate onto the score axis is the best
monotone fit under squared loss (Barlow et al. 1972; the standard
post-hoc calibrator next to Platt scaling, and the one that makes no
sigmoid-shape assumption — right for Fellegi–Sunter log-odds, whose
band rates are monotone-ish but lumpy). A steward reading the
calibrated curve gets the guarantee the raw score cannot give:
"everything above this score matches with probability ≥ p, and p
never decreases as the score grows".

PAV itself is a sequential pointer algorithm; the distributed form
here exploits its ORDER-INDEPENDENCE: the isotonic fit is the unique
fixpoint of "merge any adjacent pool pair whose averages violate
monotonicity", so any merge schedule converges to the same answer.
The schedule used by both the engine and the SQL oracle is "merge the
LEFTMOST violating pair, once per round" — deterministic, and at most
n_bands − 1 rounds. That is O(n) rounds, which would be wrong for
per-record isotonic fits at corpus scale — but the input here is the
BANDED score table (a handful of rows produced by one corpus-wide
aggregation), so the rounds are trivially cheap and the heavy lifting
(banding billions of pairs) stays one hash aggregate. This is the
same aggregate-first-then-iterate-tiny shape as the EM weight fitter
(fellegi_sunter.py).

Determinism: pool averages are single IEEE divisions of two exact
integer sums — bit-identical across engines; the violation test and
the leftmost choice are therefore exact, no round(6) needed until the
final display columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def isotonic_calibrate(
    bands: DataFrame,
    idx_col: str = "band_idx",
    n_col: str = "n_pairs",
    t_col: str = "n_true",
    max_rounds: "int | None" = None,
) -> DataFrame:
    """Weighted isotonic (non-decreasing) fit of t/n over band index.

    ``bands``: one row per score band with (band_idx ascending in
    score, n_pairs > 0, n_true) — the output of a banded truth-join
    aggregation. Returns one row per input band: (band_idx, n_pairs,
    n_true, raw_rate, pool, calibrated_rate) where pool = the lowest
    band index of the PAV pool the band fell into and calibrated_rate
    = that pool's weighted average rate, non-decreasing in band_idx.
    """
    asn = bands.select(
        F.col(idx_col).cast("long").alias("band_idx"),
        F.col(n_col).cast("long").alias("n"),
        F.col(t_col).cast("long").alias("t"),
        F.col(idx_col).cast("long").alias("pool"),
    ).localCheckpoint(eager=True)
    if max_rounds is None:
        max_rounds = max(asn.count() - 1, 0)
    # the pool table is band-count-sized: the unpartitioned lead()
    # window below runs over a handful of rows (same justification as
    # the ~26-row offsets window in the entity-dictionary ranking)
    w = Window.orderBy("pool")
    # one extra iteration beyond max_rounds: no merge, only verifies
    # the fixpoint — otherwise an under-provisioned max_rounds would
    # return a "calibrated" curve that still DECREASES somewhere,
    # silently breaking the operator's one guarantee (code-review
    # w15; same contract as hac/kcore/greedy_matching)
    for round_i in range(max_rounds + 1):
        pools = asn.groupBy("pool").agg(
            F.sum("n").alias("sn"), F.sum("t").alias("st")
        )
        pl = pools.select(
            "pool",
            (F.col("st") / F.col("sn")).alias("avg"),
            F.lead("pool").over(w).alias("next_pool"),
            (F.lead("st").over(w) / F.lead("sn").over(w)).alias("next_avg"),
        )
        viol = (
            pl.where(
                F.col("next_avg").isNotNull()
                & (F.col("avg") > F.col("next_avg"))
            )
            .orderBy("pool")
            .limit(1)
            .select("pool", "next_pool")
            .localCheckpoint(eager=True)
        )
        if viol.count() == 0:
            break
        if round_i == max_rounds:
            raise RuntimeError(
                f"isotonic_calibrate did not reach the PAV fixpoint "
                f"in {max_rounds} rounds (a monotonicity violation "
                f"remains); raise max_rounds (None = n_bands - 1, "
                f"always sufficient)"
            )
        asn = (
            asn.crossJoin(
                F.broadcast(
                    viol.select(
                        F.col("pool").alias("_vp"),
                        F.col("next_pool").alias("_vn"),
                    )
                )
            )
            .select(
                "band_idx",
                "n",
                "t",
                F.when(F.col("pool") == F.col("_vn"), F.col("_vp"))
                .otherwise(F.col("pool"))
                .alias("pool"),
            )
            .localCheckpoint(eager=True)
        )
    final_pools = asn.groupBy("pool").agg(
        F.sum("n").alias("psn"), F.sum("t").alias("pst")
    )
    return (
        asn.join(final_pools, "pool")
        .select(
            "band_idx",
            F.col("n").alias("n_pairs"),
            F.col("t").alias("n_true"),
            F.round(F.col("t") / F.col("n"), 6).alias("raw_rate"),
            "pool",
            F.round(F.col("pst") / F.col("psn"), 6).alias(
                "calibrated_rate"
            ),
        )
    )
