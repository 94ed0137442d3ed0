"""Temporal record linkage — agreement evidence DECAYS with the time
gap between the two records' observations (Li, Dong, Maurino &
Srivastava, "Linking temporal records", VLDB'11: people move, phones
change, so a disagreement across five years says little and an
agreement across five years says less than a same-day one). The
classic model uses exponential decay; here decay is a STEP TABLE
indexed by the gap-year bucket — the standard practitioner
simplification, and it keeps the whole computation a product/sum of
double literals, exactly reproducible in both engines (no exp(), no
libm divergence — same trade as truth_discovery's integer units).

Scale shape: identical to fellegi_sunter_scores (two id-keyed record
joins + per-pair column expressions, no UDF, no window); the decay
lookup is an array literal indexed by an integer column."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fellegi_sunter import fs_agree_expr, fs_contrib_expr, fs_weights


def temporal_fs_scores(
    records: DataFrame,
    pairs: DataFrame,
    field_params: "dict[str, tuple[float, float]]",
    ts_col: str = "seen_ts",
    near: "dict[str, int] | None" = None,
    decay_steps: "tuple[float, ...]" = (1.0, 0.8, 0.6, 0.4, 0.2),
    id_col: str = "rec_id",
    year_days: int = 365,
) -> DataFrame:
    """Fellegi-Sunter scoring with temporal decay: every field's
    weight (agreement reward AND disagreement penalty — both say less
    across a gap) is multiplied by ``decay_steps[min(gap_years,
    len-1)]`` where gap_years = floor(|ts_a - ts_b| / year_days) on
    the integer ``ts_col`` (days). Output per pair: agree_<field>
    ints, gap_days, decay, ``score_static`` (undecayed — what plain
    FS would say), ``score`` (decayed, the decision basis), both
    rounded to 6."""
    near = near or {}
    fields = list(field_params)
    a = records.select(
        F.col(id_col).alias("id_a"),
        F.col(ts_col).alias("ts_a"),
        *[F.col(f).alias(f"a_{f}") for f in fields],
    )
    b = records.select(
        F.col(id_col).alias("id_b"),
        F.col(ts_col).alias("ts_b"),
        *[F.col(f).alias(f"b_{f}") for f in fields],
    )
    j = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    gap = F.abs(F.col("ts_a") - F.col("ts_b")).cast("long")
    gap_years = F.floor(gap / F.lit(year_days)).cast("int")
    idx = F.least(gap_years, F.lit(len(decay_steps) - 1))
    decay = F.element_at(
        F.array(*[F.lit(float(d)) for d in decay_steps]), idx + 1
    )
    agrees = []
    static_terms = [F.lit(0.0)]
    for f in fields:
        t = near.get(f, 0)
        agrees.append(
            fs_agree_expr(
                F.col(f"a_{f}"), F.col(f"b_{f}"), t
            ).alias(f"agree_{f}")
        )
        wa, wd = fs_weights(*field_params[f])
        static_terms.append(
            fs_contrib_expr(F.col(f"agree_{f}"), wa, wd)
        )
    j = j.select("id_a", "id_b", "ts_a", "ts_b", *agrees)
    static = static_terms[0]
    for t in static_terms[1:]:
        static = static + t
    return j.select(
        "id_a",
        "id_b",
        gap.alias("gap_days"),
        F.round(decay, 6).alias("decay"),
        *[f"agree_{f}" for f in fields],
        F.round(static, 6).alias("score_static"),
        F.round(static * decay, 6).alias("score"),
    )
