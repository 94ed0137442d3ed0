"""Fellegi–Sunter probabilistic record linkage (the 1969 decision
model classic ER systems are built on): per-field agreement vectors
over candidate pairs, log-likelihood match weights from per-field
(m, u) probabilities, and a three-way link / possible / non-link
decision by score thresholds.

Everything is pure JVM column expressions — ``levenshtein`` for the
near-agreement test, literal double weights precomputed in Python
(``log2`` of the m/u ratios), and a fixed-order chained sum — so the
whole operator runs inside whole-stage codegen and has an exact
DuckDB oracle (same literals, same expression order → bit-identical
doubles).

Scale notes (10^12 records): pairs arrive from a blocking operator
(``blocking.rarest_token_blocks`` / ``phonetic_key_col`` /
``generate_candidates``), so the pair table is linear in corpus size
by the block-size bound; the two record-attribute joins shuffle on
rec_id only, carrying the few comparison fields; the comparisons
themselves are narrow map-side work. ``blocking_quality`` never
materializes candidate pairs — the pair count is Σ|block|·(|block|−1)/2
from one hash aggregate, so evaluating a blocking scheme costs a scan
even when the scheme is bad.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fs_weights(m: float, u: float) -> tuple[float, float]:
    """(agreement, disagreement) log2 match weights for one field:
    log2(m/u) rewards agreement on a field that rarely agrees by
    chance; log2((1-m)/(1-u)) penalizes disagreement on a field that
    true matches almost always agree on."""
    return math.log2(m / u), math.log2((1.0 - m) / (1.0 - u))


def fs_agree_expr(a_col, b_col, near_t: int):
    """The ONE Python definition of the per-field agreement test every
    FS-family operator shares (fellegi_sunter_scores, fs_waterfall,
    temporal_linkage.temporal_fs_scores — the Python twin of the
    oracle-side _fs_agree_score_sql): NULL on either side -> NULL,
    Levenshtein <= near_t -> 1, else 0."""
    return (
        F.when(a_col.isNull() | b_col.isNull(), F.lit(None).cast("int"))
        .when(F.levenshtein(a_col, b_col) <= near_t, F.lit(1))
        .otherwise(F.lit(0))
    )


def fs_contrib_expr(agree_col, w_agree: float, w_dis: float):
    """The per-field weight contribution under the missing-data
    convention: NULL agreement contributes 0.0, agreement the reward,
    disagreement the penalty. Shared for the same reason as
    fs_agree_expr."""
    return (
        F.when(agree_col.isNull(), F.lit(0.0))
        .when(agree_col == 1, F.lit(w_agree))
        .otherwise(F.lit(w_dis))
    )


def fellegi_sunter_scores(
    records: DataFrame,
    pairs: DataFrame,
    field_params: dict[str, tuple[float, float]],
    near: dict[str, int] | None = None,
    id_col: str = "rec_id",
    upper: float = 3.0,
    lower: float = 0.0,
) -> DataFrame:
    """Score candidate pairs with the Fellegi–Sunter model.

    records: one row per record with ``id_col`` + the comparison
    fields named in ``field_params`` (field -> (m, u) probabilities,
    iteration order fixes the score's addition order). ``near`` maps
    a field to the max Levenshtein distance that still counts as
    agreement (default 0 = exact). A NULL on either side contributes
    weight 0 (the standard missing-data convention). Output per pair:
    agree_<field> ints (NULL when missing), ``score`` (rounded to 6),
    and ``decision``: link (score ≥ upper) / non_link (score < lower)
    / possible.
    """
    near = near or {}
    fields = list(field_params)
    a = records.select(
        F.col(id_col).alias("id_a"), *[F.col(f).alias(f"a_{f}") for f in fields]
    )
    b = records.select(
        F.col(id_col).alias("id_b"), *[F.col(f).alias(f"b_{f}") for f in fields]
    )
    j = pairs.join(a, "id_a").join(b, "id_b")

    score = F.lit(0.0)
    agree_cols = []
    for f in fields:
        w_agree, w_dis = fs_weights(*field_params[f])
        t = near.get(f, 0)
        j = j.withColumn(
            f"agree_{f}",
            fs_agree_expr(F.col(f"a_{f}"), F.col(f"b_{f}"), t),
        )
        agree_cols.append(f"agree_{f}")
        score = score + fs_contrib_expr(
            F.col(f"agree_{f}"), w_agree, w_dis
        )
    j = j.withColumn("score", F.round(score, 6))
    return j.select(
        "id_a",
        "id_b",
        *agree_cols,
        "score",
        F.when(F.col("score") >= upper, F.lit("link"))
        .when(F.col("score") < lower, F.lit("non_link"))
        .otherwise(F.lit("possible"))
        .alias("decision"),
    )


def blocking_quality(
    blocks: DataFrame,
    truth: DataFrame,
    id_col: str = "rec_id",
    key_col: str = "block_key",
) -> DataFrame:
    """One-row evaluation of a blocking scheme against labeled true
    pairs: ``reduction_ratio`` (1 − candidates / all-pairs — how much
    comparison work blocking saved) and ``pairs_completeness``
    (fraction of true pairs whose two records share a block — the
    recall blocking is allowed to cost). Candidate count is computed
    as Σ|block|·(|block|−1)/2 per key WITHOUT materializing the pairs.

    blocks: (id_col, key_col), one key per record (records with a
    NULL key are unblocked and pair with nothing). truth: (id_a, id_b).
    """
    bk = blocks.select(F.col(id_col), F.col(key_col)).where(
        F.col(key_col).isNotNull()
    )
    n_rec = blocks.select(F.countDistinct(id_col).alias("n_records"))
    cand = bk.groupBy(key_col).agg(F.count("*").alias("c")).agg(
        F.coalesce(
            F.sum(F.col("c") * (F.col("c") - 1) / 2), F.lit(0.0)
        ).cast("long").alias("n_candidates")
    )
    ka = bk.select(F.col(id_col).alias("id_a"), F.col(key_col).alias("k_a"))
    kb = bk.select(F.col(id_col).alias("id_b"), F.col(key_col).alias("k_b"))
    t = truth.join(ka, "id_a", "left").join(kb, "id_b", "left")
    hits = t.agg(
        F.count("*").alias("n_true"),
        F.sum(
            F.when(F.col("k_a") == F.col("k_b"), 1).otherwise(0)
        ).alias("n_true_in_candidates"),
    )
    return (
        n_rec.crossJoin(cand)
        .crossJoin(hits)
        .select(
            "n_records",
            "n_true",
            "n_candidates",
            "n_true_in_candidates",
            F.round(
                F.col("n_true_in_candidates") / F.col("n_true"), 6
            ).alias("pairs_completeness"),
            F.round(
                1.0
                - F.col("n_candidates")
                / (F.col("n_records") * (F.col("n_records") - 1) / 2),
                6,
            ).alias("reduction_ratio"),
        )
    )


EM_CLAMP = 1e-6


def em_fit_mu(
    records: DataFrame,
    pairs: DataFrame,
    field_params: dict[str, int] | list[str],
    near: dict[str, int] | None = None,
    id_col: str = "rec_id",
    iters: int = 3,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_p: float = 0.5,
) -> list[dict]:
    """Unsupervised EM estimation of the Fellegi–Sunter (m, u)
    probabilities (Winkler's classic fit): agreement vectors are
    computed ONCE and persisted; each EM iteration is then a single
    aggregation job — E-step match probabilities as pure column
    expressions at the current (p, m, u) literals, M-step closed-form
    updates on the collected per-field sums (driver-side, like the
    ``training.train_logistic`` epoch loop). NULL agreements count as
    disagreement (the estimator expects complete comparison fields).

    ``field_params`` is the field list (dict keys or list — iteration
    order fixes expression order). Returns the per-iteration curve:
    [{iter, p, m_<f>..., u_<f>...}] with estimates clamped to
    [EM_CLAMP, 1 − EM_CLAMP] so the implied log-weights stay finite.

    Scale notes: the per-iteration job is one partial-aggregated pass
    over the pair table (blocked upstream, so linear in corpus);
    nothing but a dozen doubles ever reaches the driver.
    """
    near = near or {}
    fields = list(field_params)
    a = records.select(
        F.col(id_col).alias("id_a"), *[F.col(f).alias(f"a_{f}") for f in fields]
    )
    b = records.select(
        F.col(id_col).alias("id_b"), *[F.col(f).alias(f"b_{f}") for f in fields]
    )
    ag = pairs.join(a, "id_a").join(b, "id_b").select(
        *[
            F.coalesce(
                F.when(
                    F.levenshtein(F.col(f"a_{f}"), F.col(f"b_{f}"))
                    <= near.get(f, 0),
                    F.lit(1.0),
                ).otherwise(F.lit(0.0)),
                F.lit(0.0),
            ).alias(f"ag_{f}")
            for f in fields
        ]
    ).persist()

    p = float(init_p)
    m = {f: float(init_m) for f in fields}
    u = {f: float(init_u) for f in fields}
    curve: list[dict] = []
    clamp = lambda x: min(max(x, EM_CLAMP), 1.0 - EM_CLAMP)
    try:
        for it in range(iters):
            pm = F.lit(p)
            pu = F.lit(1.0 - p)
            for f in fields:
                ac = F.col(f"ag_{f}")
                pm = pm * (
                    F.lit(m[f]) * ac + F.lit(1.0 - m[f]) * (F.lit(1.0) - ac)
                )
                pu = pu * (
                    F.lit(u[f]) * ac + F.lit(1.0 - u[f]) * (F.lit(1.0) - ac)
                )
            w = pm / (pm + pu)
            aggs = [F.sum(w).alias("sw"), F.count(F.lit(1)).alias("n")]
            for f in fields:
                aggs.append(F.sum(w * F.col(f"ag_{f}")).alias(f"swa_{f}"))
                aggs.append(F.sum(F.col(f"ag_{f}")).alias(f"sa_{f}"))
            r = ag.agg(*aggs).first().asDict()
            sw, n = float(r["sw"]), float(r["n"])
            p = clamp(sw / n)
            for f in fields:
                swa, sa = float(r[f"swa_{f}"]), float(r[f"sa_{f}"])
                m[f] = clamp(swa / sw)
                u[f] = clamp((sa - swa) / (n - sw))
            row = {"iter": it + 1, "p": p}
            row.update({f"m_{f}": m[f] for f in fields})
            row.update({f"u_{f}": u[f] for f in fields})
            curve.append(row)
    finally:
        ag.unpersist()
    return curve


def tf_adjusted_scores(
    records: DataFrame,
    pairs: DataFrame,
    field_params: dict[str, tuple[float, float]],
    tf_fields: tuple[str, ...] = (),
    near: dict[str, int] | None = None,
    id_col: str = "rec_id",
    upper: float = 3.0,
    lower: float = 0.0,
) -> DataFrame:
    """Fellegi–Sunter with term-frequency-adjusted agreement weights
    (Winkler 1989's frequency-based matching refinement; the same
    adjustment Splink ships as `tf_adjustments`): agreeing on a RARE
    value is stronger match evidence than agreeing on a common one, so
    for each field in ``tf_fields`` the fixed agreement weight
    ``log2(m/u)`` is replaced by the per-value ``log2(m) − log2(tf_v)``
    where ``tf_v = n_v / N`` is the value's relative frequency among
    non-null records. A surname match on the one 'Zyzmor' in the
    corpus then outscores a match on ten thousand 'Smith's.
    Disagreement and missing-value weights are unchanged; TF fields
    compare by exact equality (frequency is defined per exact value).

    Scale shape: each TF field adds one small frequency table
    (|distinct values| rows) broadcast-joined on the agreed value plus
    a broadcast 1-row N — the pair table shuffles exactly as in
    ``fellegi_sunter_scores``, nothing new is quadratic. Cross-engine
    parity: ``tf_v`` is a ratio of exact integer counts and the score
    is rounded to 6 decimals, so the single data-dependent ``log2``
    stays within the driver gate's compare tolerance.
    """
    near = near or {}
    fields = list(field_params)
    a = records.select(
        F.col(id_col).alias("id_a"), *[F.col(f).alias(f"a_{f}") for f in fields]
    )
    b = records.select(
        F.col(id_col).alias("id_b"), *[F.col(f).alias(f"b_{f}") for f in fields]
    )
    j = pairs.join(a, "id_a").join(b, "id_b")

    score = F.lit(0.0)
    agree_cols = []
    for f in fields:
        m, u = field_params[f]
        w_agree, w_dis = fs_weights(m, u)
        la, lb = F.col(f"a_{f}"), F.col(f"b_{f}")
        if f in tf_fields:
            agree = (
                F.when(la.isNull() | lb.isNull(), F.lit(None).cast("int"))
                .when(la == lb, F.lit(1))
                .otherwise(F.lit(0))
            )
        else:
            t = near.get(f, 0)
            agree = (
                F.when(la.isNull() | lb.isNull(), F.lit(None).cast("int"))
                .when(F.levenshtein(la, lb) <= t, F.lit(1))
                .otherwise(F.lit(0))
            )
        j = j.withColumn(f"agree_{f}", agree)
        agree_cols.append(f"agree_{f}")
        if f in tf_fields:
            freq = (
                records.where(F.col(f).isNotNull())
                .groupBy(F.col(f).alias(f"_v_{f}"))
                .agg(F.count("*").alias(f"_cnt_{f}"))
            )
            # N = Σ counts of the freq table just built — no second
            # full-records scan per TF field
            nf = freq.agg(F.sum(f"_cnt_{f}").alias(f"_n_{f}"))
            j = j.join(
                F.broadcast(freq),
                F.col(f"a_{f}") == F.col(f"_v_{f}"),
                "left",
            ).crossJoin(F.broadcast(nf))
            w_agree_col = F.lit(math.log2(m)) - F.log2(
                F.col(f"_cnt_{f}") / F.col(f"_n_{f}")
            )
        else:
            w_agree_col = F.lit(w_agree)
        score = score + (
            F.when(F.col(f"agree_{f}").isNull(), F.lit(0.0))
            .when(F.col(f"agree_{f}") == 1, w_agree_col)
            .otherwise(F.lit(w_dis))
        )
    j = j.withColumn("score", F.round(score, 6))
    return j.select(
        "id_a",
        "id_b",
        *agree_cols,
        "score",
        F.when(F.col("score") >= upper, F.lit("link"))
        .when(F.col("score") < lower, F.lit("non_link"))
        .otherwise(F.lit("possible"))
        .alias("decision"),
    )


def fs_waterfall(
    scored: DataFrame,
    field_params: "dict[str, tuple[float, float]]",
) -> DataFrame:
    """Splink-style match-weight waterfall — the per-pair EXPLANATION
    a reviewer reads before overriding a decision: every scored pair
    unpivots into one row per comparison field carrying that field's
    agreement outcome, its weight contribution, and the running score
    total in field order, so 'why did this pair link?' is answered by
    the rows themselves (big phone reward, small name penalty, ...).

    ``scored`` is fellegi_sunter_scores output (needs the
    agree_<field> columns and ``score``); ``field_params`` must be the
    SAME dict (insertion order defines the waterfall order and must
    match the score's addition order for the running total to land
    exactly on ``score`` at the last field — contributions accumulate
    as raw weight literals and round only for display).

    PRECONDITION: one row per unordered pair (the calibration_table
    convention) — a duplicate (id_a, id_b) row would interleave its
    field rows into the same running-total window and the final row
    would sum BOTH copies.

    Scale shape: one explode(k fields) + one window partitioned by the
    PAIR key ordered over k rows — bounded by the field count, never
    by data volume."""
    from pyspark.sql import Window

    entries = []
    for i, f in enumerate(field_params):
        wa, wd = fs_weights(*field_params[f])
        entries.append(
            F.struct(
                F.lit(i).alias("field_idx"),
                F.lit(f).alias("field"),
                F.col(f"agree_{f}").alias("agree"),
                fs_contrib_expr(F.col(f"agree_{f}"), wa, wd).alias(
                    "contrib"
                ),
            )
        )
    ex = scored.select(
        "id_a", "id_b", "score", F.explode(F.array(*entries)).alias("e")
    ).select(
        "id_a",
        "id_b",
        "score",
        "e.field_idx",
        "e.field",
        "e.agree",
        "e.contrib",
    )
    w = (
        Window.partitionBy("id_a", "id_b")
        .orderBy("field_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ex.select(
        "id_a",
        "id_b",
        "field_idx",
        "field",
        "agree",
        F.round("contrib", 6).alias("contrib"),
        F.round(F.sum("contrib").over(w), 6).alias("running_total"),
        "score",
    )
