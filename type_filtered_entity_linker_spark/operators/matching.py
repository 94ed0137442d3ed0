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


def monge_elkan_scores(
    records: DataFrame,
    pairs: DataFrame,
    field: str,
    id_col: str = "rec_id",
    round_to: int = 6,
) -> DataFrame:
    """Monge–Elkan hybrid string similarity (Monge & Elkan, KDD'96)
    for candidate pairs: tokenize the field, take each left token's
    BEST Jaro-Winkler match among the right tokens, average over left
    tokens — then symmetrize as the mean of both directions. The
    token-level max makes the score robust to word reorder and
    extra/missing words, which whole-string JW and Levenshtein are
    not; it is the standard scorer for multi-word names/addresses.

    JW uses the classic strcmp95 0.7 boost threshold — bit-identical
    to DuckDB's jaro_winkler_similarity on non-empty tokens, so the
    oracle can use the native SQL function.

    Plan shape: the pair stream joins each side's token table
    (posexplode keeps duplicate-token multiplicity; per-record token
    counts bound the fanout at |toks_a|·|toks_b| per pair — names and
    addresses are a handful of tokens, so this is a constant factor,
    never corpus-quadratic), JW runs as ONE Arrow-batched numpy UDF
    over the token-pair stream, then two hash aggregations (max per
    left-token instance, avg per pair) per direction.

    Returns (id_a, id_b, me_ab, me_ba, monge_elkan).
    """
    from ..functions.strings import jw_pandas_udf

    jw = jw_pandas_udf()
    toks = records.select(
        F.col(id_col).alias("rid"),
        F.posexplode(F.split(F.col(field), r"\s+")).alias("pos", "tok"),
    ).where(F.col("tok") != "")
    p = pairs.select("id_a", "id_b")
    ta = toks.select(
        F.col("rid").alias("id_a"),
        F.col("pos").alias("pos_a"),
        F.col("tok").alias("tok_a"),
    )
    tb = toks.select(
        F.col("rid").alias("id_b"),
        F.col("pos").alias("pos_b"),
        F.col("tok").alias("tok_b"),
    )
    cross = (
        p.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("s", jw(F.col("tok_a"), F.col("tok_b")))
    )
    # direction A->B: best match per LEFT token instance, then average
    ab = (
        cross.groupBy("id_a", "id_b", "pos_a")
        .agg(F.max("s").alias("best"))
        .groupBy("id_a", "id_b")
        .agg(F.avg("best").alias("me_ab"))
    )
    ba = (
        cross.groupBy("id_a", "id_b", "pos_b")
        .agg(F.max("s").alias("best"))
        .groupBy("id_a", "id_b")
        .agg(F.avg("best").alias("me_ba"))
    )
    return ab.join(ba, ["id_a", "id_b"]).select(
        "id_a",
        "id_b",
        F.round("me_ab", round_to).alias("me_ab"),
        F.round("me_ba", round_to).alias("me_ba"),
        F.round((F.col("me_ab") + F.col("me_ba")) / 2, round_to).alias(
            "monge_elkan"
        ),
    )


def greedy_matching(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    score_col: str = "score",
    max_rounds: int = 20,
    stats: "list | None" = None,
) -> DataFrame:
    """EXACT greedy (globally score-ordered) one-to-one matching,
    computed distributively as iterated locally-dominant edges
    (Preis '99; Manne & Bisseling '07): an edge that is the best at
    BOTH its endpoints under the strict total order (score DESC,
    left id ASC, right id ASC) is necessarily in the sequential
    greedy matching — accept every such edge at once, drop all edges
    touching a matched vertex, repeat until no edges remain. Because
    the per-side tie-breaks of mutual_best_match are exactly the
    restrictions of that one global order, each round's reciprocal-
    best set IS the locally-dominant set, so the fixpoint equals what
    a single-threaded pass over the globally sorted pair list would
    produce — without ever materializing a global sort. Each round
    matches at least the globally best remaining edge, and in
    practice the remaining graph shrinks geometrically (expected
    O(log n) rounds).

    Versus single-round reciprocal-best: vertices whose best partner
    preferred someone else get their next-best partner in a later
    round instead of staying unmatched — higher recall, same
    one-to-one guarantee, and the output is the canonical greedy
    matching the ER literature evaluates against.

    Input is treated as BIPARTITE (clean-clean ER): ``left_col`` ids
    and ``right_col`` ids are separate vertex namespaces (ids may
    numerically collide across columns without interacting).

    Scale: each round is two row_number windows + two anti joins, all
    keyed by per-side record ids (bounded fanout after blocking); the
    shrinking remainder is localCheckpoint'ed per round so lineage
    stays flat. The per-round convergence check doubles as the row
    count, so each round costs exactly one job. ``stats`` (optional)
    collects {round, matched, remaining} — the north rule's
    per-stage-metrics contract.

    Returns (left_col, right_col, score_col, match_round). Raises
    RuntimeError if ``max_rounds`` rounds leave edges unmatched, so a
    truncated matching can never silently masquerade as the greedy
    fixpoint (the driver oracle unrolls the same number of rounds).
    """
    remaining = pairs.select(left_col, right_col, score_col).localCheckpoint(
        eager=True
    )
    matched: "DataFrame | None" = None
    n_matched = 0
    n_remaining = remaining.count()
    for r in range(1, max_rounds + 1):
        if n_remaining == 0:
            break
        mb = mutual_best_match(
            remaining, left_col, right_col, score_col
        ).withColumn("match_round", F.lit(r))
        mb = mb.localCheckpoint(eager=True)
        matched = mb if matched is None else matched.unionByName(mb)
        # edges touching vertices matched in EARLIER rounds are already
        # gone from `remaining`, so anti-joining this round's matches
        # alone suffices — per-round cost tracks the new matches, not
        # the accumulated matching
        remaining = (
            remaining.join(mb.select(left_col), left_col, "left_anti")
            .join(mb.select(right_col), right_col, "left_anti")
            .localCheckpoint(eager=True)
        )
        n_remaining = remaining.count()
        if stats is not None:
            # count only THIS round's (checkpointed) matches and keep a
            # running total — recounting the accumulated union would be
            # O(rounds^2) scan work and an extra full-history job/round
            n_matched += mb.count()
            stats.append(
                {
                    "round": r,
                    "matched": n_matched,
                    "remaining": n_remaining,
                }
            )
    if n_remaining > 0:
        raise RuntimeError(
            f"greedy_matching did not converge in {max_rounds} rounds "
            f"({n_remaining} edges remain); raise max_rounds"
        )
    if matched is None:
        return pairs.select(
            left_col, right_col, score_col
        ).withColumn("match_round", F.lit(1)).limit(0)
    return matched.select(left_col, right_col, score_col, "match_round")


def group_linkage(
    left: DataFrame,
    right: DataFrame,
    scored_pairs: DataFrame,
    threshold: float,
    id_col: str = "rec_id",
    group_col: str = "grp",
    sim_col: str = "sim",
    round_to: int = 6,
) -> DataFrame:
    """Group linkage (On, Koudas, Lee & Srivastava, ICDE 2007): when
    the unit of resolution is a GROUP of records (a household, an
    author's paper set, a domain's page set), record-level matching
    under-measures — two groups match when their members pairwise
    align. BM similarity between groups G1, G2 under a one-to-one
    member matching M of record pairs with sim >= threshold:

        BM(G1, G2) = sum of sim over M / (|G1| + |G2| - |M|)

    — a Jaccard-style normalization: 1.0 iff the groups align
    perfectly member-for-member with sim 1.0, discounted by every
    unmatched member on either side. M here is the RECIPROCAL-BEST
    matching within each candidate group pair (the paper's greedy
    matching restricted to one round — the variant that needs no
    per-group-pair score sort; see mutual_best_match's scale argument;
    it is a lower bound on greedy/optimal BM).

    ``left``/``right`` are (id_col, group_col) membership tables —
    group sizes count ALL members, not just those in candidate pairs;
    ``scored_pairs`` is (id_a, id_b, sim_col) from upstream record
    blocking + scoring. Returns one row per group pair with at least
    one above-threshold candidate: (group_a, group_b, n_a, n_b,
    n_matched, sim_sum, bm_sim).

    Scale shape: the two row_number windows partition by (group_a,
    group_b, record) — fanout bounded by per-record candidates from
    blocking; group sizes are one hash aggregate per side; the final
    join is group-pair-keyed. Nothing scans a group cross-product.
    """
    ga = left.select(
        F.col(id_col).alias("id_a"), F.col(group_col).alias("group_a")
    )
    gb = right.select(
        F.col(id_col).alias("id_b"), F.col(group_col).alias("group_b")
    )
    p = (
        scored_pairs.where(F.col(sim_col) >= threshold)
        .join(ga, "id_a")
        .join(gb, "id_b")
    )
    wa = Window.partitionBy("group_a", "group_b", "id_a").orderBy(
        F.col(sim_col).desc(), F.col("id_b").asc()
    )
    wb = Window.partitionBy("group_a", "group_b", "id_b").orderBy(
        F.col(sim_col).desc(), F.col("id_a").asc()
    )
    m = (
        p.withColumn("_ra", F.row_number().over(wa))
        .withColumn("_rb", F.row_number().over(wb))
        .where((F.col("_ra") == 1) & (F.col("_rb") == 1))
    )
    per = m.groupBy("group_a", "group_b").agg(
        F.count("*").cast("long").alias("n_matched"),
        F.round(F.sum(sim_col), round_to).alias("sim_sum"),
    )
    na = left.groupBy(F.col(group_col).alias("group_a")).agg(
        F.count("*").cast("long").alias("n_a")
    )
    nb = right.groupBy(F.col(group_col).alias("group_b")).agg(
        F.count("*").cast("long").alias("n_b")
    )
    return (
        per.join(na, "group_a")
        .join(nb, "group_b")
        .select(
            "group_a",
            "group_b",
            "n_a",
            "n_b",
            "n_matched",
            "sim_sum",
            F.round(
                F.col("sim_sum")
                / (F.col("n_a") + F.col("n_b") - F.col("n_matched")),
                round_to,
            ).alias("bm_sim"),
        )
    )


def attach_best(
    scored: DataFrame,
    new_records: DataFrame,
    link_threshold: float,
    id_col: str = "rec_id",
) -> DataFrame:
    """Incremental ER: attach a NEW batch of records to EXISTING
    entities without re-clustering the world. ``scored`` holds
    candidate pairs (id_a = existing entity id, id_b = new record id,
    score); each new record takes its best-scoring existing candidate
    (ties broken by LOWEST existing id) and attaches iff that best
    score clears the link threshold — otherwise it spawns a new
    entity under its own id. Records that drew no candidates at all
    spawn too (left join), with a NULL best_score that distinguishes
    "never compared" from "compared and rejected" — the same
    tri-state the transitive-conflict audit reports.

    The per-record argmax is max(struct(score, -id_a)) — an ordinary
    partial-aggregating hash aggregate, NOT a window sort, so a viral
    new record with millions of candidates collapses map-side (the
    LPA/pagerank hub argument). One shuffle on the new-record id.

    Returns one row per new record: (rec_id, cluster_id, attached,
    best_score)."""
    best = scored.groupBy(F.col("id_b").alias(id_col)).agg(
        F.max(
            F.struct(
                F.col("score").alias("s"), (-F.col("id_a")).alias("neg")
            )
        ).alias("b")
    )
    return (
        new_records.select(id_col)
        .join(best, id_col, "left")
        .select(
            F.col(id_col),
            F.when(
                F.col("b.s") >= link_threshold, -F.col("b.neg")
            )
            .otherwise(F.col(id_col))
            .cast("long")
            .alias("cluster_id"),
            F.coalesce(
                F.col("b.s") >= link_threshold, F.lit(False)
            ).alias("attached"),
            F.col("b.s").alias("best_score"),
        )
    )


def stable_matching(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    score_col: str = "score",
    max_rounds: int = 20,
    stats: "list | None" = None,
) -> DataFrame:
    """Gale–Shapley STABLE one-to-one matching (deferred acceptance,
    left-proposing) — the third resolver in the matching family.
    mutual_best maximizes per-pair agreement, greedy_matching
    replicates the global score-sorted pass; stable matching instead
    guarantees NO BLOCKING PAIR: no unmatched (a, b) both preferring
    each other over their assigned partners — the property record
    stewards actually audit ('why is a linked to b' when a higher-
    scoring b' was free'). Preferences on both sides are (score DESC,
    partner id ASC); missing pairs are mutually unacceptable.

    Computed as parallel rounds of deferred acceptance: every free
    left proposes to its best not-yet-rejecting right; each right
    tentatively holds the best of {current hold} ∪ {new proposals}
    under (score DESC, left id ASC); losers' pairs are REJECTED and
    removed. By the McVitie–Wilson order-independence theorem the
    fixpoint equals the sequential left-proposing Gale–Shapley
    outcome (the left-optimal stable matching) regardless of proposal
    interleaving — so the parallel rounds are exact, not an
    approximation.

    Scale shape per round: one anti-join (free lefts), two
    row_number windows keyed by the respective side (per-record
    candidate fanout is blocking-bounded), two anti-joins for
    rejection pruning; remaining/engaged are localCheckpoint'ed (flat
    lineage). RAISES RuntimeError if free lefts with options survive
    ``max_rounds`` (the greedy_matching convention; the oracle
    unrolls the same bound and is idempotent past the fixpoint).

    Returns (left_col, right_col, score_col) — the left-optimal
    stable matching.
    """
    rem = pairs.select(left_col, right_col, score_col).localCheckpoint(
        eager=True
    )
    eng = rem.limit(0).localCheckpoint(eager=True)
    for r in range(1, max_rounds + 1):
        free = rem.select(left_col).distinct().join(
            eng.select(left_col), left_col, "left_anti"
        )
        n_free = free.count()
        if n_free == 0:
            break
        wa = Window.partitionBy(left_col).orderBy(
            F.col(score_col).desc(), F.col(right_col).asc()
        )
        props = (
            rem.join(free, left_col)
            .withColumn("_rn", F.row_number().over(wa))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        cont = eng.unionByName(props)
        wb = Window.partitionBy(right_col).orderBy(
            F.col(score_col).desc(), F.col(left_col).asc()
        )
        eng = (
            cont.withColumn("_rn", F.row_number().over(wb))
            .where(F.col("_rn") == 1)
            .drop("_rn")
            .localCheckpoint(eager=True)
        )
        rej = cont.join(eng, [left_col, right_col], "left_anti")
        rem = rem.join(
            rej.select(left_col, right_col),
            [left_col, right_col],
            "left_anti",
        ).localCheckpoint(eager=True)
        if stats is not None:
            stats.append({"round": r, "free": n_free})
    # re-check AFTER the loop: a run whose final round converges at
    # exactly max_rounds is a success, not a timeout
    n_left = (
        rem.select(left_col)
        .distinct()
        .join(eng.select(left_col), left_col, "left_anti")
        .count()
    )
    if n_left > 0:
        raise RuntimeError(
            f"stable_matching did not converge in {max_rounds} rounds "
            f"({n_left} free proposers remain); raise max_rounds"
        )
    return eng.select(left_col, right_col, score_col)
