"""Distributed evaluation: pairwise P/R/F1 of predicted clusters vs
labeled mention pairs (the BASELINE.json acceptance metric; micro-F1
semantics mirroring the reference's sklearn micro scores,
typerec/model.py:196-211, and the pure-Python oracle
``oracle.pairwise_f1`` — kept in lockstep by a parity test).

Plan: two broadcast-able joins of the labeled pairs against the
clusters table (clusters is the big side at scale, so the labeled
pairs drive the join), then one global aggregation — no collect of
cluster assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_effectiveness(
    unfiltered: DataFrame, filtered: DataFrame, doc_col: str = "url"
) -> DataFrame:
    """Corpus-level filter-effectiveness summary (reference
    ``evaluation.py:84-159``, which derives it by scraping 'Filtered to
    X/Y' log lines — here it is one aggregation over the real candidate
    tables). One row:

    - ``micro_avg_unfiltered`` / ``micro_avg_filtered``: total
      candidates / total mentions (the reference's
      ``faction_micro`` numerator/denominator split per mention);
    - ``macro_avg_unfiltered`` / ``macro_avg_filtered``: mean over
      documents of the per-document mean candidates per mention
      (the reference's ``avg_*_micro`` — its "micro" names actually
      average per-doc averages, i.e. macro; we use the standard names);
    - ``reduction_micro``: total filtered / total unfiltered — the
      search-space shrink factor the type filter buys the scorer.

    Both inputs are candidate tables keyed by (doc, mention_id);
    mentions with zero surviving candidates count 0 filtered."""
    u = unfiltered.groupBy(doc_col, "mention_id").agg(
        F.count("*").alias("n_u")
    )
    f = filtered.groupBy(doc_col, "mention_id").agg(F.count("*").alias("n_f"))
    m = u.join(f, [doc_col, "mention_id"], "left").select(
        doc_col, "mention_id", "n_u", F.coalesce("n_f", F.lit(0)).alias("n_f")
    )
    per_doc = m.groupBy(doc_col).agg(
        F.sum("n_u").alias("du"),
        F.sum("n_f").alias("df"),
        F.count("*").alias("dm"),
    )
    return per_doc.agg(
        F.round(F.sum("du") / F.sum("dm"), 6).alias("micro_avg_unfiltered"),
        F.round(F.sum("df") / F.sum("dm"), 6).alias("micro_avg_filtered"),
        F.round(F.avg(F.col("du") / F.col("dm")), 6).alias(
            "macro_avg_unfiltered"
        ),
        F.round(F.avg(F.col("df") / F.col("dm")), 6).alias(
            "macro_avg_filtered"
        ),
        F.round(F.sum("df") / F.sum("du"), 6).alias("reduction_micro"),
    )


def pairwise_f1_spark(clusters: DataFrame, labeled_pairs: DataFrame) -> DataFrame:
    """clusters (mention_key, cluster_id) × labeled_pairs
    (url_a, mention_id_a, url_b, mention_id_b, same_entity) → one-row DataFrame
    (precision, recall, f1, tp, fp, fn, tn). Pairs whose either side is
    not in the clusters table are skipped (oracle semantics)."""
    lp = labeled_pairs.select(
        F.concat_ws("#", "url_a", F.col("mention_id_a").cast("string")).alias("ka"),
        F.concat_ws("#", "url_b", F.col("mention_id_b").cast("string")).alias("kb"),
        F.col("same_entity").cast("boolean").alias("same"),
    )
    ca = clusters.select(
        F.col("mention_key").alias("ka"), F.col("cluster_id").alias("cid_a")
    )
    cb = clusters.select(
        F.col("mention_key").alias("kb"), F.col("cluster_id").alias("cid_b")
    )
    joined = lp.join(ca, "ka").join(cb, "kb")
    pred = F.col("cid_a") == F.col("cid_b")
    counts = joined.agg(
        F.sum((pred & F.col("same")).cast("long")).alias("tp"),
        F.sum((pred & ~F.col("same")).cast("long")).alias("fp"),
        F.sum((~pred & F.col("same")).cast("long")).alias("fn"),
        F.sum((~pred & ~F.col("same")).cast("long")).alias("tn"),
    ).select(
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("tp", "fp", "fn", "tn")]
    )
    p = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(1.0))
    r = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(F.lit(1.0))
    return counts.select(
        p.alias("precision"), r.alias("recall"), "tp", "fp", "fn", "tn"
    ).select(
        "precision",
        "recall",
        F.when(
            F.col("precision") + F.col("recall") > 0,
            2 * F.col("precision") * F.col("recall")
            / (F.col("precision") + F.col("recall")),
        )
        .otherwise(F.lit(0.0))
        .alias("f1"),
        "tp", "fp", "fn", "tn",
        # guards against a vacuous perfect score: if key formats ever
        # drift the joins go empty and f1 would read 1.0 — consumers
        # must check this is > 0
        (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")).alias(
            "n_pairs_evaluated"
        ),
    )


def bcubed_metrics(assignments: DataFrame) -> DataFrame:
    """B-cubed precision/recall/F1 (Bagga & Baldwin '98) of predicted
    clusters vs gold classes — the per-RECORD counterpart of
    ``pairwise_f1_spark`` (pairwise F1 weights a cluster's error
    quadratically in its size; B-cubed weights each record equally, so
    it is the standard second axis for grading ER cluster output).

    ``assignments``: one row per record with (rec_id, cluster_id,
    class_id) — predicted cluster and gold class.

    For record i with cluster C(i) and class T(i), the overlap
    o(i) = |C(i) ∩ T(i)| depends only on the (cluster, class) CELL the
    record falls in, so the whole metric collapses to aggregations
    over the contingency cells — NO self-join, no per-record fanout:

        B3P = (1/N) * sum_cells m^2 / |cluster|
        B3R = (1/N) * sum_cells m^2 / |class|

    where m is the cell size. Plan: three hash aggregations (cells,
    cluster sizes, class sizes) + two joins of the cell table against
    the two size tables — every intermediate is at most one row per
    distinct (cluster, class) pair, far smaller than the input at any
    scale. Returns one row (n_records, bcubed_precision,
    bcubed_recall, bcubed_f1), rounded to 6.
    """
    cells = assignments.groupBy("cluster_id", "class_id").agg(
        F.count("*").alias("m")
    )
    csize = assignments.groupBy("cluster_id").agg(
        F.count("*").alias("cs")
    )
    tsize = assignments.groupBy("class_id").agg(F.count("*").alias("ts"))
    per_cell = (
        cells.join(csize, "cluster_id")
        .join(tsize, "class_id")
        .agg(
            F.sum(F.col("m") * F.col("m") / F.col("cs")).alias("pnum"),
            F.sum(F.col("m") * F.col("m") / F.col("ts")).alias("rnum"),
            F.sum("m").alias("n"),
        )
    )
    p = F.col("pnum") / F.col("n")
    r = F.col("rnum") / F.col("n")
    return per_cell.select(
        F.col("n").alias("n_records"),
        F.round(p, 6).alias("bcubed_precision"),
        F.round(r, 6).alias("bcubed_recall"),
        F.round(2 * p * r / (p + r), 6).alias("bcubed_f1"),
    )


def score_pr_curve(
    scored: DataFrame,
    label_col: str = "is_match",
    score_col: str = "score",
) -> DataFrame:
    """Precision/recall/F1 sweep over every distinct score threshold —
    the curve a user reads to SET the Fellegi–Sunter upper/lower
    cutoffs instead of guessing them. One row per distinct score s:
    metrics for the policy "link every pair with score ≥ s".

    Shape: per-score aggregation (one partial-agg shuffle over the
    scored pairs), then a cumulative window over the DISTINCT scores
    only — for an FS model with k compared fields that is ≤ 3^k rows
    (agree/disagree/missing per field), so the unpartitioned window is
    the intentionally-tiny kind (same pattern as global_rank's offset
    compose), not a data-sized global sort. All three metrics are
    ratios of exact integer counts: P = ct/cp, R = ct/tt,
    F1 = 2·ct/(cp+tt) — no float accumulation anywhere."""
    from pyspark.sql import Window

    per = scored.groupBy(score_col).agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.col(label_col).cast("long")).alias("n_true"),
    )
    w = Window.orderBy(F.col(score_col).desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per.select(
        F.col(score_col).alias("threshold"),
        F.sum("n_pairs").over(w).alias("cum_pairs"),
        F.sum("n_true").over(w).alias("cum_true"),
    )
    totals = per.agg(F.sum("n_true").alias("tot_true"))
    return cum.crossJoin(F.broadcast(totals)).select(
        "threshold",
        "cum_pairs",
        "cum_true",
        F.round(F.col("cum_true") / F.col("cum_pairs"), 6).alias("prec"),
        F.round(F.col("cum_true") / F.col("tot_true"), 6).alias("rec"),
        F.round(
            2 * F.col("cum_true") / (F.col("cum_pairs") + F.col("tot_true")), 6
        ).alias("f1"),
    )


def comb2(col: str) -> F.Column:
    """Exact C(x, 2) in integer space — bigint multiply then integer
    `div`, never double division (the exact-arithmetic convention from
    the selfjoin_pairs advice: a double-divided pair count silently
    loses exactness past 2^53). The ONE canonical implementation;
    SQL oracles spell the same idiom as (x*(x-1))//2."""
    return F.expr(
        f"(cast({col} as bigint) * (cast({col} as bigint) - 1)) div 2"
    )


def cluster_agreement_metrics(assignments: DataFrame) -> DataFrame:
    """Rand index, adjusted Rand index, and normalized mutual
    information of predicted clusters vs gold classes — the
    partition-agreement axis alongside pairwise F1 (quadratic in
    cluster size) and B-cubed (per-record). ARI corrects Rand for
    chance agreement (Hubert & Arabie '85); NMI is MI over the sqrt
    entropy normalization (the scikit-learn default).

    ``assignments``: one row per record with (cluster_id, class_id),
    same contract as ``bcubed_metrics``.

    Everything reduces to the contingency cells, so the plan is three
    hash aggregations + one join of the cell table against the two
    size tables — no pair materialization. Pair-count components
    C(x,2) are summed in INTEGER space (bigint multiply + `div` —
    the exact-arithmetic convention from the selfjoin_pairs advice);
    only the final ratios go through doubles. Degenerate partitions
    (one giant cluster / all singletons on both sides) have zero
    entropy or a zero ARI denominator: both emit NULL rather than a
    fabricated 0-or-1 (documented; the DuckDB twin's CASE guards
    return NULL identically).

    Returns one row: (n_records, rand_index, adjusted_rand, nmi),
    floats rounded to 6.
    """
    cells = assignments.groupBy("cluster_id", "class_id").agg(
        F.count("*").alias("m")
    )
    csize = assignments.groupBy("cluster_id").agg(F.count("*").alias("a"))
    tsize = assignments.groupBy("class_id").agg(F.count("*").alias("b"))
    n_row = assignments.agg(F.count("*").cast("long").alias("n"))
    cell_stats = (
        cells.join(csize, "cluster_id")
        .join(tsize, "class_id")
        .crossJoin(F.broadcast(n_row))
        .agg(
            F.sum(comb2("m")).alias("s_cells"),
            F.sum(
                F.col("m")
                * F.log(
                    F.col("m").cast("double")
                    * F.col("n").cast("double")
                    / (F.col("a").cast("double") * F.col("b").cast("double"))
                )
            ).alias("mi_num"),
            F.max("n").alias("n"),
        )
    )
    a_stats = csize.agg(
        F.sum(comb2("a")).alias("s_a"),
        F.sum(F.col("a") * F.log(F.col("a").cast("double"))).alias("e_a"),
    )
    b_stats = tsize.agg(
        F.sum(comb2("b")).alias("s_b"),
        F.sum(F.col("b") * F.log(F.col("b").cast("double"))).alias("e_b"),
    )
    s = cell_stats.crossJoin(a_stats).crossJoin(b_stats)
    n_d = F.col("n").cast("double")
    c_n2 = (F.col("n") * (F.col("n") - 1)).cast("double") / 2
    ri = (
        c_n2
        + 2 * F.col("s_cells").cast("double")
        - F.col("s_a").cast("double")
        - F.col("s_b").cast("double")
    ) / c_n2
    expected = (
        F.col("s_a").cast("double") * F.col("s_b").cast("double") / c_n2
    )
    ari_den = (
        (F.col("s_a").cast("double") + F.col("s_b").cast("double")) / 2
        - expected
    )
    ari = F.when(
        ari_den != 0, (F.col("s_cells").cast("double") - expected) / ari_den
    )
    mi = F.col("mi_num") / n_d
    h_c = F.log(n_d) - F.col("e_a") / n_d
    h_k = F.log(n_d) - F.col("e_b") / n_d
    # epsilon, not 0: a degenerate partition's entropy is ln(n) minus
    # n*ln(n)/n — zero in exact math but a libm-dependent float
    # residual in practice; a bare > 0 could emit NULL in one engine
    # and a garbage near-0 division in the other. The +,*,/ in the ARI
    # guard are IEEE-identical cross-engine, so it needs no epsilon.
    nmi = F.when(
        (h_c > 1e-12) & (h_k > 1e-12), mi / F.sqrt(h_c * h_k)
    )
    return s.select(
        F.col("n").alias("n_records"),
        F.round(ri, 6).alias("rand_index"),
        F.round(ari, 6).alias("adjusted_rand"),
        F.round(nmi, 6).alias("nmi"),
    )


CALIBRATION_BANDS = [-5.0, 0.0, 5.0, 10.0, 15.0]


def calibration_table(
    scored: DataFrame,
    truth: DataFrame,
    bands: "list[float]" = CALIBRATION_BANDS,
) -> DataFrame:
    """Reliability table for the Fellegi-Sunter scorer: band the
    scored pairs by log2-odds score, and per band compare the
    EMPIRICAL match rate against the MEAN POSTERIOR probability the
    model claims — the calibration check a reviewer runs before
    trusting thresholds picked off the score axis. The posterior uses
    the blocked population's own empirical prior:
    odds = 2^score * prior/(1-prior), p = odds/(1+odds).

    Banding is on the score (a rounded sum of identical weight
    literals in both engines — exactly reproducible), NOT on p:
    pow() is libm-dependent at the last ulp, so banding on p could
    flip a boundary row between engines; p only ever enters
    aggregated means, where round(6) absorbs ulp and sum-order noise.

    Scale: one pair-key join against truth, one k-band hash
    aggregate. Returns per band: (band, n_pairs, n_true,
    empirical_rate, mean_posterior, calibration_gap), floats rounded
    to 6, ordered by band lower edge.
    """
    canon_truth = (
        truth.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
        .withColumn("_t", F.lit(1))
    )
    # scored keys canonicalized too: rank-ordered pair generators
    # (sorted neighborhood) emit (earlier-rank, later-rank), not
    # (smaller-id, larger-id). FS scores are symmetric in the pair, so
    # reordering is safe; the caller owns one-row-per-unordered-pair.
    canon_scored = scored.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        "score",
    )
    j = canon_scored.join(canon_truth, ["id_a", "id_b"], "left")
    tot = j.agg(
        F.count("*").cast("long").alias("np"),
        F.sum(F.coalesce("_t", F.lit(0))).cast("long").alias("nt"),
    )
    prior = F.col("nt").cast("double") / F.col("np").cast("double")
    prior_odds = prior / (F.lit(1.0) - prior)
    odds = F.pow(F.lit(2.0), F.col("score")) * prior_odds
    p = odds / (F.lit(1.0) + odds)
    edges = sorted(bands)
    band = F.when(F.col("score") < edges[0], F.lit(f"1:<{edges[0]}"))
    for i, (lo, hi) in enumerate(zip(edges, edges[1:]), start=2):
        band = band.when(
            F.col("score") < hi, F.lit(f"{i}:[{lo},{hi})")
        )
    band = band.otherwise(F.lit(f"{len(edges) + 1}:>={edges[-1]}"))
    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            band.alias("band"),
            F.coalesce("_t", F.lit(0)).alias("is_true"),
            p.alias("p"),
        )
        .groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("is_true").cast("long").alias("n_true"),
            F.round(
                F.sum("is_true").cast("double") / F.count("*"), 6
            ).alias("empirical_rate"),
            F.round(F.avg("p"), 6).alias("mean_posterior"),
            F.round(
                F.abs(
                    F.avg("p")
                    - F.sum("is_true").cast("double") / F.count("*")
                ),
                6,
            ).alias("calibration_gap"),
        )
    )


def capture_recapture(pairs_a: DataFrame, pairs_b: DataFrame) -> DataFrame:
    """Chapman capture-recapture estimate of the total duplicate-pair
    population from TWO independent detection passes (Petersen/Lincoln
    two-list estimator with Chapman's bias correction — the dedup
    literature's answer to "how many dups did my blocking MISS?";
    cf. Lahiri & Larsen JASA'05 on linkage population estimation).

    ``pairs_a`` / ``pairs_b``: the VERIFIED pairs each detector
    surfaced, (id_a, id_b) canonical. Pairs both detectors caught are
    the "marked recaptures"; the estimator extrapolates to pairs
    NEITHER caught:

        N_hat = (n_a + 1) * (n_b + 1) // (n_both + 1) - 1

    computed in integer floor arithmetic (exact in both engines, no
    rounding guard needed — same trade as truth_discovery's
    micro-units). Returns ONE row: (n_a, n_b, n_both, chapman_total,
    coverage_a, coverage_b) where coverage_x = n_x / chapman_total
    rounded to 6 — the per-detector recall estimate NO ground truth
    was needed for.

    Shape: tag-union -> one pair-keyed hash aggregate -> one global
    aggregate (all map-side partials); no window, no collect. The
    independence assumption between detectors is the estimator's own
    (documented) precondition — correlated detectors bias N_hat low,
    which is why the two passes should block on UNRELATED keys."""
    a = pairs_a.select("id_a", "id_b").distinct().select(
        "id_a", "id_b", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    b = pairs_b.select("id_a", "id_b").distinct().select(
        "id_a", "id_b", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    per_pair = (
        a.unionByName(b)
        .groupBy("id_a", "id_b")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    # coalesce: two EMPTY detectors must yield (0, 0, 0, 0), not a row
    # of NULLs — the documented integer-count contract (coverage is
    # NULL there: 0/0 pairs estimates nothing, in both engines)
    tot = per_pair.agg(
        F.coalesce(F.sum("in_a"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.sum("in_b"), F.lit(0)).cast("long").alias("n_b"),
        F.coalesce(F.sum(F.col("in_a") * F.col("in_b")), F.lit(0))
        .cast("long")
        .alias("n_both"),
    )
    chapman = F.expr("((n_a + 1) * (n_b + 1)) div (n_both + 1) - 1")
    return tot.select(
        "n_a",
        "n_b",
        "n_both",
        chapman.cast("long").alias("chapman_total"),
        F.round(F.col("n_a") / chapman, 6).alias("coverage_a"),
        F.round(F.col("n_b") / chapman, 6).alias("coverage_b"),
    )


def gmd_metrics(assignments: DataFrame) -> DataFrame:
    """Generalized Merge Distance with unit costs (Menestrina, Whang &
    Garcia-Molina, VLDB 2010 "Evaluating entity resolution results"):
    the minimum number of cluster SPLIT + MERGE edit operations that
    transform the predicted clustering into the gold one — the fourth
    grading axis next to pairwise F1 / B-cubed / (A)RI+NMI, and the
    one a data steward actually experiences ("how many repair actions
    until this is right?").

    ``assignments``: one row per record with (rec_id, cluster_id,
    class_id) — predicted cluster and gold class.

    The paper's Slice algorithm collapses to contingency-cell counts
    for unit costs: every predicted cluster must first split into its
    nonempty (cluster ∩ class) cells (k cells → k-1 splits), then the
    cells merge back into each class (k cells → k-1 merges):

        splits = Σ_clusters (distinct classes in cluster − 1)
        merges = Σ_classes  (distinct clusters in class  − 1)
        GMD    = splits + merges

    Plan: ONE hash aggregation to the distinct cells, then two
    aggregations over the cell table — no self-join, no per-record
    fanout, all integer arithmetic (the only metric on the sheet with
    an exactness guarantee independent of float summation order).
    Returns one row (n_records, n_clusters, n_classes, splits, merges,
    gmd) — all BIGINT."""
    cells = assignments.groupBy("cluster_id", "class_id").agg(
        F.count("*").alias("m")
    )
    by_cluster = cells.groupBy("cluster_id").agg(
        F.count("*").alias("parts")
    )
    by_class = cells.groupBy("class_id").agg(F.count("*").alias("parts"))
    splits = by_cluster.agg(
        F.count("*").cast("long").alias("n_clusters"),
        (F.sum("parts") - F.count("*")).cast("long").alias("splits"),
    )
    merges = by_class.agg(
        F.count("*").cast("long").alias("n_classes"),
        (F.sum("parts") - F.count("*")).cast("long").alias("merges"),
    )
    n = cells.agg(F.sum("m").cast("long").alias("n_records"))
    return (
        n.crossJoin(splits)
        .crossJoin(merges)
        .select(
            "n_records",
            "n_clusters",
            "n_classes",
            "splits",
            "merges",
            (F.col("splits") + F.col("merges")).cast("long").alias("gmd"),
        )
    )
