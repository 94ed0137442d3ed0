"""Transitive entity clustering: iterative connected components as a
DataFrame loop (reference O33 — implicit in the reference, where
mentions sharing a winning Q-id form a cluster
(el/entity_disambiguator.py:63); explicit here per the north rule).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC'14) — converges in
O(log n) rounds, each round a pair of shuffles. Catalyst has no fixpoint
operator, so the loop is driver-coordinated with
``localCheckpoint(eager=True)`` per iteration to truncate lineage
(SURVEY.md §4 item 3). Convergence = stable (count, hash-sum) checksum
of the canonically-oriented edge set.

Node ids are strings (mention keys ``url#mid`` sort after entity keys
``E:Q…`` only lexically — either orientation is fine since cluster ids
only need to be deterministic, and the oracle uses the same min rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    b = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = b.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.withColumn("m", F.least("mn", "src")).select("src", "m")
    return (
        b.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    b = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = b.groupBy("src").agg(F.min("dst").alias("m"))
    nbrs = b.join(mins, "src").select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    selfs = mins.select(F.col("src"), F.col("m").alias("dst"))
    return nbrs.union(selfs).where(F.col("src") != F.col("dst")).distinct()


def _checksum(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count("*").alias("c"),
        # 32-bit hash summed as long: overflow-safe under ANSI mode
        F.coalesce(F.sum(F.hash("src", "dst").cast("long")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["c"]), int(row["h"])


def connected_components(
    edges: DataFrame, max_iter: int = 25, checkpoint_every: int = 1,
    check_every: int = 2, stats: list | None = None,
) -> DataFrame:
    """edges(src, dst) → assignments(node, cluster_id) for every node
    appearing in the edge set. cluster_id = min node id in component.
    ``stats`` (optional) collects {iteration, edges} convergence
    metrics at each checksum (north rule: per-stage metrics).

    ``check_every``: convergence is tested every N iterations (default
    2) — each checksum is a driver-blocking agg job, and on deep graphs
    (long chains → ~log n rounds) halving the cadence halves that
    overhead. Sound because the round map is DETERMINISTIC: equal
    checksums k rounds apart would otherwise be a k-cycle, which the
    large-star/small-star convergence proof (Kiveris et al. §4)
    excludes — so equality at the check implies the fixpoint was
    reached (at worst check_every-1 rounds earlier)."""
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = _checksum(e)
    for i in range(max_iter):
        e = _small_star(_large_star(e))
        if (i + 1) % checkpoint_every == 0:
            e = e.localCheckpoint(eager=True)
        if (i + 1) % check_every and (i + 1) < max_iter:
            continue
        cur = _checksum(e)
        if stats is not None:
            stats.append({"iteration": i + 1, "edges": cur[0]})
        if cur == prev:
            break
        prev = cur
    # converged: every edge is (node → component-min). Roots self-assign.
    nodes = e.select(F.col("src").alias("node"), F.col("dst").alias("cluster_id"))
    roots = e.select(F.col("dst").alias("node"), F.col("dst").alias("cluster_id"))
    return nodes.union(roots).distinct()


def cluster_mentions(
    links: DataFrame, nil_edges: DataFrame, all_mentions: DataFrame,
    cc_stats: list | None = None,
) -> DataFrame:
    """Final clusters table (mention_key, cluster_id).

    Graph = bipartite mention↔entity edges from argmax links, plus
    NIL-mention dedup edges. Mentions in no edge are singletons.
    Entity nodes are internal (prefixed 'E:') and dropped from the
    output; cluster_id = min MENTION key in the component, recomputed
    after CC so entity-node ids never leak into cluster ids.
    """
    mkey = F.concat_ws("#", "url", "mention_id")
    link_edges = links.select(
        mkey.alias("src"), F.concat(F.lit("E:"), F.col("item_id")).alias("dst")
    )
    edges = link_edges.union(nil_edges.select("src", "dst"))
    assign = connected_components(edges, stats=cc_stats)
    # min MENTION key per component via agg+join (no collect_list — a
    # head-entity component can hold millions of mentions at scale)
    m_assign = assign.where(~F.col("node").startswith("E:"))
    mins = m_assign.groupBy("cluster_id").agg(F.min("node").alias("cid"))
    mention_assign = m_assign.join(mins, "cluster_id").select(
        F.col("node").alias("mention_key"), "cid"
    )
    singles = (
        all_mentions.select(mkey.alias("mention_key"))
        .join(mention_assign.select("mention_key"), "mention_key", "left_anti")
        .withColumn("cid", F.col("mention_key"))
    )
    return (
        mention_assign.unionByName(singles)
        .select("mention_key", F.col("cid").alias("cluster_id"))
    )


def pivot_clusters(
    edges: DataFrame,
    max_rounds: int = 8,
    stats: list | None = None,
) -> DataFrame:
    """Parallel-pivot correlation clustering (KwikCluster — Ailon,
    Charikar & Newman, JACM'08 — in the deterministic parallel-rounds
    form of Chierichetti, Dalvi & Kumar, KDD'14 / Pan et al.'s
    ClusterWild!, NeurIPS'15): the principled ALTERNATIVE to
    transitive closure for dirty-ER resolution. Connected components
    merges records linked by ANY path — one bad edge chains two real
    entities together. Pivot clustering instead grows each cluster
    only ONE hop around a pivot: a chain a—b—c with no a—c edge splits,
    bounding how far a single spurious edge can propagate (KwikCluster
    is a 3-approximation to optimal correlation clustering in
    expectation; transitive closure has no such guarantee).

    Determinism without a random permutation: pi(v) is a hash order —
    the first 15 md5 hex chars of 'pivot:'||v, with the node id's own
    string appended as the tie-break suffix. Because the hash prefix
    has FIXED length, two keys are equal iff hash AND id string are
    equal, i.e. iff the node is the same — unique and totally ordered
    (lexicographically) for ANY id domain, with no pad width to
    truncate 13+-digit ids. The oracle replays the identical key, so
    cluster assignments hash-match across engines. Rounds:

    1. every active node finds the min key among its active neighbors;
    2. nodes whose own key beats that min (or with no active neighbor)
       become PIVOTS — local minima are never adjacent, so the pivot
       set is an independent set by construction;
    3. every active node adjacent to >= 1 pivot joins its MIN-key
       pivot neighbor; pivots self-assign; all of them deactivate;
    4. surviving edges are those with both endpoints still active.

    Each round peels at least the global-min node's whole
    neighborhood; expected O(log n) rounds w.h.p. (KDD'14 Thm 2).
    RAISES after ``max_rounds`` rather than returning a truncated
    clustering (the greedy_matching convention — the oracle unrolls
    the same bound).

    Scale shape: per round, one hash aggregate for the neighbor min
    (partial map-side collapse — a viral hub's million neighbor keys
    reduce before the shuffle, the LPA-hub argument), one broadcast-
    or-shuffle join of active against that aggregate, and min_by for
    the pivot election — never a window sort. Active set and edge set
    are localCheckpoint'ed per round (lineage truncation; at cluster
    scale the same barrier is a reliable-storage checkpoint).

    Returns (node, cluster_id, is_pivot, round_assigned) for every
    node with at least one NON-SELF edge (self-loops are discarded up
    front and contribute no node — singletons are the caller's
    left-join, as in cluster_mentions); cluster_id = the pivot's node
    id.
    """
    sym = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .union(
            edges.where(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
    )
    key = lambda c: F.concat(  # noqa: E731 — local key-builder
        F.substring(F.md5(F.concat(F.lit("pivot:"), c.cast("string"))), 1, 15),
        c.cast("string"),
    )
    active = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("k", key(F.col("node")))
        .localCheckpoint(eager=True)
    )
    b = (
        sym.join(
            active.select(
                F.col("node").alias("dst"), F.col("k").alias("kb")
            ),
            "dst",
        )
        .select("src", "dst", "kb")
        .localCheckpoint(eager=True)
    )
    out: "DataFrame | None" = None
    n_active = active.count()
    for r in range(1, max_rounds + 1):
        if n_active == 0:
            break
        nb = b.groupBy(F.col("src").alias("node")).agg(
            F.min("kb").alias("mnk")
        )
        piv = (
            active.join(nb, "node", "left")
            .where(F.col("mnk").isNull() | (F.col("k") < F.col("mnk")))
            .select("node")
        )
        asg = (
            b.join(piv.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.min_by("dst", "kb").alias("cluster_id"))
        )
        new = (
            piv.select(
                "node",
                F.col("node").alias("cluster_id"),
                F.lit(True).alias("is_pivot"),
                F.lit(r).cast("long").alias("round_assigned"),
            )
            .unionByName(
                asg.select(
                    "node",
                    "cluster_id",
                    F.lit(False).alias("is_pivot"),
                    F.lit(r).cast("long").alias("round_assigned"),
                )
            )
            .localCheckpoint(eager=True)
        )
        out = new if out is None else out.unionByName(new)
        active = active.join(
            new.select("node"), "node", "left_anti"
        ).localCheckpoint(eager=True)
        b = (
            b.join(active.select(F.col("node").alias("src")), "src", "semi")
            .join(active.select(F.col("node").alias("dst")), "dst", "semi")
            .localCheckpoint(eager=True)
        )
        n_active = active.count()
        if stats is not None:
            stats.append({"round": r, "active": n_active})
    if n_active > 0:
        raise RuntimeError(
            f"pivot_clusters did not converge in {max_rounds} rounds "
            f"({n_active} nodes still active); raise max_rounds"
        )
    if out is None:
        return (
            sym.select(
                F.col("src").alias("node"),
                F.col("src").alias("cluster_id"),
                F.lit(True).alias("is_pivot"),
                F.lit(0).cast("long").alias("round_assigned"),
            ).limit(0)
        )
    return out


def star_clusters(
    edges: DataFrame,
    max_rounds: int = 10,
    stats: list | None = None,
) -> DataFrame:
    """Star clustering (Aslam, Pelekhov & Rus, JGAA'04 — the offline
    greedy form) over an undirected similarity graph: the third member
    of the resolution family next to transitive closure
    (connected_components) and parallel-pivot correlation clustering
    (pivot_clusters). Where pivot clustering elects cluster seeds by a
    HASH order (any record equally likely to anchor its cluster), star
    clustering elects them by STATIC DEGREE — the record with the most
    direct similarity evidence becomes the cluster's center, and every
    cluster is a star: center + direct neighbors, one hop, never a
    chain. For dirty ER that means the best-attested record (the one
    agreeing with the most others) anchors each entity, which is also
    exactly the record survivorship would elect — and an o—A—B path
    whose middle record A carries both edges resolves to ONE entity
    centered on A, where hash-pivot may split it at a leaf.

    Sequential semantics being reproduced EXACTLY: compute each
    node's degree once on the full graph; repeatedly take the
    highest-priority unmarked node under the strict total order
    (degree DESC, node id ASC) as a CENTER and mark its unmarked
    neighbors as its SATELLITES, until every node is marked. Computed
    distributively as iterated locally-dominant election (the
    greedy_matching argument, vertex form): a node whose static
    priority beats every still-unmarked neighbor's would necessarily
    be picked before them by the sequential greedy — elect all such
    nodes at once, deactivate them and their neighbors, repeat: the
    resulting CENTER SET equals the sequential greedy's (the greedy-
    MIS-under-static-priority argument). Satellite ATTACHMENT is then
    a single post-fixpoint pass: each non-center joins its highest-
    priority adjacent center over the FINAL center set — which is the
    sequential marker, because the first-processed adjacent center IS
    the max-priority one. (Attaching per election round instead is
    WRONG: a satellite can be deactivated by a low-priority locally-
    dominant center in round 1 while its true, higher-priority
    sequential marker only becomes locally dominant in round 2 —
    caught by code review against the sequential reference.)
    Priorities never change mid-run (degrees are frozen up front, as
    in the offline algorithm), so the fixpoint equals the sequential
    output without ever materializing a global priority sort.

    Priority comparisons use native STRUCT ordering —
    struct(degree, -id) compared lexicographically — so there is no
    padded-string key to truncate and no degree*C+id linearization to
    overflow; node ids must be a signed numeric type (the negation is
    the ASC tie-break under max/greater-than).

    Scale shape per round: one hash aggregate for the neighbor
    priority max (partial map-side collapse — a viral hub's million
    neighbor structs reduce before the shuffle), one left join of the
    active set against it, one join+max-struct aggregate for satellite
    attachment, two semi joins to re-filter edges; never a window
    sort. Active and edge sets are localCheckpoint'ed per round
    (lineage truncation; at cluster scale the same barrier is a
    reliable-storage checkpoint). Each round elects at least the
    globally best alive node, and chains peel ~2 nodes per round
    (pathological worst case: rounds ~ diameter/2, same class as
    kcore's peel).

    RAISES RuntimeError after ``max_rounds`` rather than returning a
    truncated clustering (greedy_matching/pivot_clusters convention;
    the oracle unrolls the same bound). ``stats`` (optional) collects
    {round, active} per round — the per-stage-metrics contract.

    Returns (node, center_id, is_center, round_assigned, degree) for
    every node with at least one non-self edge; singleton handling is
    the caller's left-join, as in cluster_mentions.
    """
    half = edges.where(F.col("src") != F.col("dst")).select("src", "dst")
    sym = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    # static degree = distinct-neighbor count (sym has one row per
    # directed neighbor pair)
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    active = deg.select(
        F.col("src").alias("node"),
        F.col("deg").cast("long").alias("deg"),
        (-F.col("src")).cast("long").alias("ni"),
    ).localCheckpoint(eager=True)
    b = (
        sym.join(
            active.select(
                F.col("node").alias("dst"),
                F.col("deg").alias("dd"),
                F.col("ni").alias("dni"),
            ),
            "dst",
        )
        .select("src", "dst", "dd", "dni")
        .localCheckpoint(eager=True)
    )
    pr_own = F.struct(F.col("deg").alias("d"), F.col("ni").alias("ni"))
    all_nodes = active
    b0 = b
    centers: "DataFrame | None" = None
    n_active = active.count()
    for r in range(1, max_rounds + 1):
        if n_active == 0:
            break
        nb = b.groupBy(F.col("src").alias("node")).agg(
            F.max(
                F.struct(F.col("dd").alias("d"), F.col("dni").alias("ni"))
            ).alias("m")
        )
        cen = (
            active.join(nb, "node", "left")
            .where(F.col("m").isNull() | (pr_own > F.col("m")))
            .select(
                "node",
                "deg",
                F.lit(r).cast("long").alias("round_assigned"),
            )
            .localCheckpoint(eager=True)
        )
        centers = cen if centers is None else centers.unionByName(cen)
        # deactivate the new centers AND their still-active neighbors
        # (the neighbors are satellites-to-be; WHICH center they join
        # is decided after the fixpoint, not per round — see below)
        sat = (
            b.join(cen.select(F.col("node").alias("dst")), "dst")
            .select(F.col("src").alias("node"))
            .distinct()
        )
        dead = cen.select("node").unionByName(sat)
        active = active.join(dead, "node", "left_anti").localCheckpoint(
            eager=True
        )
        b = (
            b.join(active.select(F.col("node").alias("src")), "src", "semi")
            .join(active.select(F.col("node").alias("dst")), "dst", "semi")
            .localCheckpoint(eager=True)
        )
        n_active = active.count()
        if stats is not None:
            stats.append({"round": r, "active": n_active})
    if n_active > 0:
        raise RuntimeError(
            f"star_clusters did not converge in {max_rounds} rounds "
            f"({n_active} nodes still active); raise max_rounds"
        )
    empty = sym.select(
        F.col("src").alias("node"),
        F.col("src").alias("center_id"),
        F.lit(True).alias("is_center"),
        F.lit(0).cast("long").alias("round_assigned"),
        F.lit(0).cast("long").alias("degree"),
    ).limit(0)
    if centers is None:
        return empty
    # Satellite attachment AFTER the election fixpoint, against the
    # FULL edge table and the FINAL center set: the sequential greedy
    # marks a satellite when its FIRST-processed (= highest-priority)
    # adjacent center is elected, and a higher-priority neighbor can
    # become a center in a LATER parallel round than a lower-priority
    # locally-dominant one — attaching per round therefore diverged
    # from the sequential contract (found by code review against the
    # sequential reference on an 8-node graph; pinned in
    # tests/test_wave16_ops.py). round_assigned for a satellite is its
    # center's election round — the parallel timestamp of the
    # sequential marking event.
    centers = centers.localCheckpoint(eager=True)
    att = (
        b0.join(
            centers.select(
                F.col("node").alias("dst"),
                F.col("round_assigned").alias("_cr"),
            ),
            "dst",
        )
        .groupBy(F.col("src").alias("node"))
        .agg(
            F.max(
                F.struct(
                    F.col("dd").alias("d"),
                    F.col("dni").alias("ni"),
                    F.col("dst").alias("c"),
                    F.col("_cr").alias("r"),
                )
            ).alias("m")
        )
        .select(
            "node",
            F.col("m.c").alias("center_id"),
            F.col("m.r").alias("round_assigned"),
        )
    )
    sats = all_nodes.join(
        centers.select("node"), "node", "left_anti"
    ).select("node", "deg")
    return centers.select(
        "node",
        F.col("node").alias("center_id"),
        F.lit(True).alias("is_center"),
        "round_assigned",
        F.col("deg").alias("degree"),
    ).unionByName(
        sats.join(att, "node").select(
            "node",
            "center_id",
            F.lit(False).alias("is_center"),
            "round_assigned",
            F.col("deg").alias("degree"),
        )
    )


def cluster_conflicts(
    assign: DataFrame,
    scored: DataFrame,
    link_threshold: float,
    id_col: str = "rec_id",
    score_col: str = "score",
) -> DataFrame:
    """Transitive-closure audit: for every multi-member cluster, break
    its membership back into record pairs and check each against the
    DIRECT pairwise evidence. Connected-components clustering links a
    pair the moment a path of confident edges connects it — this
    report shows what that transitivity committed you to: per cluster,
    how many intra-cluster pairs are backed by a confident link
    (score >= link_threshold), how many were scored but fell short
    ("weak" — linked only through intermediaries), and how many were
    never compared at all (blocking never generated them). A cluster
    with many weak/unscored pairs is the over-merge candidate a
    reviewer should open first; the reference repo's clustering
    (postprocessing in el/entity_linker.py) has no such audit — this
    is the production-QA layer on top.

    ``assign`` is (id_col, cluster_id) for EVERY record (singletons
    self-assigned — they are skipped here); ``scored`` holds canonical
    id_a < id_b pairs with ``score_col`` (the Fellegi–Sunter scorer's
    output shape). NULL-score semantics: an unscored pair counts in
    n_unscored only; min_score ignores it (NULL when nothing scored).

    Scale shape: the only non-linear step is intra-pair enumeration, a
    self-equi-join on cluster_id costing sum over clusters of
    |c|^2/2 — bounded by the largest cluster, which is exactly the
    pathology this audit exists to surface; run it AFTER clustering
    where component sizes are already known (filter `sizes` first if a
    viral component must be excluded). Everything else is hash
    aggregates and one pair-key join against the scored table.

    Returns (cluster_id, n_members, n_intra_pairs, n_links, n_weak,
    n_unscored, min_score), one row per cluster with >= 2 members.
    """
    sizes = (
        assign.groupBy("cluster_id")
        .agg(F.count("*").cast("long").alias("n_members"))
        .where(F.col("n_members") >= 2)
    )
    members = assign.join(sizes.select("cluster_id"), "cluster_id")
    intra = (
        members.alias("a")
        .join(members.alias("b"), "cluster_id")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            "cluster_id",
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
    )
    j = intra.join(
        scored.select("id_a", "id_b", F.col(score_col).alias("_s")),
        ["id_a", "id_b"],
        "left",
    )
    per = j.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("n_intra_pairs"),
        F.sum(
            F.when(F.col("_s") >= link_threshold, 1).otherwise(0)
        ).cast("long").alias("n_links"),
        F.sum(
            F.when(F.col("_s") < link_threshold, 1).otherwise(0)
        ).cast("long").alias("n_weak"),
        F.sum(F.col("_s").isNull().cast("int")).cast("long").alias(
            "n_unscored"
        ),
        F.round(F.min("_s"), 6).alias("min_score"),
    )
    return sizes.join(per, "cluster_id").select(
        "cluster_id",
        "n_members",
        "n_intra_pairs",
        "n_links",
        "n_weak",
        "n_unscored",
        "min_score",
    )


def cannot_link_violations(
    assignments: DataFrame,
    constraints: DataFrame,
    id_col: str = "rec_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Audit cluster assignments against CANNOT-LINK constraints —
    the steward-feedback half of constrained ER (Wagstaff & Cardie
    ICML'00 constraints applied to linkage QA): a constraint
    (id_a, id_b) asserts two records are KNOWN distinct entities; any
    cluster containing both is over-merged and goes to the review
    queue. Transitive closure is exactly what makes this audit
    necessary: two individually-plausible links can chain records a
    steward knows apart (the el_transitive_conflicts query audits
    score-level conflicts; this one audits curated hard constraints).

    Returns one row per constraint: (id_a, id_b, cluster_a,
    cluster_b, violated) with violated = 1 iff both ends landed in
    the same cluster. Shape: two id-keyed equi-joins against the
    assignment table, no window, no collect — at 100 TB the
    constraint table is the small side and broadcasts."""
    a = assignments.select(
        F.col(id_col).alias("id_a"), F.col(cluster_col).alias("cluster_a")
    )
    b = assignments.select(
        F.col(id_col).alias("id_b"), F.col(cluster_col).alias("cluster_b")
    )
    return (
        constraints.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            "cluster_a",
            "cluster_b",
            (F.col("cluster_a") == F.col("cluster_b"))
            .cast("int")
            .alias("violated"),
        )
    )


def repair_overmerges(
    assignments: DataFrame,
    scored: DataFrame,
    constraints: DataFrame,
    strong_threshold: float,
    id_col: str = "rec_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Steward-driven cluster repair — the action half of the
    cannot-link audit: every cluster that violates a constraint is
    re-clustered from ONLY its strong evidence (scored pairs with
    score >= ``strong_threshold``), while untouched clusters pass
    through unchanged. This is the standard remediation for
    transitive over-merge (one weak edge chained two real entities):
    dropping sub-threshold edges inside the violated cluster lets the
    strong cores separate, and members left with no strong edge
    become singletons.

    Returns (id_col, cluster_col, repaired) — ``repaired`` = 1 on the
    rows that went through re-clustering (their cluster id is the min
    member id of their strong-edge component), 0 on pass-through rows.

    PRECONDITION: cluster labels in ``assignments`` must follow the
    repo-wide min-member-id convention (every CC/pipeline assignment
    here does). Repaired components are labeled by their min member
    rec_id; under an arbitrary surrogate labeling that id could
    collide with an UNTOUCHED cluster's label and silently merge
    unrelated entities downstream. Min-member labels cannot collide:
    components are disjoint record sets, and an untouched label is
    one of its own members' ids.

    Scale shape: violated clusters are a small audited fraction of a
    100 TB corpus, so the member-id semi-joins broadcast and the CC
    rerun sees only their internal edge set; the pass-through side is
    one anti-join, no shuffle of the scored table beyond the strong
    filter. A strong edge can never span two violated clusters (any
    pair scoring >= strong also scored >= the review threshold that
    built the clusters), so re-clustering per-cluster and globally
    coincide."""
    viol = cannot_link_violations(
        assignments, constraints, id_col=id_col, cluster_col=cluster_col
    ).where(F.col("violated") == 1)
    bad = viol.select(F.col("cluster_a").alias(cluster_col)).distinct()
    members = assignments.join(bad, cluster_col, "left_semi")
    strong = (
        scored.where(F.col("score") >= F.lit(strong_threshold))
        .join(
            members.select(F.col(id_col).alias("id_a")), "id_a", "left_semi"
        )
        .join(
            members.select(F.col(id_col).alias("id_b")), "id_b", "left_semi"
        )
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    redone = connected_components(strong).withColumnRenamed("node", id_col)
    repaired = (
        members.select(id_col)
        .join(redone, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("cluster_id", F.col(id_col))
            .cast("long")
            .alias(cluster_col),
            F.lit(1).alias("repaired"),
        )
    )
    untouched = assignments.join(bad, cluster_col, "left_anti").select(
        F.col(id_col),
        F.col(cluster_col).cast("long").alias(cluster_col),
        F.lit(0).alias("repaired"),
    )
    return untouched.unionByName(repaired)


def edge_support(edges: DataFrame) -> DataFrame:
    """Structural support of every similarity edge: its embeddedness
    (number of common neighbors of its endpoints) — the graph-QA
    complement to cluster_conflicts' score-based audit. A confident
    edge inside a real entity is usually embedded in triangles (the
    other records agree with both endpoints); an embeddedness-0 edge
    is a BRIDGE SUSPECT — the single thread holding two record groups
    together, exactly where transitive closure over-merges (a true
    bridge is always embeddedness-0; the converse fails only on
    longer cycles, making this the standard cheap surrogate for
    distributed bridge finding, which is inherently sequential).

    Shape: one wedge join keyed by the shared endpoint joined back to
    the canonical edge list — the triangle machinery's cost profile
    (per-node fanout deg², so cap upstream hubs if the similarity
    graph has them; after blocking it does not), then one hash
    aggregate. Returns (id_a, id_b, n_common, is_bridge_suspect)
    for every distinct non-self edge, id_a < id_b.
    """
    canon = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("id_a"),
            F.greatest("src", "dst").alias("id_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = canon.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).union(
        canon.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    )
    # common neighbors of (a, b): wedges a—w—b
    l = sym.select(F.col("u").alias("a"), F.col("v").alias("w"))
    r = sym.select(F.col("u").alias("w"), F.col("v").alias("b"))
    wed = (
        l.join(r, "w")
        .where(F.col("a") < F.col("b"))
        .groupBy(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return canon.join(wed, ["id_a", "id_b"], "left").select(
        "id_a",
        "id_b",
        F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
        (F.coalesce("n_common", F.lit(0)) == 0).alias(
            "is_bridge_suspect"
        ),
    )
