"""Graph analytics over web-scale link graphs: PageRank centrality
(the crawl-side quality signal: Common Crawl publishes host-level
centrality ranks computed exactly this way, and training-data
pipelines use them to weight/filter domains), label-propagation
communities, and degree-ordered triangle counting — all as DataFrame
loops/joins.

Design (pure DataFrame ops, one shuffle per iteration):

- Power iteration with damping: ``r_{t+1}(v) = (1-d)/N + d·(Σ_{u→v}
  r_t(u)/deg(u) + dangling_t/N)`` — the dangling-mass term keeps the
  distribution stochastic when sink nodes exist.
- The contribution join shuffles edges on ``src`` (rank+degree lookup)
  then partial-aggregates on ``dst`` — map-side combine collapses each
  partition to ≤|V| rows before the exchange. Degree is computed ONCE
  and re-joined (it never changes).
- The dangling mass is a 1-row aggregate broadcast-crossJoined back —
  never collected to the driver.
- ``N`` is a scalar ``count()`` (one aggregate job at build time —
  the MLlib convention; it parameterizes literals, no data moves).
- Ranks are rounded to 1e-9 after every iteration: float addition is
  order-dependent in the last bits, so re-rounding each round keeps
  the engine bit-synchronized with the unrolled-SQL oracle and stops
  drift compounding (same convention as operators/kmeans.py).
- ``localCheckpoint`` per iteration truncates the growing lineage
  (same pattern as clustering.connected_components).

Skew: a mega-indegree node (a "google.com") concentrates its
contribution SUM, not its rows — partial aggregation bounds the
per-task state at one row per (partition, dst). No salting needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    n_iter: int = 3,
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan et al.
    2007, the near-linear community detector used on web/host graphs)
    over edges(src, dst) → (node, label) after ``n_iter`` rounds.

    Each round every node adopts the most frequent label among its
    neighbors (graph treated as undirected; self-loops dropped,
    multi-edges collapsed), ties broken by the SMALLEST label — the
    synchronous deterministic variant, so the result is a pure
    function of (graph, n_iter): reproducible across partitionings and
    engines, unrolled exactly in the SQL oracle. Labels start as the
    node ids.

    Scale (one shuffle pair per round, hub-safe): the neighbor-label
    count is a partial-aggregated groupBy (dst, label); the per-node
    argmax is NOT a window sort but ``max(struct(count, -label))`` —
    an ordinary aggregate, so a 10^8-degree hub collapses map-side to
    one row per (partition, dst) and no single task ever sorts a hub's
    neighborhood (same skew reasoning as pagerank's contribution sum).
    ``localCheckpoint`` per round truncates the iterative lineage."""
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # symmetric closure: every endpoint appears as a src
    labels = sym.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(n_iter):
        votes = (
            sym.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy("dst", "label")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            votes.groupBy("dst")
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("label")).alias("neg"))
                ).alias("m")
            )
            .select(
                F.col("dst").alias("node"), (-F.col("m.neg")).alias("label")
            )
            .localCheckpoint(eager=True)
        )
    return labels


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over
    edges(src, dst) treated as an undirected simple graph (self-loops
    dropped, direction and multiplicity collapsed) — the web-graph
    cohesion signal (link-spam farms have near-zero clustering;
    genuine communities are triangle-dense).

    Returns (node, degree, n_triangles, clustering_coeff) for every
    node, ``clustering_coeff = 2·T / (deg·(deg−1))`` and 0.0 when
    deg < 2 (explicit guard — Spark's non-ANSI x/0 would yield NULL).

    Scale — the degree-ordered orientation trick (Chiba–Nishizeki /
    Schank–Wagner, the MapReduce-era standard): orient every canonical
    edge from its (degree, id)-smaller endpoint to the larger, so each
    triangle is enumerated EXACTLY once (its order-minimal vertex sees
    it) and, critically, every node's oriented out-degree is
    O(√m) on any graph — a 10^8-degree hub emits √m wedges instead of
    deg² (the wedge join's fanout is bounded by arboricity, not by the
    skewed degree distribution). Three hash joins, no windows; the
    wedge join keys on the oriented edge endpoints."""
    canon = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        canon.select(F.col("u").alias("node"))
        .union(canon.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("deg_v"))
    # orient from (deg, id)-smaller to larger: total order → each
    # triangle appears exactly once as a→b, b→c, a→c
    fwd = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    o = (
        canon.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
        .localCheckpoint(eager=True)
    )
    e1 = o.select(F.col("a"), F.col("b"))
    e2 = o.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = o.select(F.col("a"), F.col("b").alias("c"))
    tris = e1.join(e2, "b").join(e3, ["a", "c"])
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    # coalesce BEFORE the ratio: a triangle-less node left-joins to
    # NULL, and a NULL numerator would leak NULL (not 0.0) through the
    # degree>=2 branch
    n_tri = F.coalesce("n_triangles", F.lit(0))
    coeff = F.when(
        F.col("degree") >= 2,
        F.round(
            2.0
            * n_tri.cast("double")
            / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            n_tri.alias("n_triangles"),
            coeff.alias("clustering_coeff"),
        )
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """edges(src, dst) → (node, rank) after ``n_iter`` damped power
    iterations from the uniform distribution. Self-loops dropped,
    duplicate edges collapsed (simple-graph semantics)."""
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        # degenerate graph (no edges survive the self-loop filter):
        # empty rank table, not a division by zero
        return nodes.select(
            F.col("node"), F.lit(0.0).alias("rank")
        )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # degree never changes: join it into the edge table ONCE and
    # checkpoint, so each iteration pays one join (ranks), not two
    e_deg = e.join(deg, "src").localCheckpoint(eager=True)
    src_nodes = (
        e_deg.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    base = F.lit((1.0 - damping) / n)
    for _ in range(n_iter):
        contrib = (
            e_deg.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("deg")).alias("s"))
        )
        dangling = (
            ranks.join(src_nodes, "node", "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    base
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("s"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n))
                    ),
                    9,
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.round("r", 6).alias("rank"))


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity Q of a community assignment over edges(src,
    dst) — the standard scalar for judging a community detector's
    output (LPA here): Q = sum over communities of
    [intra_edges/m - (degree_sum/2m)^2], computed on the same
    canonicalized undirected graph ``label_propagation`` uses
    (self-loops dropped, multi-edges collapsed, symmetrized), so the
    two operators always talk about the same m. With S = |sym| = 2m
    the per-community term is intra_sym/S - (degsum/S)^2. All counts
    are taken over edges with BOTH endpoints labeled: a
    partially-labeled input yields the (consistently normalized)
    modularity of the labeled subgraph rather than a silently skewed
    mix of full-graph m and partial sums.

    Scale shape: hash aggregates only — intra counts from one
    edge-to-label join, degree sums from the src side, one final
    k-row aggregate; no windows, hub-safe for the same reason LPA is
    (a hub's edges collapse map-side in the counts).

    Returns one row: (n_edges, n_communities, modularity) with Q
    rounded to 6.
    """
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    sym = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    la = labels.select(
        F.col("node").alias("src"), F.col("label").alias("la")
    )
    lb = labels.select(
        F.col("node").alias("dst"), F.col("label").alias("lb")
    )
    # every count (S, intra, degree sums) comes from the SAME
    # both-endpoints-labeled edge table: a partially-labeled input
    # yields the modularity of the labeled subgraph, consistently
    # normalized, instead of mixing full-graph m with partial sums
    # (symmetry survives the filter — if one direction drops, so does
    # the reverse edge)
    tagged = sym.join(la, "src").join(lb, "dst")
    s_row = tagged.agg(F.count("*").cast("long").alias("s"))
    intra = (
        tagged.where(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count("*").cast("long").alias("intra"))
    )
    deg = tagged.groupBy(F.col("la").alias("label")).agg(
        F.count("*").cast("long").alias("degsum")
    )
    per = deg.join(intra, "label", "left").select(
        "label",
        F.coalesce("intra", F.lit(0)).alias("intra"),
        "degsum",
    )
    s_d = F.col("s").cast("double")
    term = F.col("intra").cast("double") / s_d - (
        F.col("degsum").cast("double") / s_d
    ) * (F.col("degsum").cast("double") / s_d)
    return (
        per.crossJoin(F.broadcast(s_row))
        .agg(
            F.expr("max(s) div 2").alias("n_edges"),
            F.count("*").cast("long").alias("n_communities"),
            F.round(F.sum(term), 6).alias("modularity"),
        )
    )


def kcore(edges: DataFrame, k: int, max_iter: int = 20) -> DataFrame:
    """k-core extraction by iterative peeling (Batagelj–Zaveršnik
    semantics, distributed as the synchronous "peel all under-k nodes
    each round" fixpoint — the Scalable K-Core shape of the
    Pregel/GraphX literature): repeatedly delete every node whose
    degree in the SURVIVING subgraph is < k until none is deleted.
    The k-core is the web-graph's spam/cohesion backbone filter —
    link farms and drive-by pages fall out of low cores, dense genuine
    communities persist (Alvarez-Hamelin et al., NIPS'05).

    ``edges(src, dst)`` is treated as an undirected simple graph
    (self-loops dropped, direction/multiplicity collapsed). Returns
    (node, core_degree) for every node of the k-core, core_degree =
    its degree within the core (≥ k by construction).

    Scale shape: each round is two LEFT-SEMI joins of the surviving
    edge set against the surviving node set (equi on src, then dst)
    plus one partial-aggregated degree count — no window, no sort, no
    per-node state beyond one count row; a mega-degree hub collapses
    map-side exactly like pagerank's contribution sum. The edge set
    only ever SHRINKS, so round cost is monotone non-increasing;
    ``localCheckpoint`` per round truncates the iterative lineage.
    Rounds to fixpoint ≤ the longest peel chain (O(diameter)-ish in
    practice; the classic pathological path graph needs O(n) — the
    same bound every synchronous peel implementation carries).
    Early-stops when a round deletes nothing: the alive-count check is
    one O(1)-row aggregate per round (same cadence policy as
    clustering.connected_components). Raises RuntimeError if
    ``max_iter`` rounds do not reach the fixpoint, so a truncated peel
    can never masquerade as the k-core (same contract as
    matching.greedy_matching / swoosh)."""
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("src").agg(F.count("*").alias("core_degree"))
    alive = deg.where(F.col("core_degree") >= k).localCheckpoint(eager=True)
    n_alive = alive.count()
    converged = n_alive == 0
    for _ in range(max_iter):
        if n_alive == 0:
            converged = True  # the empty core is a fixpoint
            break
        surv = (
            sym.join(alive.select("src"), "src", "left_semi")
            .join(
                alive.select(F.col("src").alias("dst")), "dst", "left_semi"
            )
        )
        nxt = (
            surv.groupBy("src")
            .agg(F.count("*").alias("core_degree"))
            .where(F.col("core_degree") >= k)
            .localCheckpoint(eager=True)
        )
        n_next = nxt.count()
        sym = surv.localCheckpoint(eager=True)
        alive = nxt
        if n_next == n_alive:
            converged = True
            break
        n_alive = n_next
    if not converged and n_alive > 0:
        # returning the partially-peeled set would present nodes the
        # next rounds WOULD peel as core members with wrong degrees —
        # same error-over-silent-truncation contract as
        # matching.greedy_matching and swoosh (code-review w15: a
        # 50-node path at k=2 peels two endpoints per round and needs
        # ~24 rounds, not the default 20)
        raise RuntimeError(
            f"kcore(k={k}) did not reach the peel fixpoint in "
            f"{max_iter} rounds ({n_alive} nodes still alive); "
            f"raise max_iter"
        )
    return alive.select(F.col("src").alias("node"), "core_degree")


def hits(edges: DataFrame, n_iter: int = 3) -> DataFrame:
    """HITS hubs and authorities (Kleinberg, JACM'99) over a directed
    graph — the complement to pagerank for link analysis: a good HUB
    points at many good authorities (directories, link lists, index
    pages), a good AUTHORITY is pointed at by many good hubs. On a
    host graph the two scores separate aggregator hosts from content
    hosts, which a single PageRank conflates.

    Determinism/parity contract (the pagerank conventions): self-loops
    dropped and multi-edges collapsed up front; scores re-rounded to
    1e-9 after every half-step and to 1e-6 on output. Normalization is
    L1 (scores sum to 1) rather than Kleinberg's L2 — the ranking is
    identical (normalization is a positive scalar per half-step) and
    L1 keeps the oracle exact: no sqrt, so both engines compute the
    same rational-arithmetic-then-round values. A half-step whose
    total mass is zero (no edges into any scored node) keeps the zero
    vector instead of dividing by it.

    Scale shape per half-step: one join of the edge table against the
    current score vector + one hash aggregate keyed by the opposite
    endpoint (map-side partial collapse bounds viral hubs — the LPA
    argument), one scalar total (broadcast back), one left join to
    re-attach scoreless nodes at 0. Edges and nodes checkpoint once
    up front; score vectors checkpoint per iteration (flat lineage).

    Returns (node, hub, authority) for every node in the simple
    graph.
    """
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node",
            F.lit(0.0).alias("hub"),
            F.lit(0.0).alias("authority"),
        )
    h = nodes.withColumn("s", F.lit(1.0 / n))
    a = h

    def _half(vec: DataFrame, key_in: str, key_out: str) -> DataFrame:
        raw = (
            e.join(vec.withColumnRenamed("node", key_in), key_in)
            .groupBy(F.col(key_out).alias("node"))
            .agg(F.sum("s").alias("r"))
        )
        tot = raw.agg(
            F.coalesce(F.sum("r"), F.lit(0.0)).alias("t")
        )
        return (
            nodes.join(raw, "node", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "node",
                F.round(
                    F.when(
                        F.col("t") > 0.0,
                        F.coalesce(F.col("r"), F.lit(0.0)) / F.col("t"),
                    ).otherwise(F.lit(0.0)),
                    9,
                ).alias("s"),
            )
            .localCheckpoint(eager=True)
        )

    for _ in range(n_iter):
        # authorities from hubs (follow edges), then hubs from the NEW
        # authorities (the standard in-iteration ordering)
        a = _half(h, "src", "dst")
        h = _half(a, "dst", "src")
    return (
        h.withColumnRenamed("s", "hub")
        .join(a.withColumnRenamed("s", "authority"), "node")
        .select("node", F.round("hub", 6).alias("hub"),
                F.round("authority", 6).alias("authority"))
    )


def adamic_adar(
    edges: DataFrame, max_degree: "int | None" = None
) -> DataFrame:
    """Adamic–Adar link prediction over an undirected graph: score
    every NON-adjacent pair that shares at least one neighbor by
    sum over common neighbors w of 1/ln(deg(w)) — common neighbors
    count, rare common neighbors count more. In the ER similarity
    graph this is the missed-match suggester: blocking never
    generated the pair, or its direct score fell below threshold,
    but the neighborhood asserts it (an o—A—B path predicts o—B).
    Complements cluster_conflicts' n_unscored audit from the
    generative side.

    Scale shape: one wedge self-join keyed by the common neighbor —
    fanout per node w is deg(w)², the same head-shape as triangle
    counting BUT without the degree-orientation rescue (link
    prediction needs every wedge, not one per triangle). The standard
    mitigation is principled here, not a shortcut: a super-hub
    contributes 1/ln(deg) ≈ 0 per wedge while generating deg² of
    them, so ``max_degree`` excludes nodes above the cap from the
    COMMON-NEIGHBOR role (their edges still count toward degrees and
    adjacency). None = exact over all wedges. A common neighbor
    always has degree >= 2, so ln(deg) > 0 by construction.

    Returns (id_a, id_b, n_common, aa_score) with id_a < id_b,
    existing edges excluded, aa_score rounded to 1e-6.
    """
    half = edges.where(F.col("src") != F.col("dst")).select("src", "dst")
    sym = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("src").alias("w")).agg(
        F.count("*").cast("long").alias("deg")
    )
    mid = deg if max_degree is None else deg.where(
        F.col("deg") <= max_degree
    )
    # wedges through w: (a, w) x (w, b), a < b
    left = sym.select(F.col("dst").alias("w"), F.col("src").alias("a"))
    right = sym.select(F.col("src").alias("w"), F.col("dst").alias("b"))
    # join degrees BEFORE the wedge self-join: filtering capped hubs
    # first shrinks the explosive join's input, and the degree table
    # is node-sized (never force-broadcast it — Catalyst may still
    # choose broadcast when it fits)
    right_deg = right.join(mid, "w")
    wedges = left.join(right_deg, "w").where(F.col("a") < F.col("b"))
    scored = wedges.groupBy(
        F.col("a").alias("id_a"), F.col("b").alias("id_b")
    ).agg(
        F.count("*").cast("long").alias("n_common"),
        F.round(F.sum(F.lit(1.0) / F.log(F.col("deg"))), 6).alias(
            "aa_score"
        ),
    )
    existing = sym.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("id_a"), F.col("dst").alias("id_b")
    )
    return scored.join(existing, ["id_a", "id_b"], "left_anti")


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB'04):
    PageRank with the teleport mass restricted to a SEED set of
    trusted nodes — trust flows out from hand-verified hosts along
    links, and spam hosts (reachable mainly from other spam) end up
    with near-zero trust even when raw PageRank ranks them well. The
    standard crawl-curation demotion signal next to host_authority's
    neutral rank.

    Same determinism/parity conventions as pagerank: self-loops
    dropped, multi-edges collapsed, dangling mass redistributed — to
    the SEED distribution here, not uniformly — and scores re-rounded
    to 1e-9 per iteration, 1e-6 on output. ``seeds`` is a one-column
    DataFrame (``node``); seeds absent from the graph are ignored,
    and an empty effective seed set returns all-zero trust rather
    than dividing by zero (the graph has no trusted entry points —
    itself a finding).

    Scale shape per iteration: identical to pagerank (one edge-score
    join + dst-keyed aggregate + one dangling-mass scalar) plus a
    broadcast-joined seed indicator column resolved once up front.

    Returns (node, trust) for every node in the simple graph.
    """
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    seed_nodes = nodes.join(
        seeds.select("node").distinct(), "node", "semi"
    )
    nodes = (
        nodes.join(
            seed_nodes.withColumn("_s", F.lit(1)), "node", "left"
        )
        .select("node", F.coalesce("_s", F.lit(0)).alias("is_seed"))
        .localCheckpoint(eager=True)
    )
    n_seed = nodes.agg(F.sum("is_seed")).collect()[0][0] or 0
    if n_seed == 0:
        # empty graph or no trusted entry points: all-zero trust
        return nodes.select("node", F.lit(0.0).alias("trust"))
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    e_deg = e.join(deg, "src").localCheckpoint(eager=True)
    src_nodes = e_deg.select(F.col("src").alias("node")).distinct()
    # teleport vector: 1/|seeds| on seeds, 0 elsewhere — also the
    # starting distribution (the TrustRank convention)
    tele = F.col("is_seed") / F.lit(float(n_seed))
    ranks = nodes.withColumn("r", tele)
    for _ in range(n_iter):
        contrib = (
            e_deg.join(
                ranks.select(F.col("node").alias("src"), "r"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("deg")).alias("s"))
        )
        dangling = ranks.join(src_nodes, "node", "left_anti").agg(
            F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm")
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "is_seed",
                F.round(
                    (F.lit(1.0 - damping) + F.lit(damping) * F.col("dm"))
                    * tele
                    + F.lit(damping)
                    * F.coalesce(F.col("s"), F.lit(0.0)),
                    9,
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.round("r", 6).alias("trust"))
