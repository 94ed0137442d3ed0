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
