"""Property parity for the distributed per-block average-linkage HAC:
the synchronous one-merge-per-block-per-round DataFrame loop must
reproduce sequential UPGMA-style HAC (merge globally-best pair above
threshold, recompute, repeat) exactly, because blocks never interact."""

import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

from type_filtered_entity_linker_spark.operators.hac import hac_clusters


def ref_hac(node_ids, pair_list, t):
    """Sequential average-linkage HAC, observed-pairs mean, ties to
    (smaller cluster id, larger cluster id); single block."""
    sim = {(min(a, b), max(a, b)): s for a, b, s in pair_list}
    clusters = {r: {r} for r in node_ids}
    while True:
        best = None
        cids = sorted(clusters)
        for i, ca in enumerate(cids):
            for cb in cids[i + 1:]:
                cross = [
                    sim[(min(x, y), max(x, y))]
                    for x in clusters[ca]
                    for y in clusters[cb]
                    if (min(x, y), max(x, y)) in sim
                ]
                if not cross:
                    continue
                avg = sum(cross) / len(cross)
                if avg >= t:
                    key = (-avg, ca, cb)
                    if best is None or key < best[0]:
                        best = (key, ca, cb)
        if best is None:
            break
        _, ca, cb = best
        clusters[ca] |= clusters[cb]
        del clusters[cb]
    return {
        r: cid for cid, members in clusters.items() for r in members
    }


def _run(spark, node_ids, pair_list, t, block="b"):
    nodes = spark.createDataFrame(
        [(block, r) for r in node_ids], "block_key string, rec_id long"
    )
    pairs = spark.createDataFrame(
        [(block, min(a, b), max(a, b), s) for a, b, s in pair_list],
        "block_key string, id_a long, id_b long, sim long",
    )
    return {
        r.rec_id: r.cluster_id
        for r in hac_clusters(nodes, pairs, threshold=t).collect()
    }


PAIRS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=10),
    ).filter(lambda p: p[0] != p[1]),
    min_size=0,
    max_size=12,
    unique_by=lambda p: (min(p[0], p[1]), max(p[0], p[1])),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(PAIRS, st.sampled_from([3.0, 5.0, 8.0]))
def test_hac_matches_sequential_reference(spark, pair_list, t):
    node_ids = list(range(6))
    got = _run(spark, node_ids, pair_list, t)
    assert got == ref_hac(node_ids, pair_list, t)


def test_hac_rejects_chain_that_cc_would_merge(spark):
    # two tight triangles bridged by ONE high edge: connected
    # components glues all 6; average linkage refuses — the cross
    # average (one 10 + eight absent... observed mean over the single
    # bridge only AFTER both triangles collapse: (10)/9? no: observed
    # pairs only -> 10/1, so make the bridge explicit with low sims)
    tri_a = [(0, 1, 10), (0, 2, 10), (1, 2, 10)]
    tri_b = [(3, 4, 10), (3, 5, 10), (4, 5, 10)]
    bridge = [(2, 3, 10), (0, 3, 0), (1, 3, 0), (0, 4, 0), (1, 4, 0),
              (2, 4, 0), (0, 5, 0), (1, 5, 0), (2, 5, 0)]
    got = _run(spark, range(6), tri_a + tri_b + bridge, t=6.0)
    # triangles merge internally (avg 10); cross-cluster average
    # (10 + 8 zeros)/9 ≈ 1.1 < 6 — no over-merge
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_hac_singletons_and_multi_block(spark):
    nodes = spark.createDataFrame(
        [("x", 1), ("x", 2), ("y", 7), ("z", 9)],
        "block_key string, rec_id long",
    )
    pairs = spark.createDataFrame(
        [("x", 1, 2, 9)], "block_key string, id_a long, id_b long, sim long"
    )
    out = {
        (r.block_key, r.rec_id): r.cluster_id
        for r in hac_clusters(nodes, pairs, threshold=5.0).collect()
    }
    assert out == {("x", 1): 1, ("x", 2): 1, ("y", 7): 7, ("z", 9): 9}


def test_hac_vs_cc_disagreement_on_bridge(spark):
    # the er_hac_vs_cc machinery end-to-end in Spark: on the bridged
    # two-triangle graph, transitive closure glues all 6 nodes while
    # average linkage keeps two clusters — ARI/NMI must drop below 1,
    # proving the disagreement report fires when a bridge exists
    from pyspark.sql import functions as F

    from type_filtered_entity_linker_spark.operators.clustering import (
        connected_components,
    )
    from type_filtered_entity_linker_spark.operators.evaluation import (
        cluster_agreement_metrics,
    )

    tri_a = [(0, 1, 10), (0, 2, 10), (1, 2, 10)]
    tri_b = [(3, 4, 10), (3, 5, 10), (4, 5, 10)]
    bridge = [(2, 3, 10), (0, 3, 0), (1, 3, 0), (0, 4, 0), (1, 4, 0),
              (2, 4, 0), (0, 5, 0), (1, 5, 0), (2, 5, 0)]
    all_pairs = tri_a + tri_b + bridge
    nodes = spark.createDataFrame(
        [("b", r) for r in range(6)], "block_key string, rec_id long"
    )
    pairs = spark.createDataFrame(
        [("b", a, b, s) for a, b, s in all_pairs],
        "block_key string, id_a long, id_b long, sim long",
    )
    hac = hac_clusters(nodes, pairs, threshold=6.0)
    edges = pairs.where(F.col("sim") >= 6).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    cc = connected_components(edges).withColumnRenamed("node", "rec_id")
    asn = (
        hac.select("rec_id", "cluster_id")
        .join(cc.withColumnRenamed("cluster_id", "cc_id"), "rec_id", "left")
        .select(
            "rec_id",
            "cluster_id",
            F.coalesce("cc_id", F.col("rec_id")).alias("class_id"),
        )
    )
    m = cluster_agreement_metrics(asn).collect()[0]
    assert m.n_records == 6
    assert m.rand_index < 1.0
    assert m.adjusted_rand < 1.0
    # CC collapses to ONE cluster here — zero entropy on that side, so
    # NMI is NULL by the documented degenerate-partition contract
    assert m.nmi is None


def test_hac_strict_raises_on_round_exhaustion(spark):
    # a 5-record chain of uniform sims needs 4 merges; max_rounds=2
    # must raise rather than return a truncated dendrogram, and
    # strict=False must keep the old truncating behavior
    import pytest

    nodes = spark.createDataFrame(
        [("b", r) for r in range(5)], "block_key string, rec_id long"
    )
    pairs = spark.createDataFrame(
        [("b", a, b, 10) for a in range(5) for b in range(a + 1, 5)],
        "block_key string, id_a long, id_b long, sim long",
    )
    with pytest.raises(RuntimeError, match="merge fixpoint"):
        hac_clusters(nodes, pairs, threshold=5.0, max_rounds=2)
    out = hac_clusters(
        nodes, pairs, threshold=5.0, max_rounds=2, strict=False
    )
    # 2 merges happened, 3 clusters remain
    assert out.select("cluster_id").distinct().count() == 3
