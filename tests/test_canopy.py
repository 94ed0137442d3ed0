"""Canopy clustering (operators/canopy.py): the distributed
MIS-rounds + removal-time formulation must equal the SEQUENTIAL
lowest-id-first canopy pass of McCallum, Nigam & Ungar exactly —
checked on hand cases and hypothesis-random similarity graphs."""

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from type_filtered_entity_linker_spark.operators.canopy import (
    canopy_clusters,
)


def _ref_canopy(ids, sim, s1, s2):
    """The textbook sequential pass, pick order = lowest remaining id:
    elect min(pool) as center, its canopy = itself + every POOLED node
    loose-similar to it, then drop the center and its tight ball from
    the pool."""
    remaining = set(ids)
    out = set()
    while remaining:
        c = min(remaining)
        remaining.discard(c)
        out.add((c, c))
        for x in remaining:
            if sim.get((min(c, x), max(c, x)), 0.0) >= s1:
                out.add((c, x))
        for x in list(remaining):
            if sim.get((min(c, x), max(c, x)), 0.0) >= s2:
                remaining.discard(x)
    return out


def _dfs(spark, ids, sim):
    nodes = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    pairs = spark.createDataFrame(
        [(a, b, s) for (a, b), s in sorted(sim.items())],
        "doc_a long, doc_b long, jaccard double",
    )
    return nodes, pairs


def _run(spark, ids, sim, s1, s2, **kw):
    nodes, pairs = _dfs(spark, ids, sim)
    return {
        (r.center, r.member)
        for r in canopy_clusters(nodes, pairs, s1, s2, **kw).collect()
    }


def test_canopy_overlap_and_pool_removal(spark):
    # 1-2 tight (2 leaves the pool), 2-3 loose only: 3 is in canopy(1)?
    # no (1-3 dissimilar) — 3 becomes its own center, and 2 is ALSO in
    # canopy(3)? no: 2 left the pool when 1 was elected (rtime(2)=1 <
    # 3). Overlap instead comes from 1-4 loose: 4 in canopy(1) AND,
    # staying pooled, its own center later.
    ids = [1, 2, 3, 4]
    sim = {(1, 2): 0.9, (2, 3): 0.6, (1, 4): 0.6}
    got = _run(spark, ids, sim, s1=0.5, s2=0.8)
    assert got == _ref_canopy(ids, sim, 0.5, 0.8) == {
        (1, 1), (1, 2), (1, 4),
        (3, 3),
        (4, 4),
    }


def test_canopy_every_node_covered_and_isolated_nodes_self_center(spark):
    ids = [1, 2, 3, 10]
    sim = {(1, 2): 0.95, (1, 3): 0.95}
    got = _run(spark, ids, sim, s1=0.9, s2=0.9)
    assert got == _ref_canopy(ids, sim, 0.9, 0.9) == {
        (1, 1), (1, 2), (1, 3), (10, 10),
    }
    members = {m for _, m in got}
    assert members == set(ids)  # nobody is left canopy-less


def test_canopy_rejects_inverted_thresholds_and_round_overflow(spark):
    ids = [1, 2]
    sim = {(1, 2): 0.9}
    with pytest.raises(ValueError, match="tight threshold"):
        _run(spark, ids, sim, s1=0.8, s2=0.5)
    # a 3-chain needs 2 MIS rounds (3 is 2's neighbor, 2 is 1's):
    # max_rounds=1 leaves node 3 pooled and must raise, not truncate
    ids = [1, 2, 3]
    sim = {(1, 2): 0.9, (2, 3): 0.9}
    with pytest.raises(RuntimeError, match="did not drain"):
        _run(spark, ids, sim, s1=0.9, s2=0.9, max_rounds=1)


GRAPHS = st.builds(
    lambda n, edges: (
        list(range(n)),
        {
            (a, b): s
            for (a, b), s in zip(
                [p for p in itertools.combinations(range(n), 2)], edges
            )
            if s is not None
        },
    ),
    st.integers(min_value=2, max_value=8),
    st.lists(
        st.one_of(
            st.none(),
            st.sampled_from([0.3, 0.55, 0.7, 0.85, 1.0]),
        ),
        min_size=28,
        max_size=28,
    ),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(GRAPHS)
def test_canopy_matches_sequential_reference(spark, graph):
    ids, sim = graph
    got = _run(spark, ids, sim, s1=0.5, s2=0.8)
    assert got == _ref_canopy(ids, sim, 0.5, 0.8)
