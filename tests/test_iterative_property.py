"""Property-based parity for the iterative DataFrame-loop operators:
PageRank and Lloyd's k-means agree with straightforward pure-Python /
numpy references on arbitrary small inputs. These pin the determinism
CONTRACTS (per-iteration re-rounding, id tie-breaks, dangling-mass
handling, lowest-id seeding) that the SQL oracles also rely on —
a contract drift would surface here before it surfaces as an
oracle-gate mismatch on fixture data."""

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def round_half_up(x: float, places: int) -> float:
    """Spark's F.round semantics: HALF_UP on the double's SHORTEST
    decimal repr (JVM BigDecimal.valueOf(double) == Double.toString),
    NOT on its exact binary expansion. The distinction bites at
    shortest-repr midpoints: 0.3959375 is exactly 0.39593749999999…778
    in binary, so exact-expansion HALF_UP at 6 places gives …937 while
    Spark (rounding the string "0.3959375") gives …938. Python round()
    and np.round are half-to-EVEN on the exact expansion — wrong on two
    counts. `repr(x)` is Python's shortest round-trip repr, identical
    to Double.toString's digits (verdict r03 root cause)."""
    q = Decimal(1).scaleb(-places)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))

from type_filtered_entity_linker_spark.operators.graph import pagerank
from type_filtered_entity_linker_spark.operators.kmeans import kmeans_topics

# small graphs: nodes 0..7, up to 14 directed edges (dups/self-loops
# allowed — the operator must drop them)
EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ),
    min_size=1,
    max_size=14,
)


def ref_pagerank(edge_list, n_iter=3, d=0.85):
    edges = {(s, t) for s, t in edge_list if s != t}
    if not edges:
        return {}
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    out = {}
    for s, t in edges:
        out.setdefault(s, set()).add(t)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dm = sum(r[v] for v in nodes if v not in out)
        base = (1.0 - d) / n
        nr = {}
        for v in nodes:
            contrib = sum(
                r[u] / len(out[u]) for u in nodes if u in out and v in out[u]
            )
            nr[v] = round_half_up(base + d * (contrib + dm / n), 9)
        r = nr
    return {v: round_half_up(x, 6) for v, x in r.items()}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(EDGES)
def test_pagerank_matches_reference(spark, edge_list):
    ref = ref_pagerank(edge_list)
    e = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(e, n_iter=3).collect()}
    assert got == ref


VECS = st.lists(
    st.lists(
        st.floats(
            min_value=-4.0, max_value=4.0, allow_nan=False, width=32
        ),
        min_size=3,
        max_size=3,
    ),
    min_size=2,
    max_size=10,
)


def ref_kmeans(vecs, k, n_iter):
    """numpy mirror of the operator contract: lowest-id seeds, double
    L2, ties -> lowest cid, centroid avg rounded to 1e-6 per round,
    empty clusters drop."""
    ids = list(range(len(vecs)))
    x = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    cents = {c: x[c].copy() for c in range(min(k, len(ids)))}

    def assign(cents):
        out = {}
        for i in ids:
            best = min(
                (float(((x[i] - v) ** 2).sum()), c) for c, v in cents.items()
            )
            out[i] = best[1]
        return out

    for _ in range(n_iter):
        a = assign(cents)
        new = {}
        for c in sorted(set(a.values())):
            members = [i for i in ids if a[i] == c]
            mean = x[members].mean(axis=0)
            new[c] = np.array([round_half_up(float(v), 6) for v in mean])
        cents = new
    final = assign(cents)
    return {
        i: (
            final[i],
            round_half_up(float(((x[i] - cents[final[i]]) ** 2).sum()), 6),
        )
        for i in ids
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(VECS)
def test_kmeans_matches_reference(spark, vec_list):
    k, n_iter = 3, 2
    ref = ref_kmeans(vec_list, k, n_iter)
    e = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vec_list)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["cluster_id"], r["dist2"])
        for r in kmeans_topics(e, k=k, n_iter=n_iter).collect()
    }
    # cluster ids must match exactly (same seeding + tie rules); dist2
    # is rounded to 1e-6 in both, compare with a 1-ulp-of-rounding slack
    assert got.keys() == ref.keys()
    for i in got:
        assert got[i][0] == ref[i][0], (i, got[i], ref[i])
        assert abs(got[i][1] - ref[i][1]) <= 1e-6, (i, got[i], ref[i])


# ----------------------------------------------------- merge upsert

from type_filtered_entity_linker_spark.operators.merge import merge_upsert

# target: key -> value; source: key -> (value, deleted)
TARGET = st.dictionaries(
    st.integers(min_value=0, max_value=9),
    st.text(alphabet="abc", min_size=1, max_size=3),
    max_size=8,
)
SOURCE = st.dictionaries(
    st.integers(min_value=0, max_value=9),
    st.tuples(
        st.text(alphabet="xyz", min_size=1, max_size=3), st.booleans()
    ),
    max_size=8,
)


def ref_merge(target: dict, source: dict) -> dict:
    out = dict(target)
    for k, (v, dead) in source.items():
        if dead:
            out.pop(k, None)
        else:
            out[k] = v
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(TARGET, SOURCE)
def test_merge_upsert_matches_dict_semantics(spark, target, source):
    """merge_upsert == plain dict update-with-tombstones, on arbitrary
    key overlap patterns (both empty inputs included)."""
    t = spark.createDataFrame(
        [(k, v) for k, v in target.items()], "k long, v string"
    )
    s = spark.createDataFrame(
        [(k, v, d) for k, (v, d) in source.items()],
        "k long, v string, dead boolean",
    )
    got = {
        r.k: r.v for r in merge_upsert(t, s, "k", delete_col="dead").collect()
    }
    assert got == ref_merge(target, source)


# ----------------------------------------------------------------- k-core

from type_filtered_entity_linker_spark.operators.graph import kcore  # noqa: E402


def ref_kcore(edge_list, k):
    """Sequential peel (Batagelj–Zaveršnik) — order-independent, so it
    is the fixpoint the synchronous distributed peel must reach."""
    adj = {}
    for s, t in edge_list:
        if s != t:
            adj.setdefault(s, set()).add(t)
            adj.setdefault(t, set()).add(s)
    alive = set(adj)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {v: len(adj[v] & alive) for v in alive}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(EDGES, st.integers(min_value=1, max_value=4))
def test_kcore_matches_reference(spark, edge_list, k):
    df = spark.createDataFrame(
        [(s, t) for s, t in edge_list], "src long, dst long"
    )
    got = {r.node: r.core_degree for r in kcore(df, k=k).collect()}
    assert got == ref_kcore(edge_list, k)


def test_kcore_chain_cascade(spark):
    # a 6-cycle with a 5-node tail: at k=2 the tail peels one node per
    # synchronous round (5 rounds), the cycle survives at degree 2 —
    # pins that the loop really iterates to the fixpoint rather than
    # stopping after the first peel
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    tail = [(6, 0), (7, 6), (8, 7), (9, 8), (10, 9)]
    df = spark.createDataFrame(cyc + tail, "src long, dst long")
    got = {r.node: r.core_degree for r in kcore(df, k=2).collect()}
    assert got == {i: 2 for i in range(6)}
    # and a too-high k empties the graph entirely
    assert kcore(df, k=4).count() == 0


def test_kcore_raises_on_unconverged_peel(spark):
    # a 12-node path at k=2 peels two endpoints per round (5 rounds to
    # empty); max_iter=2 must raise, not return mid-peel nodes as core
    import pytest

    path = [(i, i + 1) for i in range(11)]
    df = spark.createDataFrame(path, "src long, dst long")
    with pytest.raises(RuntimeError, match="peel fixpoint"):
        kcore(df, k=2, max_iter=2)
    # with enough rounds the same graph converges to the empty core
    assert kcore(df, k=2, max_iter=10).count() == 0
