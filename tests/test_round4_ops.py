"""Round-4 additions: shingle-containment dedup (operators/dedup.py),
SCD-type-2 crawl-history intervals (operators/curation.py),
deterministic label propagation (operators/graph.py), PMI collocations
and positional phrase search (operators/textstats.py) — each checked
against a small hand-computable or pure-Python reference."""

import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from type_filtered_entity_linker_spark.operators.curation import (
    scd2_intervals,
)
from type_filtered_entity_linker_spark.operators.dedup import (
    containment_duplicates,
    near_duplicates_ngram,
)
from type_filtered_entity_linker_spark.operators.graph import (
    label_propagation,
)
from type_filtered_entity_linker_spark.operators.textstats import (
    phrase_search,
    pmi_bigrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_catches_excerpt_jaccard_misses(spark):
    # B's 3 shingles are all inside A's 6: containment(B in A) = 1.0
    # but Jaccard = 3/6 = 0.5 — below any near-dup threshold.
    corpus = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e"),
            (3, "x y z w"),
        ],
    )
    out = containment_duplicates(
        corpus, threshold=0.8, max_doc_freq=None
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["cont_a_in_b"] == 0.5  # |A∩B| / |A| = 3/6
    assert r["cont_b_in_a"] == 1.0  # |A∩B| / |B| = 3/3
    # the Jaccard operator at the same threshold finds nothing
    assert (
        near_duplicates_ngram(corpus, threshold=0.8, max_doc_freq=None).count()
        == 0
    )


def test_containment_df_cut_prunes_head_shingles(spark):
    # every doc shares the same 3-token head shingle; with the cut at
    # df<=2 that shingle is pruned, leaving the docs disjoint
    corpus = _docs(
        spark,
        [
            (1, "h h h p q r"),
            (2, "h h h s t u"),
            (3, "h h h v w x"),
        ],
    )
    assert (
        containment_duplicates(corpus, threshold=0.5, max_doc_freq=2).count()
        == 0
    )
    # without the cut the shared head shingle yields i=1, n=4 pairs
    # below threshold 0.5 — still nothing, but via a nonzero ratio
    full = containment_duplicates(
        corpus, threshold=0.25, max_doc_freq=None
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in full} == {(1, 2), (1, 3), (2, 3)}
    assert all(r["cont_a_in_b"] == 0.25 for r in full)


def _snaps(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, snap_ver int, text string"
    )


def test_scd2_intervals_change_gap_and_current(spark):
    snaps = _snaps(
        spark,
        [
            # content change at v3 -> two intervals
            (1, 1, "x"), (1, 2, "x"), (1, 3, "y"),
            # absent at v2 -> gap closes the interval even though the
            # content is identical on both sides
            (2, 1, "p"), (2, 3, "p"),
            # disappears after v1
            (3, 1, "q"),
            # never changes -> one interval spanning everything
            (4, 1, "s"), (4, 2, "s"), (4, 3, "s"),
        ],
    )
    rows = scd2_intervals(snaps).collect()
    got = {
        (r["doc_id"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in rows
    }
    assert got == {
        (1, 1, 2, False),
        (1, 3, 3, True),
        (2, 1, 1, False),
        (2, 3, 3, True),
        (3, 1, 1, False),
        (4, 1, 3, True),
    }
    # digests: doc 2's two intervals carry the SAME digest (the page
    # came back unchanged — the gap alone split the interval)
    d2 = sorted(
        (r["valid_from"], r["digest"]) for r in rows if r["doc_id"] == 2
    )
    assert d2[0][1] == d2[1][1]


def _ref_scd2(rows):
    """Pure-Python SCD2: group by key, order by version, break on
    digest change or version gap, emit (from, to, current)."""
    by_key = defaultdict(list)
    vmax = max(v for _, v, _ in rows)
    for k, v, t in rows:
        by_key[k].append((v, t))
    out = set()
    for k, vers in by_key.items():
        vers.sort()
        runs = []
        for v, t in vers:
            if runs and v == runs[-1][1] + 1 and t == runs[-1][2]:
                runs[-1] = (runs[-1][0], v, t)
            else:
                runs.append((v, v, t))
        for lo, hi, _ in runs:
            out.add((k, lo, hi, hi == vmax))
    return out


# snapshot stacks: up to 6 keys × versions 1..4, texts from a tiny
# alphabet so change/no-change and gap patterns all get exercised
SNAP_ROWS = st.lists(
    st.tuples(
        st.integers(0, 5),
        st.integers(1, 4),
        st.sampled_from(["x", "y", "z"]),
    ),
    min_size=1,
    max_size=24,
    unique_by=lambda r: (r[0], r[1]),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(SNAP_ROWS)
def test_scd2_matches_reference(spark, rows):
    snaps = spark.createDataFrame(
        [(k, v, t) for k, v, t in rows],
        "doc_id long, snap_ver int, text string",
    )
    got = {
        (r["doc_id"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_intervals(snaps).collect()
    }
    assert got == _ref_scd2(rows)


def _ref_containment(rows, threshold, n=3):
    """Brute-force distinct-shingle containment reference."""
    def shingles(text):
        toks = text.split(" ")
        if len(toks) >= n:
            return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
        return {" ".join(toks)}

    sh = {d: shingles(t) for d, t in rows}
    out = {}
    ids = sorted(sh)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            i = len(sh[a] & sh[b])
            if i and max(i / len(sh[a]), i / len(sh[b])) >= threshold:
                out[(a, b)] = (i / len(sh[a]), i / len(sh[b]))
    return out


WORDS = st.sampled_from(["a", "b", "c", "d"])
DOC_ROWS = st.lists(
    st.tuples(
        st.integers(0, 7),
        st.lists(WORDS, min_size=1, max_size=8).map(" ".join),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda r: r[0],
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(DOC_ROWS)
def test_containment_matches_reference(spark, rows):
    got = {
        (r["doc_a"], r["doc_b"]): (r["cont_a_in_b"], r["cont_b_in_a"])
        for r in containment_duplicates(
            _docs(spark, rows), threshold=0.5, max_doc_freq=None
        ).collect()
    }
    ref = _ref_containment(rows, 0.5)
    assert set(got) == set(ref)
    for k, (ca, cb) in ref.items():
        assert abs(got[k][0] - ca) < 1e-6
        assert abs(got[k][1] - cb) < 1e-6


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(SNAP_ROWS)
def test_scd2_incremental_fold_equals_batch(spark, rows):
    """Folding snapshots one crawl at a time through
    scd2_apply_snapshot reproduces the batch scd2_intervals result
    exactly — including version gaps, changes, and returning keys."""
    from type_filtered_entity_linker_spark.operators.curation import (
        scd2_apply_snapshot,
    )

    versions = sorted({v for _, v, _ in rows})
    by_ver = {
        v: [(k, t) for k, vv, t in rows if vv == v] for v in versions
    }
    first = spark.createDataFrame(
        [(k, versions[0], t) for k, t in by_ver[versions[0]]],
        "doc_id long, snap_ver int, text string",
    )
    hist = scd2_intervals(first)
    for v in versions[1:]:
        snap = spark.createDataFrame(
            by_ver[v], "doc_id long, text string"
        )
        hist = scd2_apply_snapshot(hist, snap, v)
    batch = scd2_intervals(
        spark.createDataFrame(
            rows, "doc_id long, snap_ver int, text string"
        )
    )
    key = lambda r: (  # noqa: E731
        r["doc_id"], r["digest"], r["valid_from"], r["valid_to"],
        r["is_current"],
    )
    assert sorted(map(key, hist.collect())) == sorted(
        map(key, batch.collect())
    )


def test_scd2_apply_rejects_late_version_and_ignores_empty_snap(spark):
    """Two batch-equivalence edge cases (code-review r04): a late
    (time-travel) fold raises instead of silently marking the newest
    content stale, and an empty snapshot is a no-op (batch semantics
    cannot observe a rowless version) rather than a close-all."""
    import pytest

    from type_filtered_entity_linker_spark.operators.curation import (
        scd2_apply_snapshot,
    )

    hist = scd2_intervals(
        _snaps(spark, [(1, 1, "x"), (2, 1, "p")])
    )
    snap = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="late/time-travel"):
        scd2_apply_snapshot(hist, snap, 1)
    empty = snap.where("doc_id < 0")
    out = scd2_apply_snapshot(hist, empty, 2).collect()
    got = {
        (r["doc_id"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out
    }
    assert got == {(1, 1, 1, True), (2, 1, 1, True)}


def test_stream_scd2_equals_batch_and_retry_is_exact(spark, tmp_path):
    """Three snapshot files streamed as three micro-batches produce
    the batch scd2_intervals result, and replaying the LAST batch onto
    the state below its id (the retry-fencing contract) reproduces its
    stored snapshot exactly."""
    import os

    from pyspark.sql import functions as F

    from type_filtered_entity_linker_spark.operators.curation import (
        scd2_apply_snapshot,
    )
    from type_filtered_entity_linker_spark.streaming.incremental import (
        _latest_state_id,
        stream_scd2_history,
    )

    from type_filtered_entity_linker_spark.plans.driver_queries import (
        stage_snapshot_files,
    )

    snaps = [
        (1, [(1, "x"), (2, "p"), (4, "s")]),
        (2, [(1, "x"), (4, "s")]),
        (3, [(1, "y"), (2, "p"), (4, "s")]),
    ]
    src = str(tmp_path / "snaps")
    stage_snapshot_files(
        src,
        [
            (
                ver,
                spark.createDataFrame(
                    [(k, t, ver) for k, t in rows],
                    "doc_id long, text string, snap_ver int",
                ),
            )
            for ver, rows in snaps
        ],
    )

    schema = spark.read.parquet(os.path.join(src, "snap_1.parquet")).schema
    wd = str(tmp_path / "wd")
    root = stream_scd2_history(
        spark, src, wd, schema, max_files_per_trigger=1
    )
    last = _latest_state_id(root, below=1 << 62)
    got = {
        (r["doc_id"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in spark.read.parquet(
            os.path.join(root, f"batch_{last:09d}")
        ).collect()
    }
    all_rows = [
        (k, ver, t) for ver, rows in snaps for k, t in rows
    ]
    batch = scd2_intervals(
        spark.createDataFrame(
            all_rows, "doc_id long, snap_ver int, text string"
        )
    )
    want = {
        (r["doc_id"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in batch.collect()
    }
    assert got == want

    # retry fencing: fold the last version onto the state BELOW the
    # last batch id — must reproduce the stored snapshot byte-for-row
    prev = _latest_state_id(root, below=last)
    replay = scd2_apply_snapshot(
        spark.read.parquet(os.path.join(root, f"batch_{prev:09d}")),
        spark.createDataFrame(snaps[2][1], "doc_id long, text string"),
        3,
    )
    key = lambda r: tuple(r[c] for c in sorted(r.asDict()))  # noqa: E731
    stored = spark.read.parquet(os.path.join(root, f"batch_{last:09d}"))
    assert sorted(map(key, replay.collect())) == sorted(
        map(key, stored.collect())
    )


def _ref_lpa(edges, n_iter):
    """Pure-Python reference: synchronous LPA, undirected simple
    graph, most-frequent neighbor label, ties to the smallest."""
    nbrs = defaultdict(set)
    for u, v in edges:
        if u != v:
            nbrs[u].add(v)
            nbrs[v].add(u)
    labels = {n: n for n in nbrs}
    for _ in range(n_iter):
        new = {}
        for n, ns in nbrs.items():
            cnt = Counter(labels[m] for m in ns)
            new[n] = min(cnt, key=lambda lb: (-cnt[lb], lb))
        labels = new
    return labels


def _lpa_spark(spark, edges, n_iter):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["label"]
        for r in label_propagation(df, n_iter=n_iter).collect()
    }


def test_label_propagation_bridged_triangles(spark):
    edges = [
        (0, 1), (1, 2), (2, 0),
        (10, 11), (11, 12), (12, 10),
        (2, 10),
    ]
    for n_iter in (1, 2, 3):
        assert _lpa_spark(spark, edges, n_iter) == _ref_lpa(edges, n_iter)
    final = _lpa_spark(spark, edges, 3)
    # each triangle coheres around its own minimum label
    assert final[0] == final[1] == final[2] == 0
    assert final[11] == final[12]


def test_label_propagation_matches_reference_on_sparse_digraph(spark):
    # directed input is symmetrized; duplicate edges collapse
    edges = [(0, 3), (1, 0), (2, 4), (3, 0), (4, 0), (5, 1), (6, 0),
             (7, 4), (0, 3), (3, 3)]
    assert _lpa_spark(spark, edges, 3) == _ref_lpa(edges, 3)


def test_pmi_bigrams_hand_computed(spark):
    corpus = _docs(spark, [(1, "a b a b"), (2, "a b c"), (3, "solo")])
    # bigrams: doc1 -> (a,b) (b,a) (a,b); doc2 -> (a,b) (b,c); N_bi=5
    # unigrams: a:3 b:3 c:1 solo:1; N_uni=8
    out = {
        (r["w1"], r["w2"]): r
        for r in pmi_bigrams(corpus, min_count=2).collect()
    }
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    assert r["n_pair"] == 3
    expected = math.log((3 / 5) / ((3 / 8) * (3 / 8)))
    assert abs(r["pmi"] - expected) < 1e-6


def _ref_triangles(edges):
    """Brute-force per-node triangle counts on the undirected simple
    graph (itertools over canonical vertex triples of the adjacency)."""
    from itertools import combinations

    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    tri = Counter()
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return {n: (len(adj[n]), tri[n]) for n in adj}


def test_triangle_counts_k4_minus_edge(spark):
    from type_filtered_entity_linker_spark.operators.graph import (
        triangle_counts,
    )

    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (10, 11), (1, 0)]
    out = {
        r["node"]: r
        for r in triangle_counts(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    # K4 minus (2,3): 2 triangles; nodes 0,1 in both, 2,3 in one each
    assert (out[0]["degree"], out[0]["n_triangles"]) == (3, 2)
    assert out[0]["clustering_coeff"] == round(2 * 2 / 6, 6)
    assert (out[2]["degree"], out[2]["n_triangles"]) == (2, 1)
    assert out[2]["clustering_coeff"] == 1.0
    # degree-1 pair: zero triangles, guarded coefficient 0.0 (not NULL)
    assert (out[10]["n_triangles"], out[10]["clustering_coeff"]) == (0, 0.0)


def test_triangle_counts_match_bruteforce_on_pseudorandom_graph(spark):
    edges = [((i * 17) % 23, (i * 5 + 3) % 23) for i in range(60)]
    out = {
        r["node"]: (r["degree"], r["n_triangles"])
        for r in triangle_counts_df(spark, edges).collect()
    }
    assert out == _ref_triangles(edges)


def triangle_counts_df(spark, edges):
    from type_filtered_entity_linker_spark.operators.graph import (
        triangle_counts,
    )

    return triangle_counts(
        spark.createDataFrame(edges, "src long, dst long")
    ).select("node", "degree", "n_triangles")


def test_phrase_search_counts_overlapping_matches(spark):
    corpus = _docs(
        spark,
        [
            (1, "a a a a"),   # "a a" at positions 0,1,2 -> 3 matches
            (2, "x a a y"),   # 1 match
            (3, "a b a"),     # adjacency broken -> no match
        ],
    )
    out = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(corpus, "a a").collect()
    }
    assert out == {1: 3, 2: 1}


def test_modularity_barbell(spark):
    """Two triangles joined by a bridge (the textbook barbell): with
    the triangles as communities, m=7, each community has 3 intra
    edges and degree sum 7, so Q = 2*(3/7 - (7/14)^2) = 0.357143.
    Duplicate/reversed/self-loop input edges must not change the
    answer (the operator canonicalizes exactly like LPA)."""
    from type_filtered_entity_linker_spark.operators.graph import (
        modularity,
    )

    edges = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 1),
            (4, 5), (5, 6), (6, 4),
            (3, 4),
            # noise the canonicalization must absorb:
            (2, 1), (1, 1), (3, 1),
        ],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)],
        "node long, label long",
    )
    r = modularity(edges, labels).collect()[0]
    assert r["n_edges"] == 7
    assert r["n_communities"] == 2
    assert abs(r["modularity"] - 0.357143) < 1e-6
