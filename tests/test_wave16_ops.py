"""Wave-16 operators: star clustering (sequential-greedy parity,
cascade round count, convergence contract), link-graph extraction,
BPE merge learning, and the streaming late-data audit."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from type_filtered_entity_linker_spark.operators.clustering import (
    star_clusters,
)

# small graphs: nodes 0..7, up to 14 undirected edges (dups/self-loops
# allowed — the operator must drop them)
EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ),
    min_size=1,
    max_size=14,
)


def ref_star(edge_list):
    """Sequential offline star clustering (Aslam–Pelekhov–Rus):
    static degrees, repeatedly take the highest-priority unmarked
    node under (degree DESC, id ASC) as a center, mark its unmarked
    neighbors as its satellites. Returns {node: (center, is_center)}.
    """
    adj = {}
    for s, t in edge_list:
        if s != t:
            adj.setdefault(s, set()).add(t)
            adj.setdefault(t, set()).add(s)
    deg = {v: len(ns) for v, ns in adj.items()}
    unmarked = set(adj)
    out = {}
    while unmarked:
        c = max(unmarked, key=lambda v: (deg[v], -v))
        out[c] = (c, True)
        unmarked.discard(c)
        for s in sorted(adj[c]):
            if s in unmarked:
                out[s] = (c, False)
                unmarked.discard(s)
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(EDGES)
def test_star_clusters_match_sequential_greedy(spark, edge_list):
    ref = ref_star(edge_list)
    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r["node"]: (r["center_id"], r["is_center"])
        for r in star_clusters(df, max_rounds=10).collect()
    }
    assert got == ref


def test_star_chain_cascade(spark):
    # equal-degree 12-chain: the locally-dominant election peels two
    # nodes per round (v1 center + v2 satellite, then v3/v4, ...) and
    # the tail node self-centers alone in round 6 — pins that the
    # loop iterates to the fixpoint rather than electing once
    chain = [(i, i + 1) for i in range(11)]
    df = spark.createDataFrame(chain, "src long, dst long")
    stats = []
    rows = star_clusters(df, max_rounds=10, stats=stats).collect()
    got = {r["node"]: r for r in rows}
    assert len(stats) == 6 and stats[-1]["active"] == 0
    centers = sorted(r["node"] for r in rows if r["is_center"])
    assert centers == [1, 3, 5, 7, 9, 11]
    # satellites attach to their adjacent center; v0 to v1, v2 to v1
    # (v2's only center neighbor in round 1), v4 to v3, ...
    assert got[0]["center_id"] == 1 and got[2]["center_id"] == 1
    assert got[4]["center_id"] == 3 and got[11]["round_assigned"] == 6
    # static degree is reported, not the residual-round degree
    assert got[5]["degree"] == 2 and got[0]["degree"] == 1


def test_star_center_is_best_attested(spark):
    # o—A—B path: middle record A (degree 2) beats both leaves — the
    # cluster centers on the record with the most direct evidence
    df = spark.createDataFrame(
        [(10, 20), (20, 30)], "src long, dst long"
    )
    got = {r["node"]: r for r in star_clusters(df).collect()}
    assert got[20]["is_center"] and got[10]["center_id"] == 20
    assert got[30]["center_id"] == 20


def test_star_raises_on_unconverged(spark):
    chain = [(i, i + 1) for i in range(11)]
    df = spark.createDataFrame(chain, "src long, dst long")
    with pytest.raises(RuntimeError, match="star_clusters"):
        star_clusters(df, max_rounds=2)


def test_star_empty_and_self_loops(spark):
    df = spark.createDataFrame([(5, 5)], "src long, dst long")
    assert star_clusters(df).count() == 0


# ------------------------------------------------------------ linkgraph

from type_filtered_entity_linker_spark.operators.linkgraph import (  # noqa: E402
    extract_outlinks,
    host_authority,
    host_graph,
)


def test_extract_outlinks_binary_html_and_relative(spark):
    rows = [
        (
            "https://a.example/p/1",
            b'<p>x</p><a href="https://b.example/q">l</a>'
            b'<a href="/rel/path">r</a>',
        ),
        ("https://a.example/p/2", b"<p>no links</p>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    links = extract_outlinks(df).collect()
    assert {(r.url, r.out_url) for r in links} == {
        ("https://a.example/p/1", "https://b.example/q"),
        ("https://a.example/p/1", "/rel/path"),
    }
    hg = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_graph(extract_outlinks(df)).collect()
    }
    # relative link maps to the '' host — kept at this layer, policy
    # filtering is the caller's
    assert hg == {("a.example", "b.example"): 1, ("a.example", ""): 1}


# ----------------------------------------------- watermark drop lag


def test_watermark_late_filter_lags_eviction_by_one_batch(
    spark, tmp_path
):
    """Pins the engine behavior the late-audit oracle replays: the
    late-row filter in batch N uses the watermark computed through
    batch N-2 (one batch behind eviction). A late row in the SECOND
    batch survives (lagged watermark still at epoch); the same-shaped
    row in the THIRD batch is dropped. If a Spark upgrade changes
    this, the audit oracle must be recalibrated — this test is the
    tripwire."""
    import os
    import shutil
    from datetime import datetime as d

    from type_filtered_entity_linker_spark.streaming.incremental import (
        run_stream_once,
        stream_events_hourly,
    )

    stage = str(tmp_path / "stage")
    os.makedirs(stage)

    def write(name, rows, mt):
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, value double",
        )
        tmp = str(tmp_path / "w")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        shutil.copy(os.path.join(tmp, part), os.path.join(stage, name))
        os.utime(os.path.join(stage, name), (mt, mt))

    write(
        "b1.parquet",
        [(1, d(2024, 1, 1, 10, 0, 30), 1, 0.0),
         (2, d(2024, 1, 1, 13, 0, 0), 2, 0.0)],
        1700000001,
    )
    # late row (window [6,7)) in batch 2: lagged filter watermark is
    # still epoch -> KEPT
    write(
        "b2.parquet",
        [(3, d(2024, 1, 1, 6, 10, 0), 9, 0.0),
         (4, d(2024, 1, 1, 14, 0, 0), 2, 0.0)],
        1700000002,
    )
    # same-shaped late row in batch 3: filter watermark = post-batch-1
    # = 11:00 -> DROPPED
    write(
        "b3.parquet",
        [(5, d(2024, 1, 1, 6, 20, 0), 8, 0.0),
         (6, d(2024, 1, 1, 15, 0, 0), 2, 0.0)],
        1700000003,
    )
    schema = spark.read.parquet(os.path.join(stage, "b1.parquet")).schema
    out = run_stream_once(
        stream_events_hourly(spark, stage, schema, max_files_per_trigger=1),
        "wave16_late_lag",
        output_mode="append",
    )
    rows = {
        (r.user_id, r.hour_start.hour): r.n_events for r in out.collect()
    }
    # emitted = windows ending <= final watermark 13:00
    assert rows == {(9, 6): 1, (1, 10): 1}


# ------------------------------------------------------------ BPE

from type_filtered_entity_linker_spark.operators.bpe import (  # noqa: E402
    bpe_merges,
)


def test_bpe_merges_classic_sequence(spark):
    # low x2 + lower x1: merge table is (l,o) [a-asc tie over (o,w)],
    # then (lo,w), then (low,</w>) — rounds 2-3 only exist because
    # each round re-counts AFTER the prior merge
    docs = spark.createDataFrame(
        [("low low lower",)], "text string"
    )
    rows = bpe_merges(docs, n_merges=3).orderBy("merge_rank").collect()
    got = [(r.pair_a, r.pair_b, r.merged, r.pair_count) for r in rows]
    assert got == [
        ("l", "o", "lo", 3),
        ("lo", "w", "low", 3),
        ("low", "</w>", "low</w>", 2),
    ]


def test_bpe_fold_is_greedy_non_overlapping(spark):
    # 'aaa' under pair (a,a): greedy left-to-right gives [aa, a, </w>]
    # — the fold must not double-merge the middle 'a'; round 2's
    # counts then see (aa,a) and (a,</w>) once each, and the a-ASC
    # tie-break picks (a, </w>)
    docs = spark.createDataFrame([("aaa",)], "text string")
    rows = bpe_merges(docs, n_merges=2).orderBy("merge_rank").collect()
    assert (rows[0].pair_a, rows[0].pair_b, rows[0].pair_count) == (
        "a", "a", 2,
    )
    assert (rows[1].pair_a, rows[1].pair_b, rows[1].pair_count) == (
        "a", "</w>", 1,
    )


def test_bpe_ascii_guard_excludes_non_ascii_words(spark):
    # café x3 would dominate every pair count if admitted; excluded,
    # the single 'zz' elects (z, </w>) — count-1 tie with (z, z),
    # b-ASC tie-break ('</w>' < 'z')
    docs = spark.createDataFrame(
        [("zz café café café",)], "text string"
    )
    rows = bpe_merges(docs, n_merges=1).collect()
    assert (rows[0].pair_a, rows[0].pair_b, rows[0].pair_count) == (
        "z", "</w>", 1,
    )
    # a corpus with no ASCII word at all has an empty alphabet: no
    # merge rows, not a crash
    only = spark.createDataFrame([("café café",)], "text string")
    assert bpe_merges(only, n_merges=2).count() == 0


def test_host_authority_drops_self_host_keeps_raw_count(spark):
    hg = spark.createDataFrame(
        [
            ("a", "a", 5),  # intra-host only in n_outlinks
            ("a", "b", 2),
            ("b", "a", 1),
        ],
        "src_host string, dst_host string, n_links long",
    )
    out = {r.host: r for r in host_authority(hg).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"].n_outlinks == 7 and out["b"].n_outlinks == 1
    assert out["a"].out_hosts == 1 and out["a"].in_hosts == 1
    # symmetric 2-cycle → uniform rank
    assert abs(out["a"].rank - 0.5) < 1e-9
    assert abs(out["b"].rank - 0.5) < 1e-9


# -------------------------------------------------- wave 17: FD / schema / HITS

from type_filtered_entity_linker_spark.operators.profiling import (  # noqa: E402
    fd_violations,
)


def test_fd_violations_g3_counts_and_nulls(spark):
    rows = [
        ("p1", "alice"),
        ("p1", "alice"),
        ("p1", "bob"),     # minority value -> 1 violation in p1
        ("p2", "carol"),   # clean group
        (None, "dave"),    # NULL determinant -> excluded, counted
        ("p3", None),      # NULL dependent  -> excluded, counted
    ]
    df = spark.createDataFrame(rows, "phone string, name string")
    out = {
        (r.lhs, r.rhs): r
        for r in fd_violations(
            df, [("phone", "name"), ("name", "phone")]
        ).collect()
    }
    pn = out[("phone", "name")]
    assert (pn.n_rows, pn.n_nulls, pn.n_groups) == (4, 2, 2)
    assert pn.n_violations == 1 and not pn.holds
    assert abs(pn.violation_rate - 0.25) < 1e-9
    np_ = out[("name", "phone")]
    # alice->p1 x2, bob->p1, carol->p2: every name maps to one phone
    assert np_.holds and np_.n_violations == 0


from type_filtered_entity_linker_spark.operators.schema_matching import (  # noqa: E402
    schema_match,
)


def test_schema_match_scores_and_rank(spark):
    a = spark.createDataFrame(
        [("x", "1"), ("y", "2"), ("z", "3")], "name string, code string"
    )
    b = spark.createDataFrame(
        [("x", "9"), ("y", "8"), ("q", "7")],
        "label string, serial string",
    )
    out = {
        (r.col_a, r.col_b): r
        for r in schema_match(
            a, b, ["name", "code"], ["label", "serial"]
        ).collect()
    }
    m = out[("name", "label")]
    # {x,y,z} vs {x,y,q}: inter 2, union 4
    assert (m.n_a, m.n_b, m.n_common) == (3, 3, 2)
    assert abs(m.jaccard - 0.5) < 1e-9 and m.rank == 1
    # zero-overlap pairs are omitted entirely
    assert ("code", "label") not in out
    assert ("name", "serial") not in out


def test_schema_match_containment_direction(spark):
    a = spark.createDataFrame([("1",), ("2",), ("3",), ("4",)], "v string")
    b = spark.createDataFrame([("1",), ("2",)], "w string")
    m = schema_match(a, b, ["v"], ["w"]).collect()[0]
    assert abs(m.containment_a - 0.5) < 1e-9     # half of A covered
    assert abs(m.containment_b - 1.0) < 1e-9     # B fully inside A


from type_filtered_entity_linker_spark.operators.graph import hits  # noqa: E402


def test_hits_separates_hubs_from_authorities(spark):
    # 1 and 2 point at 3: pure hubs; 3 is the pure authority
    e = spark.createDataFrame([(1, 3), (2, 3)], "src long, dst long")
    out = {r.node: (r.hub, r.authority) for r in hits(e).collect()}
    assert out[3] == (0.0, 1.0)
    assert out[1] == (0.5, 0.0) and out[2] == (0.5, 0.0)


def test_hits_empty_and_self_loops(spark):
    e = spark.createDataFrame([(7, 7)], "src long, dst long")
    assert hits(e).count() == 0


# ----------------------------------- wave 18: link prediction / anchor text

from type_filtered_entity_linker_spark.operators.graph import (  # noqa: E402
    adamic_adar,
)


def test_adamic_adar_recovers_path_closure(spark):
    # o—A—B path: the only non-adjacent pair with a common neighbor
    # is (o, B), scored 1/ln(deg(A)) = 1/ln(2)
    import math

    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    rows = adamic_adar(e).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b, r.n_common) == (1, 3, 1)
    assert abs(r.aa_score - round(1.0 / math.log(2), 6)) < 1e-9


def test_adamic_adar_excludes_existing_edges_and_caps_hubs(spark):
    import math

    # triangle 1-2-3 plus hub 9 connected to all: pairs within the
    # triangle are adjacent -> excluded; (1,2),(1,3),(2,3) adjacency
    # covers everything except pairs through the hub... add leaf 4-9:
    # (4,1) share neighbor 9 only
    edges = [(1, 2), (2, 3), (1, 3), (9, 1), (9, 2), (9, 3), (9, 4)]
    e = spark.createDataFrame(edges, "src long, dst long")
    out = {(r.id_a, r.id_b): r for r in adamic_adar(e).collect()}
    # (1,4) common neighbor = hub 9 (deg 4)
    assert abs(out[(1, 4)].aa_score - round(1.0 / math.log(4), 6)) < 1e-9
    # capping at degree 3 removes the hub from the common-neighbor
    # role: (1,4) disappears
    capped = {
        (r.id_a, r.id_b)
        for r in adamic_adar(e, max_degree=3).collect()
    }
    assert (1, 4) not in capped


from type_filtered_entity_linker_spark.operators.linkgraph import (  # noqa: E402
    anchor_text_index,
)


def test_anchor_text_index_counts_and_rank(spark):
    rows = [
        ("https://s.example/1",
         b'<a href="https://t.example/a">acme</a>'
         b'<a href="https://t.example/b">acme</a>'
         b'<a href="https://t.example/c">zeta</a>'
         b'<a href="/rel">skipme</a>'),
        ("https://s.example/2",
         b'<a href="https://t.example/d">beta</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = [
        (r.term, r.n_mentions, r.rank)
        for r in anchor_text_index(df, top_k=2)
        .orderBy("rank")
        .collect()
    ]
    # relative href -> host '' -> filtered; acme twice, beta/zeta tie
    # broken term-ASC at rank 2
    assert out == [("acme", 2, 1), ("beta", 1, 2)]


def test_bpe_subword_counts_applies_learned_merges(spark):
    # low x2, lower x1 after 3 merges: low -> [low</w>],
    # lower -> [low, e, r, </w>]
    from type_filtered_entity_linker_spark.operators.bpe import (
        bpe_subword_counts,
    )

    docs = spark.createDataFrame([("low low lower",)], "text string")
    out = {
        r.subword: (r.n_occurrences, r.rank)
        for r in bpe_subword_counts(docs, n_merges=3, top_k=10).collect()
    }
    assert out["low</w>"] == (2, 1)
    # count-1 four-way tie broken subword-ASC: </w> < e < low < r
    assert out["</w>"][0] == 1 and out["low"][0] == 1
    assert [s for s, v in sorted(out.items(), key=lambda kv: kv[1][1])] == [
        "low</w>", "</w>", "e", "low", "r"
    ]


def test_robust_anomalies_flags_spike_and_degenerate_scale(spark):
    from type_filtered_entity_linker_spark.operators.diagnostics import (
        robust_anomalies,
    )

    rows = (
        # user 1: values 1..7 plus a 100 spike; median 2.5... build
        # explicit: [1,2,2,3,3,4,100] -> med 3, MAD of |x-3| =
        # [2,1,1,0,0,1,97] -> med 1 -> z(100)=(97)/(1.4826)=65.4 flag
        [(1, i, v) for i, v in enumerate([1, 2, 2, 3, 3, 4, 100])]
        # user 2: constant 5s then a 6 -> MAD 0 branch: the 6 flags
        + [(2, i, 5) for i in range(4)] + [(2, 9, 6)]
    )
    df = spark.createDataFrame(rows, "user_id long, slot long, n long")
    out = {
        (r.user_id, r.slot): r
        for r in robust_anomalies(df, ["user_id"], "slot", "n").collect()
    }
    spike = out[(1, 6)]
    assert spike.is_anomaly and abs(spike.robust_z - round(97 / 1.4826, 6)) < 1e-6
    assert not out[(1, 0)].is_anomaly
    deg = out[(2, 9)]
    assert deg.mad == 0.0 and deg.robust_z is None and deg.is_anomaly
    assert not out[(2, 0)].is_anomaly


# ------------------------------------------ wave 20: stable matching

from type_filtered_entity_linker_spark.operators.matching import (  # noqa: E402
    stable_matching,
)

BIPAIRS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),    # left ids
        st.integers(min_value=10, max_value=14),  # right ids
        st.integers(min_value=0, max_value=9),    # score
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: (t[0], t[1]),
)


def ref_gale_shapley(pairs):
    """Sequential left-proposing deferred acceptance; preferences
    (score DESC, partner id ASC) on both sides."""
    score = {(a, b): s for a, b, s in pairs}
    prefs = {}
    for a, b, s in pairs:
        prefs.setdefault(a, []).append(b)
    for a in prefs:
        prefs[a].sort(key=lambda b: (-score[(a, b)], b))
    nxt = {a: 0 for a in prefs}
    eng = {}
    free = sorted(prefs)
    while free:
        a = free.pop()
        while nxt[a] < len(prefs[a]):
            b = prefs[a][nxt[a]]
            nxt[a] += 1
            cur = eng.get(b)
            if cur is None:
                eng[b] = a
                break
            if (score[(a, b)], -a) > (score[(cur, b)], -cur):
                eng[b] = a
                free.append(cur)
                break
    return {(a, b) for b, a in eng.items()}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(BIPAIRS)
def test_stable_matching_equals_sequential_gs(spark, pairs):
    df = spark.createDataFrame(
        [(a, b, float(s)) for a, b, s in pairs],
        "id_a long, id_b long, score double",
    )
    got = {
        (r.id_a, r.id_b)
        for r in stable_matching(df, max_rounds=30).collect()
    }
    assert got == ref_gale_shapley(pairs)
    # no blocking pair: for every scored pair (a,b) NOT matched,
    # a must not prefer b over its partner while b prefers a
    score = {(a, b): s for a, b, s in pairs}
    part_a = {a: b for a, b in got}
    part_b = {b: a for a, b in got}

    def pref_a(a, b):
        cur = part_a.get(a)
        if cur is None:
            return True
        return (score[(a, b)], -b) > (score[(a, cur)], -cur)

    def pref_b(b, a):
        cur = part_b.get(b)
        if cur is None:
            return True
        return (score[(a, b)], -a) > (score[(cur, b)], -cur)

    for a, b, s in pairs:
        if (a, b) not in got:
            assert not (pref_a(a, b) and pref_b(b, a)), (a, b, got)


def test_stable_matching_bump_chain(spark):
    # classic displacement chain: left 0 bumps left 1 off right 10,
    # left 1 falls back to right 11
    df = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 3.0), (0, 10, 9.0)],
        "id_a long, id_b long, score double",
    )
    got = {(r.id_a, r.id_b) for r in stable_matching(df).collect()}
    assert got == {(0, 10), (1, 11)}


def test_stable_matching_raises_when_capped(spark):
    df = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 3.0), (0, 10, 9.0)],
        "id_a long, id_b long, score double",
    )
    with pytest.raises(RuntimeError, match="stable_matching"):
        stable_matching(df, max_rounds=1)


def test_trustrank_decays_from_seeds_and_handles_no_seeds(spark):
    from type_filtered_entity_linker_spark.operators.graph import (
        trustrank,
    )

    # seed 1 -> 2 -> 3; isolated pair 8 <-> 9 unreachable from seeds
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (8, 9), (9, 8)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r.node: r.trust for r in trustrank(e, seeds).collect()}
    # trust enters only at 1 and decays along the chain
    assert out[1] > out[2] > out[3] > 0
    assert out[8] == 0.0 and out[9] == 0.0
    # no effective seeds (seed not in graph) -> all-zero, not a crash
    ghost = spark.createDataFrame([(77,)], "node long")
    out2 = {r.node: r.trust for r in trustrank(e, ghost).collect()}
    assert set(out2.values()) == {0.0}


# ---------------------------------- wave 22: incremental dedup / retention


def test_incremental_dedup_probes_new_side_only(spark):
    from type_filtered_entity_linker_spark.operators.dedup import (
        near_duplicates_incremental,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    old = spark.createDataFrame(
        [(1, base), (2, base), (3, "totally different words here now")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, base)],  # re-delivery of the duplicated old text
        "doc_id long, text string",
    )
    rows = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in near_duplicates_incremental(old, new, 0.6).collect()
    }
    # old x old (1,2) is a perfect dup but must NOT appear; the new
    # doc pairs with both old copies at jaccard 1.0
    assert (1, 2) not in rows
    assert rows[(1, 100)] == 1.0 and rows[(2, 100)] == 1.0
    assert (3, 100) not in rows
    # id collision between sides violates the crawl-batch contract and
    # must raise, not silently duplicate signature rows (ADVICE r04)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="disjoint"):
        near_duplicates_incremental(
            old, old.limit(1).select("doc_id", "text"), 0.6
        )


def test_cohort_retention_matrix(spark):
    from datetime import datetime as d

    from type_filtered_entity_linker_spark.operators.temporal import (
        cohort_retention,
    )

    rows = [
        # cohort week of Mon 2024-01-01: users 1,2
        (1, d(2024, 1, 2, 10)), (2, d(2024, 1, 3, 11)),
        # user 1 returns in week+1 and week+3; user 2 never returns
        (1, d(2024, 1, 9, 9)), (1, d(2024, 1, 24, 9)),
        # cohort week of Mon 2024-01-08: user 3, returns week+1
        (3, d(2024, 1, 10, 8)), (3, d(2024, 1, 16, 8)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort_week.date().isoformat(), r.week_offset): (
            r.n_active, r.n_cohort, r.retention_rate,
        )
        for r in cohort_retention(df).collect()
    }
    assert out[("2024-01-01", 0)] == (2, 2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 2, 0.5)
    assert out[("2024-01-01", 3)] == (1, 2, 0.5)
    assert ("2024-01-01", 2) not in out
    assert out[("2024-01-08", 0)] == (1, 1, 1.0)
    assert out[("2024-01-08", 1)] == (1, 1, 1.0)


# ----------------------------------- wave 23: transitions / chunking


def test_event_transitions_matrix(spark):
    from datetime import datetime as d

    from type_filtered_entity_linker_spark.operators.temporal import (
        event_transitions,
    )

    rows = [
        (1, d(2024, 1, 1, 1), "view"),
        (1, d(2024, 1, 1, 2), "click"),
        (1, d(2024, 1, 1, 3), "view"),
        (1, d(2024, 1, 1, 4), "buy"),
        (2, d(2024, 1, 1, 1), "view"),
        (2, d(2024, 1, 1, 2), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        (r.from_state, r.to_state): (r.n, r.p)
        for r in event_transitions(df).collect()
    }
    # from view: ->click 1, ->buy 1, ->view 1 (p = 1/3 each)
    assert out[("view", "click")][0] == 1
    assert out[("view", "view")][0] == 1
    assert abs(out[("view", "buy")][1] - round(1 / 3, 6)) < 1e-9
    assert out[("click", "view")] == (1, 1.0)
    assert ("buy", "view") not in out  # terminal state has no row


def test_chunk_overlap_boundaries(spark):
    from type_filtered_entity_linker_spark.operators.curation import (
        chunk_overlap,
    )

    text10 = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, text10), (2, "a b"), (3, "   "), (4, "")],
        "doc_id long, text string",
    )
    rows = chunk_overlap(docs, chunk_tokens=8, overlap=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1 (10 tokens, stride 4): starts 0 and 4; second chunk short
    c = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [(r.chunk_id, r.start_token, r.n_tokens) for r in c] == [
        (0, 0, 8), (1, 4, 6),
    ]
    assert c[0].chunk_text.split() == [f"t{i}" for i in range(8)]
    assert c[1].chunk_text.split() == [f"t{i}" for i in range(4, 10)]
    # short doc: one chunk; whitespace-only and empty docs dropped
    assert [(r.start_token, r.n_tokens) for r in by_doc[2]] == [(0, 2)]
    assert 3 not in by_doc and 4 not in by_doc


def test_edge_support_flags_bridges(spark):
    from type_filtered_entity_linker_spark.operators.clustering import (
        edge_support,
    )

    # triangle 1-2-3 plus a pendant bridge 3-4
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    out = {
        (r.id_a, r.id_b): (r.n_common, r.is_bridge_suspect)
        for r in edge_support(e).collect()
    }
    assert out[(1, 2)] == (1, False)
    assert out[(2, 3)] == (1, False)
    assert out[(1, 3)] == (1, False)
    assert out[(3, 4)] == (0, True)


def test_stream_attach_registry_carries_across_batches(spark):
    """Batch 0's B-copies spawn; batch 1's B2-copies (same
    perturbation) attach to those SPAWNED entities — state crossing
    micro-batches, which a stateless per-batch attach cannot do."""
    from type_filtered_entity_linker_spark.plans.driver_queries import (
        q_er_stream_attach,
    )

    rows = q_er_stream_attach(spark, "/root/testdata/sf0.001").collect()
    b0 = [r for r in rows if r.batch_id == 0]
    b2 = [r for r in rows if r.batch_id == 1 and r.rec_id >= 3000000]
    assert b0 and all(not r.attached for r in b0)
    assert b2 and all(
        r.attached and r.cluster_id >= 2000000 for r in b2
    )
    # A-copies in batch 1 attach to the CLEAN originals
    a = [r for r in rows if r.batch_id == 1 and r.rec_id < 2000000]
    assert a and all(r.attached and r.cluster_id < 1000000 for r in a)


def test_star_attachment_uses_final_center_set(spark):
    """Regression (code-review r04): node 4's sequential marker is
    center 2 (higher priority, processed first), but center 3 becomes
    locally dominant a round EARLIER in the parallel election — the
    attachment must still follow the final-set priority order."""
    edges = [(0, 1), (0, 5), (0, 6), (1, 2), (2, 4), (4, 3), (3, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r for r in star_clusters(df).collect()}
    assert sorted(n for n, r in got.items() if r["is_center"]) == [0, 2, 3]
    assert got[4]["center_id"] == 2
    assert got[7]["center_id"] == 3
    assert got[1]["center_id"] == 0


def test_bpe_survives_full_collapse_and_exhaustion(spark):
    """Regression (code-review r04): a fully-merged single-symbol
    word must not index out of bounds in the next round's pair
    enumeration, and rounds past corpus exhaustion must neither
    crash nor empty the word table."""
    from type_filtered_entity_linker_spark.operators.bpe import (
        bpe_merges,
        bpe_subword_counts,
    )

    docs = spark.createDataFrame([("a a a",)], "text string")
    rows = bpe_merges(docs, n_merges=3).collect()
    # only one merge is learnable: (a, </w>); rounds 2-3 are empty
    assert [(r.pair_a, r.pair_b, r.pair_count) for r in rows] == [
        ("a", "</w>", 3)
    ]
    # the exhausted rounds must NOT have emptied the vocabulary
    counts = bpe_subword_counts(docs, n_merges=3, top_k=5).collect()
    assert [(r.subword, r.n_occurrences) for r in counts] == [
        ("a</w>", 3)
    ]


# ------------------------------- wave 25: novelty / templates / rank delta


def test_shingle_novelty_orders_by_arrival(spark):
    from type_filtered_entity_linker_spark.operators.dedup import (
        shingle_novelty,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),          # everything novel
            (2, "a b c d e"),          # exact reprint: novelty 0
            (3, "a b c x y z"),        # mixes seen + new shingles
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in shingle_novelty(docs).collect()}
    assert out[1].novelty == 1.0
    assert out[2].novelty == 0.0
    # doc 3 shingles: abc(seen) bcx cxy xyz -> 3/4 novel
    assert out[3].n_shingles == 4 and out[3].n_novel == 3


def test_template_shingles_per_group(spark):
    from type_filtered_entity_linker_spark.operators.textstats import (
        template_shingles,
    )

    rows = [
        (1, "h1", "u v w promo one end"),
        (2, "h1", "x y z promo one end"),
        (3, "h2", "u v w promo two end"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = {
        (r.key, r.shingle): r.frac
        for r in template_shingles(docs, min_frac=1.0).collect()
    }
    # 'promo one end' fires in both h1 docs; h2's single doc makes
    # every one of its shingles a (trivial) template at frac 1.0
    assert out[("h1", "promo one end")] == 1.0
    assert ("h1", "u v w") not in out  # only 1 of 2 docs
    assert ("h2", "promo two end") in out


def test_crawl_rank_delta_moves_mass(spark):
    from type_filtered_entity_linker_spark.plans.driver_queries import (
        q_crawl_rank_delta,
    )

    df = q_crawl_rank_delta(spark, "/root/testdata/sf0.001").toPandas()
    # ranks are probability masses: both snapshots sum to ~1, and the
    # thinned snapshot genuinely moves rank (not all deltas zero)
    assert abs(df.rank_old.sum() - 1.0) < 1e-3
    assert abs(df.rank_new.sum() - 1.0) < 1e-3
    assert (df.rank_delta != 0).any()


def test_batch_novelty_scores_against_stored_corpus(spark):
    from type_filtered_entity_linker_spark.operators.dedup import (
        batch_novelty,
    )

    existing = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (10, "a b c d e"),    # re-delivery: novelty 0
            (11, "x y z w q"),    # fully fresh: novelty 1
            (12, "a b c q r s"),  # mixed
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in batch_novelty(existing, new).collect()}
    assert out[10].novelty == 0.0
    assert out[11].novelty == 1.0
    # shingles of 12: abc(seen) bcq cqr qrs -> 3/4 unseen
    assert (out[12].n_shingles, out[12].n_unseen) == (4, 3)


def test_doc_keywords_tfidf_and_boilerplate_zero(spark):
    import math

    from type_filtered_entity_linker_spark.operators.textstats import (
        doc_keywords,
    )

    docs = spark.createDataFrame(
        [
            (1, "common apple apple"),
            (2, "common banana"),
            (3, "common cherry cherry cherry"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.term): r
        for r in doc_keywords(docs, top_k=2).collect()
    }
    # 'common' appears in every doc: idf ln(3/3)=0 -> never a keyword
    # unless nothing else exists; it ranks BELOW the distinctive term
    k1 = out[(1, "apple")]
    assert k1.rank == 1 and abs(
        k1.tfidf - round(2 * math.log(3), 6)
    ) < 1e-9
    assert out[(1, "common")].tfidf == 0.0
    assert out[(3, "cherry")].rank == 1
