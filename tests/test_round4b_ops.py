"""Round-4 second-wave ER additions: SoftTFIDF hybrid similarity,
parallel-pivot correlation clustering."""

import hashlib
import math
import random

from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.functions.strings import (
    jaro_winkler_batch,
)
from type_filtered_entity_linker_spark.operators.clustering import (
    connected_components,
    pivot_clusters,
)
from type_filtered_entity_linker_spark.operators.soft_tfidf import (
    soft_tfidf_scores,
)


def _jw(a: str, b: str) -> float:
    return float(jaro_winkler_batch([a], [b], boost_threshold=0.7)[0])


def _ref_soft_tfidf(corpus: dict[int, str], id_a: int, id_b: int,
                    theta: float = 0.9) -> tuple[int, float]:
    """Spec-faithful single-machine reference (module docstring of
    operators/soft_tfidf.py): ln(tf+1)*ln(N/df) L2-normalized weights,
    per-left-token best-JW >= theta, tie -> largest right weight."""
    n = len(corpus)
    tf = {i: {} for i in corpus}
    for i, text in corpus.items():
        for t in text.split():
            tf[i][t] = tf[i].get(t, 0) + 1
    df = {}
    for i in corpus:
        for t in tf[i]:
            df[t] = df.get(t, 0) + 1
    v = {}
    for i in corpus:
        w = {t: math.log(c + 1) * math.log(n / df[t]) for t, c in tf[i].items()}
        norm = math.sqrt(sum(x * x for x in w.values()))
        v[i] = {t: x / norm for t, x in w.items()}
    score, n_close = 0.0, 0
    for ta, va in v[id_a].items():
        best = max(
            ((_jw(ta, tb), vb) for tb, vb in v[id_b].items()),
            key=lambda p: (p[0], p[1]),
        )
        if best[0] >= theta:
            n_close += 1
            score += va * best[1] * best[0]
    return n_close, round(score, 6)


def _run(spark, corpus: dict[int, str], pairs: list[tuple[int, int]]):
    recs = spark.createDataFrame(
        [(i, s) for i, s in corpus.items()], "rec_id long, fullname string"
    )
    p = spark.createDataFrame(pairs, "id_a long, id_b long")
    rows = soft_tfidf_scores(recs, p, "fullname").collect()
    return {(r.id_a, r.id_b): (r.n_close, r.soft_tfidf) for r in rows}


def test_soft_tfidf_self_pair_is_one(spark):
    corpus = {
        1: "smith hammond corp",
        2: "jones consolidated inc",
        3: "acme corp",
    }
    got = _run(spark, corpus, [(1, 1)])
    n_close, s = got[(1, 1)]
    assert n_close == 3
    assert abs(s - 1.0) < 1e-6


def test_soft_tfidf_matches_reference_and_survives_typos(spark):
    corpus = {
        1: "smith hammond corp",
        2: "smith hammnod corporatin",  # token-level typos
        3: "jones consolidated inc",
        4: "totally different words",
        5: "smith hammond corp",  # exact dup of 1 (df > 1 tokens)
    }
    pairs = [(1, 2), (1, 3), (1, 4), (1, 5), (3, 4)]
    got = _run(spark, corpus, pairs)
    for a, b in pairs:
        assert got[(a, b)] == _ref_soft_tfidf(corpus, a, b), (a, b)
    # typo'd near-duplicate: 'smith' and 'hammnod' stay CLOSE despite
    # zero exact-token overlap beyond 'smith' ('corporatin' falls just
    # under theta: JW('corp', 'corporatin') = 0.88)
    assert got[(1, 2)][0] == 2
    assert got[(1, 2)][1] > 0.4
    # unrelated pair scores exactly 0 with no close tokens (left-join row)
    assert got[(3, 4)] == (0, 0.0)


def test_soft_tfidf_token_reorder_invariant(spark):
    corpus = {1: "alpha beta gamma", 2: "gamma alpha beta", 3: "alpha x y"}
    got = _run(spark, corpus, [(1, 2)])
    assert got[(1, 2)][0] == 3
    assert abs(got[(1, 2)][1] - 1.0) < 1e-6


# --------------------------------------------------------------- pivot CC


def _pivot_key(v: int) -> str:
    # fixed-length hash prefix + raw id string: unique and totally
    # ordered for any id domain, no pad width to truncate (review r4b)
    return hashlib.md5(f"pivot:{v}".encode()).hexdigest()[:15] + str(v)


def _ref_pivot(edges: list[tuple[int, int]], max_rounds: int = 20):
    """Single-machine simulation of the deterministic parallel-pivot
    rounds (same spec as operators/clustering.py pivot_clusters)."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    active = set(adj)
    out = {}
    for r in range(1, max_rounds + 1):
        if not active:
            break
        pivots = {
            v
            for v in active
            if all(_pivot_key(v) < _pivot_key(u) for u in adj[v] if u in active)
        }
        newly = {}
        for p in pivots:
            newly[p] = (p, True, r)
        for v in active - pivots:
            cand = [u for u in adj[v] if u in pivots]
            if cand:
                newly[v] = (min(cand, key=_pivot_key), False, r)
        out.update(newly)
        active -= set(newly)
    assert not active, "reference did not converge"
    return out


def _run_pivot(spark, edges: list[tuple[int, int]]):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = pivot_clusters(df).collect()
    return {r.node: (r.cluster_id, r.is_pivot, r.round_assigned) for r in rows}


def test_pivot_splits_paths_where_cc_merges(spark):
    # path 1-2-3 (no 1-3 edge): CC merges all three; pivot clustering
    # must split (a cluster spans only one hop around its pivot), and
    # no two pivots may be adjacent
    edges = [(1, 2), (2, 3)]
    got = _run_pivot(spark, edges)
    assert len(got) == 3
    assert len({c for c, _, _ in got.values()}) >= 2
    adj = {(1, 2), (2, 1), (2, 3), (3, 2)}
    pivots = {v for v, (_, is_p, _) in got.items() if is_p}
    assert not any((a, b) in adj for a in pivots for b in pivots if a != b)
    df = spark.createDataFrame(edges, "src long, dst long")
    cc = connected_components(df).collect()
    assert len({r.cluster_id for r in cc}) == 1
    assert got == _ref_pivot(edges)


def test_pivot_triangle_single_cluster(spark):
    got = _run_pivot(spark, [(10, 20), (20, 30), (10, 30)])
    assert len({c for c, _, _ in got.values()}) == 1
    assert got == _ref_pivot([(10, 20), (20, 30), (10, 30)])


def test_pivot_matches_reference_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = list(
            {
                (rng.randrange(n), rng.randrange(n))
                for _ in range(60)
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        got = _run_pivot(spark, edges)
        ref = _ref_pivot(edges)
        assert got == ref, f"trial {trial}"
        # every node one hop from its pivot
        adj = set()
        for a, b in edges:
            adj.add((a, b))
            adj.add((b, a))
        for v, (c, is_p, _) in got.items():
            assert is_p == (v == c)
            if not is_p:
                assert (v, c) in adj


# --------------------------------------------------------------- PPRL CLK


def _ref_clk(name: str, m: int = 64, k: int = 2, q: int = 2) -> set[int]:
    p = f"_{name.lower()}_"
    grams = {p[i : i + q] for i in range(len(p) - q + 1)}
    return {
        int(hashlib.md5(f"clk{h}:{g}".encode()).hexdigest()[:15], 16) % m
        for g in grams
        for h in range(1, k + 1)
    }


def test_clk_positions_match_reference(spark):
    from type_filtered_entity_linker_spark.operators.pprl import (
        clk_positions,
    )

    names = {1: "Alice Smith", 2: "Bob", 3: "ALICE SMITH"}
    df = spark.createDataFrame(
        list(names.items()), "rec_id long, name string"
    )
    rows = clk_positions(df, "name").collect()
    got = {}
    for r in rows:
        got.setdefault(r.rec_id, set()).add(r.pos)
    for i, n in names.items():
        assert got[i] == _ref_clk(n), i
    # case-insensitive by construction
    assert got[1] == got[3]


def test_dice_link_semantics(spark):
    from type_filtered_entity_linker_spark.operators.pprl import dice_link

    recs = spark.createDataFrame(
        [
            (1, "Catherine Miller"),
            (2, "Catherine Miler"),  # one-char typo
            (3, "Catherine Miller"),
            (4, "Xqz"),
        ],
        "rec_id long, name string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    rows = {(r.id_a, r.id_b): r for r in dice_link(recs, pairs, "name").collect()}
    assert rows[(1, 3)].dice == 1.0  # identical names -> identical CLKs
    assert 0.8 < rows[(1, 2)].dice < 1.0  # typo keeps most bigrams
    assert rows[(1, 4)].dice < 0.3  # unrelated: collision floor only
    a, b = _ref_clk("Catherine Miller"), _ref_clk("Catherine Miler")
    assert rows[(1, 2)].n_common == len(a & b)
    assert rows[(1, 2)].card_a == len(a) and rows[(1, 2)].card_b == len(b)


# ------------------------------------------------------------ progressive


def test_progressive_curve_hand_example(spark):
    from type_filtered_entity_linker_spark.operators.progressive import (
        progressive_recall_curve,
    )

    # 10 pairs, proxy = 1.0..0.1; the 3 truth pairs sit at proxies
    # 1.0, 0.9 and 0.1 — buckets of one pair each
    rows = [
        (i, i + 100, 1.0 - i / 10.0, i in (0, 1, 9)) for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "id_a long, id_b long, proxy double, is_true boolean"
    )
    got = {
        r.bucket: (r.n_pairs_cum, r.n_true_cum, r.recall_cum)
        for r in progressive_recall_curve(df).collect()
    }
    assert len(got) == 10
    assert got[1] == (1, 1, round(1 / 3, 6))
    assert got[2] == (2, 2, round(2 / 3, 6))
    assert got[9] == (9, 2, round(2 / 3, 6))
    assert got[10] == (10, 3, 1.0)
    # monotone by construction
    pairs_seq = [got[b][0] for b in sorted(got)]
    true_seq = [got[b][1] for b in sorted(got)]
    assert pairs_seq == sorted(pairs_seq)
    assert true_seq == sorted(true_seq)


def test_progressive_curve_tie_break_deterministic(spark):
    from type_filtered_entity_linker_spark.operators.progressive import (
        progressive_recall_curve,
    )

    # all proxies equal: bucket boundaries fall on (id_a, id_b) order
    rows = [(i, i + 100, 0.5, i < 2) for i in range(10)]
    df = spark.createDataFrame(
        rows, "id_a long, id_b long, proxy double, is_true boolean"
    )
    got = {
        r.bucket: r.n_true_cum for r in progressive_recall_curve(df).collect()
    }
    assert got[1] == 1 and got[2] == 2 and got[10] == 2


# --------------------------------------------------------- truth discovery


def _ref_trust(claims, rounds=3, init=800_000):
    """Integer-exact single-machine replica of the micro-unit trust
    iteration (spec in operators/truth_discovery.py)."""
    sources = {s for s, _, _ in claims}
    trust = {s: init for s in sources}
    traj = []
    for r in range(1, rounds + 1):
        raw = {}
        for s, o, v in claims:
            raw[(o, v)] = raw.get((o, v), 0) + trust[s]
        tot = {}
        for (o, v), x in raw.items():
            tot[o] = tot.get(o, 0) + x
        cm = {(o, v): (x * 1_000_000) // tot[o] for (o, v), x in raw.items()}
        acc, cnt = {s: 0 for s in sources}, {s: 0 for s in sources}
        for s, o, v in claims:
            acc[s] += cm[(o, v)]
            cnt[s] += 1
        trust = {s: acc[s] // cnt[s] for s in sources}
        traj.append(dict(trust))
    return traj


def test_truth_discovery_matches_integer_reference(spark):
    from type_filtered_entity_linker_spark.operators.truth_discovery import (
        source_trust_iterations,
    )

    claims = []
    for o in range(30):
        true_v = f"v{o % 4}"
        claims.append(("good", o, true_v))
        claims.append(("meh", o, true_v if o % 3 else "wrong"))
        claims.append(("bad", o, true_v if o % 2 else f"junk{o % 5}"))
    df = spark.createDataFrame(claims, "source string, obj long, value string")
    rows = source_trust_iterations(df, rounds=3).collect()
    got = {}
    for r in rows:
        got.setdefault(r.round, {})[r.source] = r.trust_micro
    ref = _ref_trust(claims)
    for rd in (1, 2, 3):
        assert got[rd] == ref[rd - 1], rd
    # reliability ordering emerges and is stable by round 3
    assert got[3]["good"] > got[3]["meh"] > got[3]["bad"]


def test_truth_discovery_resolution_beats_majority(spark):
    from type_filtered_entity_linker_spark.operators.truth_discovery import (
        resolve_values,
        source_trust_iterations,
    )

    # two junk sources collude on the wrong value for obj 0, tying the
    # two reliable sources 2-2 by raw count; learned trust must break
    # the tie toward the reliable pair (with equal initial trust the
    # vote is literally tied and min-value tie-break would pick 'X' —
    # so a 't0' resolution proves the trust separation did the work)
    claims = [("good1", o, f"t{o}") for o in range(10)]
    claims += [("good2", o, f"t{o}") for o in range(10)]
    claims += [("bad1", o, f"y{o}" if o else "X") for o in range(10)]
    claims += [("bad2", o, f"z{o}" if o else "X") for o in range(10)]
    df = spark.createDataFrame(claims, "source string, obj long, value string")
    trust = (
        source_trust_iterations(df, rounds=3)
        .where(F.col("round") == 3)
        .select("source", F.col("trust_micro").alias("tm"))
    )
    res = {r.obj: r.resolved_value for r in resolve_values(df, trust).collect()}
    # bad2 disagrees everywhere except the collusion, so trust(bad1)+
    # trust(bad2) stays below trust(good) and obj 0 resolves to t0
    assert res[0] == "t0"
    assert all(res[o] == f"t{o}" for o in range(10))


# ------------------------------------------------------------ group linkage


def test_group_linkage_hand_example(spark):
    from type_filtered_entity_linker_spark.operators.matching import (
        group_linkage,
    )

    left = spark.createDataFrame(
        [(1, "g1"), (2, "g1"), (3, "g1"), (10, "g2")],
        "rec_id long, grp string",
    )
    right = spark.createDataFrame(
        [(101, "h1"), (102, "h1"), (110, "h2")], "rec_id long, grp string"
    )
    # g1<->h1: members 1-101 (0.9), 2-102 (1.0); 3 unmatched on the
    # left, so BM = (0.9 + 1.0) / (3 + 2 - 2); sub-threshold and
    # cross-group noise pairs must not contribute
    pairs = spark.createDataFrame(
        [
            (1, 101, 0.9),
            (2, 102, 1.0),
            (3, 102, 0.5),   # below threshold
            (1, 102, 0.7),   # loses reciprocal-best to 2-102
            (10, 110, 0.95),
        ],
        "id_a long, id_b long, sim double",
    )
    got = {
        (r.group_a, r.group_b): r
        for r in group_linkage(left, right, pairs, threshold=0.8).collect()
    }
    r = got[("g1", "h1")]
    assert (r.n_a, r.n_b, r.n_matched) == (3, 2, 2)
    assert r.sim_sum == 1.9
    assert r.bm_sim == round(1.9 / 3, 6)
    r2 = got[("g2", "h2")]
    assert (r2.n_a, r2.n_b, r2.n_matched) == (1, 1, 1)
    assert r2.bm_sim == 0.95
    assert set(got) == {("g1", "h1"), ("g2", "h2")}


def test_group_linkage_one_to_one_within_group_pair(spark):
    from type_filtered_entity_linker_spark.operators.matching import (
        group_linkage,
    )

    # one left member courted by two right members: only the best
    # counts, and n_matched can never exceed min(|G1|, |G2|)
    left = spark.createDataFrame([(1, "g")], "rec_id long, grp string")
    right = spark.createDataFrame(
        [(101, "h"), (102, "h")], "rec_id long, grp string"
    )
    pairs = spark.createDataFrame(
        [(1, 101, 0.99), (1, 102, 0.98)], "id_a long, id_b long, sim double"
    )
    r = group_linkage(left, right, pairs, threshold=0.9).collect()[0]
    assert r.n_matched == 1
    assert r.sim_sum == 0.99
    assert r.bm_sim == round(0.99 / 2, 6)


def test_progressive_curve_emits_all_buckets_on_tiny_input(spark):
    from type_filtered_entity_linker_spark.operators.progressive import (
        progressive_recall_curve,
    )

    # 3 pairs, 10 buckets: empty buckets must appear and carry the
    # cumulative values forward (review r4b — spine left join)
    df = spark.createDataFrame(
        [(1, 101, 0.9, True), (2, 102, 0.5, False), (3, 103, 0.1, True)],
        "id_a long, id_b long, proxy double, is_true boolean",
    )
    rows = {r.bucket: r for r in progressive_recall_curve(df).collect()}
    assert sorted(rows) == list(range(1, 11))
    assert rows[1].n_pairs_cum == 1 and rows[1].n_true_cum == 1
    assert rows[2].n_pairs_cum == 1  # empty bucket carries forward
    assert rows[10].n_pairs_cum == 3 and rows[10].recall_cum == 1.0


def test_pivot_key_unique_for_13_digit_ids(spark):
    # review r4b: the old lpad-12 key truncated 13-digit ids; the
    # suffix key must keep distinct far-apart ids distinct and still
    # match the python reference
    big = 10**12
    edges = [(big, big + 1), (big + 1, big + 2)]
    got = _run_pivot(spark, edges)
    assert got == _ref_pivot(edges)
    assert len(got) == 3
