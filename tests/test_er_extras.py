"""Round-3 ER additions: prefix-filter exact similarity join (AllPairs),
B-cubed cluster metrics, reciprocal-best one-to-one matching."""

import math
import random

import pytest

from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.operators.evaluation import (
    bcubed_metrics,
    gmd_metrics,
)
from type_filtered_entity_linker_spark.operators.matching import (
    mutual_best_match,
)
from type_filtered_entity_linker_spark.operators.set_similarity import (
    all_pairs_join,
)


def _brute_force(docs: dict[int, str], t: float) -> set[tuple[int, int, float]]:
    sets = {
        i: set(tok for tok in text.split() if tok) for i, text in docs.items()
    }
    out = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if not sets[a] or not sets[b]:
                continue
            ov = len(sets[a] & sets[b])
            un = len(sets[a] | sets[b])
            j = ov / un
            if j >= t:
                out.add((a, b, round(j, 6)))
    return out


def _spark_result(spark, docs: dict[int, str], t: float):
    df = spark.createDataFrame(
        [(i, s) for i, s in docs.items()], "doc_id long, text string"
    )
    rows = all_pairs_join(df, threshold=t).collect()
    return {(r.doc_a, r.doc_b, round(r.jaccard, 6)) for r in rows}


def test_allpairs_matches_bruteforce_random(spark):
    vocab = [f"w{k}" for k in range(40)]
    rng = random.Random(1234)
    for seed in range(3):
        rng.seed(seed)
        docs = {
            i: " ".join(
                rng.choices(vocab, k=rng.randint(1, 15))
            )
            for i in range(60)
        }
        # plant near-duplicates so the >= t band is populated
        for i in range(0, 60, 7):
            toks = docs[i].split()
            docs[1000 + i] = " ".join(toks[1:]) if len(toks) > 1 else docs[i]
        for t in (0.5, 0.6, 0.8):
            assert _spark_result(spark, docs, t) == _brute_force(docs, t), (
                f"seed={seed} t={t}"
            )


def test_allpairs_exact_threshold_boundary(spark):
    # J = 3/5 = 0.6 exactly: the subset pair must survive at t=0.6
    docs = {1: "x y z", 2: "x y z u v", 3: "p q r s"}
    got = _spark_result(spark, docs, 0.6)
    assert got == {(1, 2, 0.6)}


def test_allpairs_identical_and_empty_docs(spark):
    docs = {1: "a b c", 2: "a b c", 3: "", 4: "   ", 5: "unique tokens here"}
    got = _spark_result(spark, docs, 0.9)
    assert got == {(1, 2, 1.0)}


def test_bcubed_hand_example(spark):
    # clusters {1,2,3},{4,5}; classes {1,2},{3,4},{5}
    rows = [(1, 10, 100), (2, 10, 100), (3, 10, 200), (4, 20, 200), (5, 20, 300)]
    df = spark.createDataFrame(
        rows, "rec_id long, cluster_id long, class_id long"
    )
    m = bcubed_metrics(df).collect()[0]
    # cells (cluster, class, m): (10,100,2) (10,200,1) (20,200,1) (20,300,1)
    # P = sum m^2/|cluster| / N, R = sum m^2/|class| / N
    p = (4 / 3 + 1 / 3 + 1 / 2 + 1 / 2) / 5
    r = (2 + 1 / 2 + 1 / 2 + 1) / 5
    assert m.n_records == 5
    assert m.bcubed_precision == pytest.approx(round(p, 6), abs=1e-9)
    assert m.bcubed_recall == pytest.approx(round(r, 6), abs=1e-9)
    assert m.bcubed_f1 == pytest.approx(
        round(2 * p * r / (p + r), 6), abs=1e-9
    )


def test_bcubed_perfect_clustering(spark):
    rows = [(i, i % 3, i % 3) for i in range(9)]
    df = spark.createDataFrame(
        rows, "rec_id long, cluster_id long, class_id long"
    )
    m = bcubed_metrics(df).collect()[0]
    assert (m.bcubed_precision, m.bcubed_recall, m.bcubed_f1) == (1.0, 1.0, 1.0)


def test_gmd_hand_example(spark):
    # clusters {1,2,3},{4,5}; classes {1,2},{3,4},{5} — cluster 10
    # splits into cells ({1,2},{3}), cluster 20 into ({4},{5}); class
    # 200 merges back from cells ({3},{4}). Menestrina slice, unit
    # costs: splits = (2-1)+(2-1) = 2, merges = (1-1)+(2-1)+(1-1) = 1.
    rows = [(1, 10, 100), (2, 10, 100), (3, 10, 200), (4, 20, 200), (5, 20, 300)]
    df = spark.createDataFrame(
        rows, "rec_id long, cluster_id long, class_id long"
    )
    m = gmd_metrics(df).collect()[0]
    assert (m.n_records, m.n_clusters, m.n_classes) == (5, 2, 3)
    assert (m.splits, m.merges, m.gmd) == (2, 1, 3)


def test_gmd_zero_iff_identical_partitions(spark):
    rows = [(i, i % 3, i % 3) for i in range(9)]
    df = spark.createDataFrame(
        rows, "rec_id long, cluster_id long, class_id long"
    )
    m = gmd_metrics(df).collect()[0]
    assert (m.splits, m.merges, m.gmd) == (0, 0, 0)
    # and the degenerate directions: all-singletons needs n_cells −
    # n_classes merges and 0 splits; one-big-cluster the transpose
    singles = spark.createDataFrame(
        [(i, i, i % 3) for i in range(9)],
        "rec_id long, cluster_id long, class_id long",
    )
    ms = gmd_metrics(singles).collect()[0]
    assert (ms.splits, ms.merges) == (0, 6)
    lump = spark.createDataFrame(
        [(i, 0, i % 3) for i in range(9)],
        "rec_id long, cluster_id long, class_id long",
    )
    ml = gmd_metrics(lump).collect()[0]
    assert (ml.splits, ml.merges) == (2, 0)


def test_mutual_best_reciprocal_and_ties(spark):
    pairs = [
        ("a1", "b1", 0.9),
        ("a1", "b2", 0.8),
        ("a2", "b1", 0.7),  # a2's best is b1, but b1 prefers a1 -> unmatched
        ("a2", "b2", 0.6),
        ("a3", "b3", 0.5),  # tie a3: b3 vs b4 -> lower partner id b3 wins
        ("a3", "b4", 0.5),
    ]
    df = spark.createDataFrame(pairs, "id_a string, id_b string, score double")
    got = {(r.id_a, r.id_b) for r in mutual_best_match(df).collect()}
    assert got == {("a1", "b1"), ("a3", "b3")}
    # one-to-one by construction
    lefts = [a for a, _ in got]
    rights = [b for _, b in got]
    assert len(lefts) == len(set(lefts)) and len(rights) == len(set(rights))


def test_mutual_best_passthrough_columns(spark):
    df = spark.createDataFrame(
        [("a", "b", 1.0, "link")],
        "id_a string, id_b string, score double, decision string",
    )
    out = mutual_best_match(df)
    assert set(out.columns) == {"id_a", "id_b", "score", "decision"}
    assert out.collect()[0].decision == "link"


def _shingles(text: str, n: int = 3) -> set[str]:
    # mirror token_shingles: \s+ split, short-doc whole-text fallback
    import re

    toks = re.split(r"\s+", text)
    if len(toks) >= n:
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    return {" ".join(toks)}


def test_allpairs_shingle_mode_matches_bruteforce(spark):
    rng = random.Random(7)
    vocab = [f"w{k}" for k in range(30)]
    docs = {
        i: " ".join(rng.choices(vocab, k=rng.randint(1, 20)))
        for i in range(40)
    }
    for i in range(0, 40, 5):
        toks = docs[i].split()
        docs[2000 + i] = " ".join(toks[1:]) if len(toks) > 1 else docs[i]
    t = 0.6
    exp = set()
    ids = sorted(docs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            sa, sb = _shingles(docs[a]), _shingles(docs[b])
            j = len(sa & sb) / len(sa | sb)
            if j >= t:
                exp.add((a, b, round(j, 6)))
    df = spark.createDataFrame(
        [(i, s) for i, s in docs.items()], "doc_id long, text string"
    )
    rows = all_pairs_join(df, threshold=t, shingle_n=3).collect()
    got = {(r.doc_a, r.doc_b, round(r.jaccard, 6)) for r in rows}
    assert got == exp


def test_jw_boost_threshold_duckdb_parity():
    """boost_threshold=0.7 must be bit-identical to DuckDB's native
    jaro_winkler_similarity on non-empty strings (the documented
    divergence is both-empty only: ours 1.0, DuckDB 0.0)."""
    import duckdb
    import numpy as np

    from type_filtered_entity_linker_spark.functions.strings import (
        jaro_winkler_batch,
    )

    rng = random.Random(99)
    pairs = []
    for _ in range(2000):
        n1, n2 = rng.randint(1, 12), rng.randint(0, 12)
        pairs.append(
            (
                "".join(rng.choices("abcdef", k=n1)),
                "".join(rng.choices("abcdef", k=n2)),
            )
        )
    con = duckdb.connect()
    got = jaro_winkler_batch(
        [p[0] for p in pairs], [p[1] for p in pairs], boost_threshold=0.7
    )
    want = np.array(
        [
            con.execute(
                "SELECT jaro_winkler_similarity(?, ?)", [a, b]
            ).fetchone()[0]
            for a, b in pairs
        ]
    )
    assert np.abs(got - want).max() == 0.0


def test_jw_default_threshold_unchanged():
    """boost_threshold default must reproduce the historic always-boost
    outputs (the scorer's goldens depend on them)."""
    from type_filtered_entity_linker_spark.functions.strings import (
        jaro_winkler_batch,
    )

    a = ["martha", "dwayne", "bedecea", ""]
    b = ["marhta", "duane", "bedabb", ""]
    legacy = jaro_winkler_batch(a, b)
    dflt = jaro_winkler_batch(a, b, boost_threshold=0.0)
    assert (legacy == dflt).all()


def test_monge_elkan_hand_example(spark):
    from type_filtered_entity_linker_spark.operators.matching import (
        monge_elkan_scores,
    )
    from type_filtered_entity_linker_spark.functions.strings import (
        jaro_winkler_batch,
    )

    recs = spark.createDataFrame(
        [(1, "peter christen smith"), (2, "smith peter"), (3, "zzz qqq")],
        "rec_id long, fullname string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    rows = {
        (r.id_a, r.id_b): r
        for r in monge_elkan_scores(recs, pairs, "fullname").collect()
    }

    def jw(a, b):
        return float(jaro_winkler_batch([a], [b], boost_threshold=0.7)[0])

    A = "peter christen smith".split()
    B = "smith peter".split()
    me_ab = sum(max(jw(ta, tb) for tb in B) for ta in A) / len(A)
    me_ba = sum(max(jw(tb, ta) for ta in A) for tb in B) / len(B)
    r = rows[(1, 2)]
    assert r.me_ab == pytest.approx(round(me_ab, 6), abs=1e-9)
    assert r.me_ba == pytest.approx(round(me_ba, 6), abs=1e-9)
    assert r.monge_elkan == pytest.approx(
        round((me_ab + me_ba) / 2, 6), abs=1e-9
    )
    # reordered shared tokens score high; unrelated pair scores low
    assert rows[(1, 2)].monge_elkan > 0.8 > rows[(1, 3)].monge_elkan


# ------------------------------------------------------- greedy matching


def _ref_greedy(pairs):
    """Sequential greedy matching under the strict total order
    (score DESC, id_a ASC, id_b ASC) — the single-threaded pass the
    distributed locally-dominant iteration must reproduce exactly."""
    la, rb, out = set(), set(), set()
    for a, b, s in sorted(pairs, key=lambda p: (-p[2], p[0], p[1])):
        if a not in la and b not in rb:
            la.add(a)
            rb.add(b)
            out.add((a, b, s))
    return out


def _pairs_df(spark, rows):
    return spark.createDataFrame(
        rows, "id_a long, id_b long, score double"
    )


def test_greedy_matching_chain_rescues_round_one_loser(spark):
    from type_filtered_entity_linker_spark.operators.matching import (
        greedy_matching,
    )

    # a2 loses b1 to a1 in round 1, then gets its next-best b2 in
    # round 2 — the recall single-round reciprocal-best leaves behind
    rows = [(1, 11, 0.9), (2, 11, 0.8), (2, 12, 0.7)]
    got = {
        (r.id_a, r.id_b, r.match_round)
        for r in greedy_matching(_pairs_df(spark, rows)).collect()
    }
    assert got == {(1, 11, 1), (2, 12, 2)}
    single = {
        (r.id_a, r.id_b)
        for r in mutual_best_match(_pairs_df(spark, rows)).collect()
    }
    assert single == {(1, 11)}  # strictly fewer matches


def test_greedy_matching_raises_rather_than_truncates(spark):
    from type_filtered_entity_linker_spark.operators.matching import (
        greedy_matching,
    )

    rows = [(1, 11, 0.9), (2, 11, 0.8), (2, 12, 0.7)]
    with pytest.raises(RuntimeError, match="did not converge"):
        greedy_matching(_pairs_df(spark, rows), max_rounds=1)


def test_greedy_matching_empty_input(spark):
    from type_filtered_entity_linker_spark.operators.matching import (
        greedy_matching,
    )

    out = greedy_matching(_pairs_df(spark, []))
    assert out.columns == ["id_a", "id_b", "score", "match_round"]
    assert out.count() == 0


def test_greedy_matching_equals_sequential_greedy_random(spark):
    from type_filtered_entity_linker_spark.operators.matching import (
        greedy_matching,
    )

    rng = random.Random(4242)
    # dense-ish bipartite graph with DELIBERATE score ties (scores
    # drawn from a small grid) so the tie-break order is load-bearing
    rows = sorted(
        {
            (rng.randrange(20), 100 + rng.randrange(20))
            for _ in range(150)
        }
    )
    pairs = [(a, b, rng.randrange(6) / 4.0) for a, b in rows]
    out = greedy_matching(_pairs_df(spark, pairs)).collect()
    got = {(r.id_a, r.id_b, r.score) for r in out}
    assert got == _ref_greedy(pairs)
    # one-to-one in both columns
    assert len({r.id_a for r in out}) == len(out)
    assert len({r.id_b for r in out}) == len(out)


# ---------------------------------------------------------- accent fold


def test_accent_fold_nfc_nfd_case_all_collapse(spark):
    import unicodedata

    from type_filtered_entity_linker_spark.operators.blocking import (
        accent_fold,
    )

    nfc = "José Ångström-Çelik"
    nfd = unicodedata.normalize("NFD", nfc)
    rows = [(1, nfc), (2, nfd), (3, "JOSE ANGSTROM-CELIK"),
            (4, "jose angstrom-celik"), (5, "Łódź")]
    df = spark.createDataFrame(rows, "rec_id long, name string")
    got = {r.rec_id: r.key for r in df.select(
        "rec_id", accent_fold("name").alias("key")).collect()}
    # NFC, NFD, upper, and plain spellings all share one key
    assert got[1] == got[2] == got[3] == got[4] == "jose angstrom-celik"
    # 'ó' is in the table (folds), 'ł'/'ź' are outside it: untouched
    # except lowercase (the documented scope boundary)
    assert got[5] == "łodź"


def test_blocking_rules_cumulative(spark):
    """First-rule attribution, zero-pair rule rows, null-key exclusion,
    and cumulative monotonicity, checked against a hand-computed corpus:
    records 1/2 share key A under rule one AND rule two (attributed to
    rule one), records 3/4 pair only under rule two, rule three is all
    nulls + singletons and must still emit a row with zero pairs."""
    from type_filtered_entity_linker_spark.operators.blocking import (
        blocking_rules_cumulative,
    )

    def blocks(rows):
        return spark.createDataFrame(rows, "rec_id long, block_key string")

    r1 = blocks([(1, "A"), (2, "A"), (3, "B"), (4, "C"), (5, None)])
    r2 = blocks([(1, "X"), (2, "X"), (3, "Y"), (4, "Y"), (5, "Z")])
    r3 = blocks([(1, None), (2, None), (3, "Q"), (4, "R"), (5, "S")])
    truth = spark.createDataFrame([(1, 2), (3, 4), (4, 5)], "id_a long, id_b long")
    out = blocking_rules_cumulative(
        [("one", r1), ("two", r2), ("three", r3)], truth
    ).orderBy("rule_idx")
    rows = [r.asDict() for r in out.collect()]
    assert [r["rule"] for r in rows] == ["one", "two", "three"]
    # rule one: pair (1,2) only (5's null key never joins)
    assert rows[0]["n_pairs"] == 1 and rows[0]["n_new_pairs"] == 1
    # rule two regenerates (1,2) — attributed to rule one — plus (3,4)
    assert rows[1]["n_pairs"] == 2 and rows[1]["n_new_pairs"] == 1
    # rule three: a row exists even with zero pairs
    assert rows[2]["n_pairs"] == 0 and rows[2]["n_new_pairs"] == 0
    assert [r["cum_pairs"] for r in rows] == [1, 2, 2]
    assert [r["cum_true_pairs"] for r in rows] == [1, 2, 2]
    # truth pair (4,5) is never generated: pc plateaus below 1
    assert [r["pc_cum"] for r in rows] == pytest.approx([1 / 3, 2 / 3, 2 / 3])


def test_cluster_conflicts_audit(spark):
    """Hand-built audit: cluster {1,2,3} has one confident link, one
    weak pair, one never-scored pair; {4,5}'s single pair sits exactly
    ON the link threshold (>= is inclusive); {7,8} was never scored at
    all (min_score NULL); singleton 6 is excluded."""
    from type_filtered_entity_linker_spark.operators.clustering import (
        cluster_conflicts,
    )

    assign = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6), (7, 7), (8, 7)],
        "rec_id long, cluster_id long",
    )
    scored = spark.createDataFrame(
        [(1, 2, 5.0), (2, 3, 2.0), (4, 5, 3.0)],
        "id_a long, id_b long, score double",
    )
    out = {
        r["cluster_id"]: r.asDict()
        for r in cluster_conflicts(assign, scored, 3.0).collect()
    }
    assert set(out) == {1, 4, 7}
    c1 = out[1]
    assert (
        c1["n_members"],
        c1["n_intra_pairs"],
        c1["n_links"],
        c1["n_weak"],
        c1["n_unscored"],
    ) == (3, 3, 1, 1, 1)
    assert c1["min_score"] == 2.0
    c4 = out[4]
    assert (c4["n_links"], c4["n_weak"], c4["n_unscored"]) == (1, 0, 0)
    c7 = out[7]
    assert (c7["n_intra_pairs"], c7["n_unscored"]) == (1, 1)
    assert c7["min_score"] is None


def test_cluster_agreement_metrics(spark):
    """Pinned to the textbook example pred=[0,0,1,1,1] vs
    gold=[0,0,0,1,1]: RI 0.6, ARI 1/6, NMI (sqrt normalization)
    0.432538 — the same numbers scikit-learn's adjusted_rand_score /
    normalized_mutual_info_score return. Degenerate single-cluster
    partitions emit NULL ARI/NMI (zero chance-denominator / entropy),
    never a fabricated constant."""
    from type_filtered_entity_linker_spark.operators.evaluation import (
        cluster_agreement_metrics,
    )

    assign = spark.createDataFrame(
        [(0, 0), (0, 0), (1, 0), (1, 1), (1, 1)],
        "cluster_id long, class_id long",
    )
    r = cluster_agreement_metrics(assign).collect()[0]
    assert r["n_records"] == 5
    assert r["rand_index"] == pytest.approx(0.6)
    assert r["adjusted_rand"] == pytest.approx(1 / 6, abs=1e-6)
    assert r["nmi"] == pytest.approx(0.432538, abs=1e-6)

    trivial = spark.createDataFrame(
        [(9, 7)] * 5, "cluster_id long, class_id long"
    )
    t = cluster_agreement_metrics(trivial).collect()[0]
    assert t["rand_index"] == pytest.approx(1.0)
    assert t["adjusted_rand"] is None and t["nmi"] is None


def test_attach_best_semantics(spark):
    """Incremental attach: best candidate wins with lowest-existing-id
    tie-break, the threshold is inclusive, a sub-threshold best spawns
    (attached=False, score kept for the review queue), and a record
    with no candidates spawns with NULL best_score."""
    from type_filtered_entity_linker_spark.operators.matching import (
        attach_best,
    )

    scored = spark.createDataFrame(
        [
            # new 101: tie at 5.0 between existing 3 and 2 -> 2 wins
            (3, 101, 5.0),
            (2, 101, 5.0),
            (9, 101, 1.0),
            # new 102: best is exactly ON the threshold -> attaches
            (7, 102, 3.0),
            # new 103: compared but rejected
            (4, 103, 2.9),
        ],
        "id_a long, id_b long, score double",
    )
    new_records = spark.createDataFrame(
        [(101,), (102,), (103,), (104,)], "rec_id long"
    )
    out = {
        r["rec_id"]: r.asDict()
        for r in attach_best(scored, new_records, 3.0).collect()
    }
    assert out[101]["cluster_id"] == 2 and out[101]["attached"]
    assert out[102]["cluster_id"] == 7 and out[102]["attached"]
    assert out[103]["cluster_id"] == 103 and not out[103]["attached"]
    assert out[103]["best_score"] == 2.9
    assert out[104]["cluster_id"] == 104 and not out[104]["attached"]
    assert out[104]["best_score"] is None


def test_blocking_rules_invariants_random(spark):
    """Property check on random rule sets: n_new_pairs sums to the
    deduplicated union size, cumulative columns are monotone, the
    final cum_pairs equals the distinct union of all rules' pairs,
    and pc_cum never exceeds 1."""
    import random

    from type_filtered_entity_linker_spark.operators.blocking import (
        blocking_rules_cumulative,
    )

    rng = random.Random(77)
    for trial in range(2):
        n_recs = 40
        rules = []
        for r in range(3):
            rows = [
                (i, f"k{rng.randint(0, 12)}" if rng.random() < 0.9 else None)
                for i in range(n_recs)
            ]
            rules.append(
                (
                    f"rule{r}",
                    spark.createDataFrame(
                        rows, "rec_id long, block_key string"
                    ),
                )
            )
        truth = spark.createDataFrame(
            [(i, i + 1) for i in range(0, n_recs - 1, 7)],
            "id_a long, id_b long",
        )
        out = blocking_rules_cumulative(rules, truth).orderBy("rule_idx")
        rows = [r.asDict() for r in out.collect()]
        # expected distinct union, computed independently
        union = set()
        per_rule_expected = []
        for _, blocks in rules:
            by_key = {}
            for rec in blocks.collect():
                if rec.block_key is not None:
                    by_key.setdefault(rec.block_key, []).append(rec.rec_id)
            rp = set()
            for ids in by_key.values():
                ids = sorted(ids)
                for x in range(len(ids)):
                    for y in range(x + 1, len(ids)):
                        rp.add((ids[x], ids[y]))
            per_rule_expected.append(rp)
            union |= rp
        assert sum(r["n_new_pairs"] for r in rows) == len(union)
        assert rows[-1]["cum_pairs"] == len(union)
        for i, r in enumerate(rows):
            assert r["n_pairs"] == len(per_rule_expected[i])
            assert r["pc_cum"] is None or r["pc_cum"] <= 1.0
        for a, b in zip(rows, rows[1:]):
            assert b["cum_pairs"] >= a["cum_pairs"]
            assert b["cum_true_pairs"] >= a["cum_true_pairs"]


def test_calibration_table(spark):
    """Hand-computed reliability rows: posterior from the empirical
    prior (1/3 here), score banding, and canonicalization — the true
    pair arrives with REVERSED ids in the scored table and must still
    match the truth row."""
    from type_filtered_entity_linker_spark.operators.evaluation import (
        calibration_table,
    )

    scored = spark.createDataFrame(
        [(2, 1, 10.0), (3, 4, 10.0), (5, 6, -10.0)],
        "id_a long, id_b long, score double",
    )
    truth = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    rows = {
        r["band"]: r.asDict()
        for r in calibration_table(scored, truth).collect()
    }
    prior_odds = (1 / 3) / (2 / 3)
    p_hi = (2**10 * prior_odds) / (1 + 2**10 * prior_odds)
    p_lo = (2**-10 * prior_odds) / (1 + 2**-10 * prior_odds)
    hi = rows["5:[10.0,15.0)"]
    assert (hi["n_pairs"], hi["n_true"]) == (2, 1)
    assert hi["empirical_rate"] == 0.5
    assert abs(hi["mean_posterior"] - p_hi) < 1e-6
    assert abs(hi["calibration_gap"] - abs(p_hi - 0.5)) < 1e-6
    lo = rows["1:<-5.0"]
    assert (lo["n_pairs"], lo["n_true"]) == (1, 0)
    assert abs(lo["mean_posterior"] - p_lo) < 1e-6
