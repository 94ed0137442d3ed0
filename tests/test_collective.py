import sys

sys.path.insert(0, "/root/repo")

from type_filtered_entity_linker_spark.operators.collective import (
    collective_rerank,
)

CAND_SCHEMA = "doc_id long, sf string, item_id long, name string"
TYPE_SCHEMA = "item_id long, type_id string"


def _run(spark, cands, types, **kw):
    c = spark.createDataFrame(cands, CAND_SCHEMA)
    t = spark.createDataFrame(types, TYPE_SCHEMA)
    return {
        (r.doc_id, r.sf): r
        for r in collective_rerank(c, t, **kw).collect()
    }


def test_coherence_flips_string_winner(spark):
    # mention "abc": e1 is string-closer (lev 1) but its type is
    # isolated; e2 (lev 2) shares type "pop" with two other mentions
    # in the doc -> coherence 2, score 2*2-2=2 beats e1's 0-1=-1.
    cands = [
        (1, "abc", 1, "abx"),
        (1, "abc", 2, "abcxx"),
        (1, "foo", 3, "foo"),
        (1, "bar", 4, "bar"),
    ]
    types = [(1, "iso"), (2, "pop"), (3, "pop"), (4, "pop")]
    out = _run(spark, cands, types)
    r = out[(1, "abc")]
    assert r.item_id == 2
    assert (r.lev, r.coherence, r.score) == (2, 2, 2)
    # the supporters link to themselves (their only candidate), each
    # with coherence 2 (the other two pop mentions)
    assert out[(1, "foo")].coherence == 2
    assert out[(1, "bar")].coherence == 2


def test_self_support_excluded_and_tiebreak(spark):
    # singleton doc: the mention's own candidacy must NOT count as
    # coherence (support-1 = 0); equal scores tie-break to lowest id
    cands = [(7, "solo", 5, "solo"), (7, "solo", 6, "solo")]
    types = [(5, "t"), (6, "t")]
    out = _run(spark, cands, types)
    r = out[(7, "solo")]
    assert (r.item_id, r.coherence, r.score) == (5, 0, 0)


def test_typeless_candidate_gets_zero_coherence(spark):
    # a candidate absent from the type dict still competes, at
    # coherence 0 (left join + coalesce), never NULL
    cands = [(3, "abc", 9, "abc"), (3, "abc", 10, "abcd")]
    types = [(10, "t")]
    out = _run(spark, cands, types)
    r = out[(3, "abc")]
    # e9: lev 0, coh 0 -> 0; e10: lev 1, coh 0 (only own mention) -> -1
    assert (r.item_id, r.coherence, r.score) == (9, 0, 0)


def test_multi_type_coherence_sums_over_types(spark):
    # e1 carries two types, each supported by one other mention:
    # coherence = (2-1) + (2-1) = 2
    cands = [
        (4, "m1", 1, "m1"),
        (4, "m2", 2, "m2"),
        (4, "m3", 3, "m3"),
    ]
    types = [(1, "ta"), (1, "tb"), (2, "ta"), (3, "tb")]
    out = _run(spark, cands, types)
    assert out[(4, "m1")].coherence == 2
    assert out[(4, "m2")].coherence == 1
    assert out[(4, "m3")].coherence == 1


def test_iterative_round2_flips_inflated_winner(spark):
    from type_filtered_entity_linker_spark.operators.collective import (
        collective_rerank_iterative,
    )

    # m1's candidate e1 wins round 1 only because type X is supported
    # by OTHER mentions' LOSING candidates (e3, e5); once round 2
    # recomputes support from winners (e4, e6 -> type Z), X's support
    # collapses to m1 alone and e2 takes m1 — the flip the feedback
    # pass exists to produce
    cands = [
        (1, "m1", 1, "m1xx"),   # e1: lev 2
        (1, "m1", 2, "m1x"),    # e2: lev 1
        (1, "m2", 3, "m2xxxxx"),  # e3: lev 5 (loser)
        (1, "m2", 4, "m2"),     # e4: lev 0 (winner)
        (1, "m3", 5, "m3xxxxxxxxx"),  # e5: lev 9 (loser)
        (1, "m3", 6, "m3"),     # e6: lev 0 (winner)
    ]
    types = [(1, "X"), (2, "Y"), (3, "X"), (4, "Z"), (5, "X"), (6, "Z")]
    c = spark.createDataFrame(cands, CAND_SCHEMA)
    t = spark.createDataFrame(types, TYPE_SCHEMA)
    out = {
        (r.doc_id, r.sf): r
        for r in collective_rerank_iterative(c, t).collect()
    }
    m1 = out[(1, "m1")]
    assert m1.item_id == 2 and m1.changed is True
    assert out[(1, "m2")].item_id == 4 and out[(1, "m2")].changed is False
    assert out[(1, "m3")].item_id == 6 and out[(1, "m3")].changed is False
