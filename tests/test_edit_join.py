"""PassJoin edit-distance self-join (operators/edit_join.py): the
segment-pigeonhole candidate scheme must be LOSSLESS — output equals
the brute-force cross join filtered to levenshtein <= d — across hand
cases, short-string edge cases, and hypothesis-random corpora."""

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from type_filtered_entity_linker_spark.operators.edit_join import (
    edit_distance_join,
)


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _ref(rows, d):
    return {
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= d
    }


def _run(spark, rows, d):
    df = spark.createDataFrame(rows, "rec_id long, name string")
    out = edit_distance_join(df, "name", d=d)
    return {(r.id_a, r.id_b, r.edist) for r in out.collect()}


def test_edit_join_hand_case(spark):
    rows = [
        (1, "jonathan"),
        (2, "jonathon"),   # 1 substitution from 1
        (3, "jonatha"),    # 1 deletion from 1
        (4, "johnathan"),  # 1 insertion from 1
        (5, "zzzzzzzz"),   # far from everything
    ]
    got = _run(spark, rows, d=2)
    assert got == _ref(rows, 2)
    assert (1, 2, 1) in got and (1, 3, 1) in got and (1, 4, 1) in got
    assert not any(5 in (a, b) for a, b, _ in got)


def test_edit_join_short_strings_route_through_short_block(spark):
    # all below the segment scheme's d+1 minimum length: the explicit
    # short block must still find every pair
    rows = [(1, "a"), (2, "b"), (3, "ab"), (4, ""), (5, "abcd")]
    got = _run(spark, rows, d=2)
    assert got == _ref(rows, 2)
    assert (1, 4, 1) in got  # empty string pairs with 1-char strings


def test_edit_join_rejects_nonpositive_bound(spark):
    df = spark.createDataFrame([(1, "x")], "rec_id long, name string")
    with pytest.raises(ValueError, match="must be >= 1"):
        edit_distance_join(df, "name", d=0)


ALPHA = "abc"
CORPUS = st.lists(
    st.text(alphabet=ALPHA, min_size=0, max_size=9),
    min_size=2,
    max_size=12,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(CORPUS, st.integers(min_value=1, max_value=3))
def test_edit_join_matches_bruteforce(spark, names, d):
    rows = [(i, n) for i, n in enumerate(names)]
    assert _run(spark, rows, d) == _ref(rows, d)
