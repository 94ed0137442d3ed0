"""Unit contracts for rule-based matching and merge-based ER
(R-Swoosh): the merge-ENABLED match is the whole point — C matches
neither A nor B alone, only their merge."""

import pytest

from type_filtered_entity_linker_spark.operators.rules import (
    rule_based_matches,
)
from type_filtered_entity_linker_spark.operators.swoosh import swoosh_er

RULES = [
    [
        {"field": "name", "op": "lev", "t": 1},
        {"field": "city", "op": "exact"},
    ],
    [
        {"field": "name", "op": "exact"},
        {"field": "phone", "op": "exact"},
    ],
]


def test_rule_based_matches_flags_and_null_semantics(spark):
    records = spark.createDataFrame(
        [
            (1, "annabelle", "rome", None),
            (2, "annabell", "rome", "555"),
            (3, "annabelle", "oslo", "555"),
        ],
        "rec_id long, name string, city string, phone string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["rule_0"], r["rule_1"], r["matched"])
        for r in rule_based_matches(records, pairs, RULES).collect()
    }
    assert got[(1, 2)] == (1, 0, 1)  # lev-1 name + same city
    # NULL phone on 1 -> rule_1 FALSE (never a wildcard)
    assert got[(1, 3)] == (0, 0, 0)
    assert got[(2, 3)] == (0, 0, 0)


def test_swoosh_merge_enables_match(spark):
    records = spark.createDataFrame(
        [
            (1, "annabelle", "rome", None),
            (2, "annabell", "rome", "555"),
            (3, "annabelle", "oslo", "555"),
            (4, "zorro", "lima", "999"),
        ],
        "rec_id long, name string, city string, phone string",
    )
    got = {
        r["rec_id"]: r["entity_id"]
        for r in swoosh_er(
            records, RULES, ["name", "city", "phone"]
        ).collect()
    }
    # round 1 merges {1,2}; the merged record carries annabelle+555 and
    # matches 3 in round 2; 4 stays alone
    assert got == {1: 1, 2: 1, 3: 1, 4: 4}


def test_swoosh_raises_without_convergence_budget(spark):
    records = spark.createDataFrame(
        [
            (1, "annabelle", "rome", None),
            (2, "annabell", "rome", "555"),
            (3, "annabelle", "oslo", "555"),
        ],
        "rec_id long, name string, city string, phone string",
    )
    # needs 2 productive rounds + 1 empty round = 3
    with pytest.raises(RuntimeError):
        swoosh_er(records, RULES, ["name", "city", "phone"], max_rounds=2)


def test_swoosh_rejects_armless_exact(spark):
    records = spark.createDataFrame(
        [(1, "a")], "rec_id long, name string"
    )
    with pytest.raises(ValueError):
        swoosh_er(
            records,
            [[{"field": "name", "op": "lev", "t": 1}]],
            ["name"],
        )
