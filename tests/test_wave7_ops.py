"""Unit contracts for the wave-7 operators: spatial blocking join,
FS match-weight waterfall, declarative quality checks. Micro-fixtures
pin the documented edge semantics; the sf0.01 oracle gate pins the
full queries."""

from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.operators.fellegi_sunter import (
    fellegi_sunter_scores,
    fs_waterfall,
)
from type_filtered_entity_linker_spark.operators.quality_checks import (
    run_quality_checks,
)
from type_filtered_entity_linker_spark.operators.spatial import (
    spatial_block_join,
)


def test_spatial_block_join_exact_pairs(spark):
    pts = spark.createDataFrame(
        [
            (1, 0, 0),
            (2, 3, 4),      # dist^2 = 25 = r^2 -> inclusive, kept
            (3, 100, 100),  # far away
            (4, 103, 96),   # dist^2 to 3 = 9 + 16 = 25 -> kept
            (5, -2, -2),    # dist^2 to 1 = 8 -> kept (negative coords)
            (6, 6, 0),      # dist^2 to 1 = 36 -> dropped; to 2 = 25 kept
        ],
        "rec_id long, x long, y long",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist_sq"]
        for r in spatial_block_join(pts, 5).collect()
    }
    # exactly the four in-range pairs; (2,5) at dist^2 61 and (1,6)
    # at 36 must NOT appear
    assert got == {
        (1, 2): 25,
        (1, 5): 8,
        (3, 4): 25,
        (2, 6): 25,
    }


def test_spatial_block_join_cross_cell_boundary(spark):
    # points in adjacent cells (cell size 5): (4,0) cell 0, (6,0)
    # cell 1 — the 3x3 probe must still find them at dist^2 = 4
    pts = spark.createDataFrame(
        [(1, 4, 0), (2, 6, 0)], "rec_id long, x long, y long"
    )
    got = spatial_block_join(pts, 5).collect()
    assert len(got) == 1 and got[0]["dist_sq"] == 4


def test_spatial_block_join_rejects_bad_radius(spark):
    pts = spark.createDataFrame([(1, 0, 0)], "rec_id long, x long, y long")
    import pytest

    with pytest.raises(ValueError):
        spatial_block_join(pts, 0)


def test_fs_waterfall_running_total_lands_on_score(spark):
    params = {"name": (0.9, 0.05), "phone": (0.99, 0.001)}
    records = spark.createDataFrame(
        [(1, "ann", "123"), (2, "ann", "999"), (3, None, "123")],
        "rec_id long, name string, phone string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    scored = fellegi_sunter_scores(records, pairs, params)
    wf = fs_waterfall(scored, params).collect()
    assert len(wf) == 4  # 2 pairs x 2 fields
    by_pair = {}
    for r in wf:
        by_pair.setdefault((r["id_a"], r["id_b"]), []).append(r)
    for pair, rows in by_pair.items():
        rows.sort(key=lambda r: r["field_idx"])
        # last running total == the pair's score, field order preserved
        assert [r["field"] for r in rows] == ["name", "phone"]
        assert rows[-1]["running_total"] == rows[-1]["score"]
    # NULL field -> agree NULL, contribution exactly 0
    null_row = [
        r
        for r in by_pair[(1, 3)]
        if r["field"] == "name"
    ][0]
    assert null_row["agree"] is None and null_row["contrib"] == 0.0


def test_run_quality_checks_kinds_and_fail_flag(spark):
    df = spark.createDataFrame(
        [
            (1, "en", 5),
            (2, "en", 0),
            (3, "xx", -1),
            (4, None, 2),
        ],
        "id long, lang string, n long",
    )
    checks = [
        {"name": "lang_complete", "col": "lang", "kind": "completeness",
         "threshold": 0.9},
        {"name": "id_unique", "col": "id", "kind": "distinctness",
         "threshold": 1.0},
        {"name": "lang_known", "col": "lang", "kind": "in_set",
         "threshold": 0.5, "allowed": ["en", "de"]},
        {"name": "n_nonneg", "col": "n", "kind": "non_negative",
         "threshold": 1.0},
    ]
    got = {r["check"]: r for r in run_quality_checks(df, checks).collect()}
    assert got["lang_complete"]["metric"] == 0.75
    assert got["lang_complete"]["passed"] == 0
    assert got["id_unique"]["metric"] == 1.0 and got["id_unique"]["passed"] == 1
    # 2 of 4 rows in the allow-list (NULL and 'xx' fail)
    assert got["lang_known"]["metric"] == 0.5
    assert got["lang_known"]["passed"] == 1
    assert got["n_nonneg"]["metric"] == 0.75 and got["n_nonneg"]["passed"] == 0


def test_run_quality_checks_empty_table_passes_nothing(spark):
    df = spark.createDataFrame([], "id long, lang string")
    got = run_quality_checks(
        df,
        [{"name": "c", "col": "lang", "kind": "completeness",
          "threshold": 0.0}],
    ).collect()
    assert len(got) == 1
    assert got[0]["metric"] is None and got[0]["passed"] == 0


def test_rank_blocking_rules_order_and_cumulative(spark):
    from type_filtered_entity_linker_spark.operators.blocking_learn import (
        rank_blocking_rules,
    )

    # rule 0: covers 2/4 truth pairs at cost 2 (ratio 1.0)
    # rule 1: covers all 4 at cost 100 (ratio 0.04)
    flags = spark.createDataFrame(
        [
            (1, 11, 1, 1),
            (2, 12, 1, 1),
            (3, 13, 0, 1),
            (4, 14, 0, 1),
        ],
        "id_a long, id_b long, f_0 int, f_1 int",
    )
    costs = spark.createDataFrame(
        [(0, "phone", 2), (1, "prefix", 100)],
        "rule_idx int, rule string, cost_pairs long",
    )
    rows = {
        r["step"]: r
        for r in rank_blocking_rules(flags, costs, 2).collect()
    }
    assert rows[1]["rule"] == "phone"
    assert (rows[1]["covered_alone"], rows[1]["cum_covered"]) == (2, 2)
    assert rows[1]["cum_pc"] == 0.5
    assert rows[2]["rule"] == "prefix"
    assert (rows[2]["cum_covered"], rows[2]["cum_pc"]) == (4, 1.0)


def test_rank_blocking_rules_uncovered_pairs_stay_uncovered(spark):
    from type_filtered_entity_linker_spark.operators.blocking_learn import (
        rank_blocking_rules,
    )

    flags = spark.createDataFrame(
        [(1, 11, 1), (2, 12, 0)], "id_a long, id_b long, f_0 int"
    )
    costs = spark.createDataFrame(
        [(0, "only", 5)], "rule_idx int, rule string, cost_pairs long"
    )
    r = rank_blocking_rules(flags, costs, 1).collect()[0]
    # pair 2 is covered by NOTHING: final cum_pc < 1 tells the designer
    # the rule set has a recall hole
    assert (r["cum_covered"], r["n_truth"], r["cum_pc"]) == (1, 2, 0.5)
