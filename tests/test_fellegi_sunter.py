"""Fellegi–Sunter probabilistic linkage + blocking-quality metrics
(operators/fellegi_sunter.py)."""

import math

import pytest

import pandas as pd
from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.operators.fellegi_sunter import (
    blocking_quality,
    fellegi_sunter_scores,
    fs_weights,
)

PARAMS = {"name": (0.9, 0.05), "phone": (0.99, 0.001)}


def test_fs_weights_match_log2():
    wa, wd = fs_weights(0.9, 0.05)
    assert wa == math.log2(0.9 / 0.05)
    assert wd == math.log2((1 - 0.9) / (1 - 0.05))


def _records(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "rec_id": [1, 2, 3, 4],
                "name": ["smith", "smyth", "jones", None],
                "phone": ["1234567", "1234567", "9999999", "1234567"],
            }
        )
    )


def test_fs_scores_and_three_way_decision(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 1, 1], "id_b": [2, 3, 4]})
    )
    out = {
        r.id_b: r
        for r in fellegi_sunter_scores(
            _records(spark),
            pairs,
            PARAMS,
            near={"name": 1},
            upper=10.0,
            lower=0.0,
        ).collect()
    }
    wa_n, wd_n = fs_weights(*PARAMS["name"])
    wa_p, wd_p = fs_weights(*PARAMS["phone"])
    # (1,2): name lev 1 -> near-agree, phone exact-agree -> link
    assert (out[2].agree_name, out[2].agree_phone) == (1, 1)
    assert abs(out[2].score - round(wa_n + wa_p, 6)) < 1e-9
    assert out[2].decision == "link"
    # (1,3): both disagree -> non_link
    assert (out[3].agree_name, out[3].agree_phone) == (0, 0)
    assert abs(out[3].score - round(wd_n + wd_p, 6)) < 1e-9
    assert out[3].decision == "non_link"
    # (1,4): name NULL contributes 0 weight; phone agrees -> possible
    assert out[4].agree_name is None and out[4].agree_phone == 1
    assert abs(out[4].score - round(wa_p, 6)) < 1e-9
    assert out[4].decision == "possible"


def test_blocking_quality_counts_without_pair_blowup(spark):
    # 6 records, blocks {A: 3, B: 2, None: 1} -> 3 + 1 = 4 candidates;
    # truth: (1,2) same block, (3,6) split by the NULL key
    blocks = spark.createDataFrame(
        pd.DataFrame(
            {
                "rec_id": [1, 2, 3, 4, 5, 6],
                "block_key": ["A", "A", "A", "B", "B", None],
            }
        )
    )
    truth = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 3], "id_b": [2, 6]})
    )
    row = blocking_quality(blocks, truth).collect()[0]
    assert row.n_records == 6
    assert row.n_candidates == 4
    assert row.n_true == 2 and row.n_true_in_candidates == 1
    assert row.pairs_completeness == 0.5
    assert row.reduction_ratio == round(1 - 4 / 15, 6)


def test_fs_driver_query_shows_all_decisions(spark):
    from type_filtered_entity_linker_spark.plans.driver_queries import QUERIES

    out = (
        QUERIES["er_fellegi_sunter"](spark, "/root/testdata/sf0.001")
        .groupBy("decision")
        .count()
        .collect()
    )
    got = {r.decision: r["count"] for r in out}
    assert set(got) == {"link", "possible", "non_link"}
    row = QUERIES["er_blocking_quality"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert 0 < row.pairs_completeness < 1
    assert row.reduction_ratio > 0.99


def test_em_recovers_planted_structure(spark):
    """Unsupervised EM on the dirty-customer pairs (half planted
    matches, half distractors) must recover the planted parameters
    without labels: match prevalence ~0.5, phone m high / u low, city
    m ~0.5 (half the planted copies had their city blanked).
    Thresholds sit around the measured sf0.001 values (p 0.492,
    m_phone 0.967, u_phone 0.047, m_city 0.474)."""
    from type_filtered_entity_linker_spark.plans.driver_queries import QUERIES

    rows = QUERIES["er_em_weights"](spark, "/root/testdata/sf0.001").collect()
    last = max(rows, key=lambda r: r.iter)
    assert 0.4 < last.p < 0.6, last
    assert last.m_phone > 0.9 and last.u_phone < 0.1, last
    assert 0.35 < last.m_city < 0.6, last
    # monotone sharpening of the informative field across iterations
    by_iter = sorted(rows, key=lambda r: r.iter)
    assert by_iter[-1].m_phone >= by_iter[0].m_phone, rows


def test_tf_adjustment_rare_value_outscores_common(spark):
    """Winkler TF adjustment: two pairs identical except that one
    agrees on a rare surname (1/8 records) and the other on a common
    one (5/8): the rare-agreement pair must score exactly
    log2(cnt_common/cnt_rare) bits higher; disagreement and missing
    weights stay at the fixed literals."""
    from type_filtered_entity_linker_spark.operators.fellegi_sunter import (
        tf_adjusted_scores,
    )

    recs = spark.createDataFrame(
        pd.DataFrame(
            {
                "rec_id": [1, 2, 3, 4, 5, 6, 7, 8],
                "surname": ["zyz", "zyz"] + ["smith"] * 5 + [None],
            }
        )
    )
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {"id_a": [1, 3, 1, 1], "id_b": [2, 4, 3, 8]}
        )
    )
    m, u = 0.95, 0.1
    out = {
        (r.id_a, r.id_b): r
        for r in tf_adjusted_scores(
            recs, pairs, {"surname": (m, u)}, tf_fields=("surname",)
        ).collect()
    }
    rare, common = out[(1, 2)].score, out[(3, 4)].score
    # tf(zyz)=2/7 non-null, tf(smith)=5/7 -> gap = log2(5/2)
    assert rare - common == pytest.approx(math.log2(5 / 2), abs=2e-6)
    assert rare == pytest.approx(math.log2(m) - math.log2(2 / 7), abs=1e-6)
    # disagreement keeps the fixed literal; missing contributes 0
    assert out[(1, 3)].score == pytest.approx(
        math.log2((1 - m) / (1 - u)), abs=1e-6
    )
    assert out[(1, 8)].score == 0.0 and out[(1, 8)].agree_surname is None


def test_er_pipeline_clusters_match_planted_truth(spark):
    """Composite blocking→FS→threshold→CC pipeline recovers exactly the
    planted (orig, orig+1M) pairs whose city survived as 2-clusters
    keyed by the original rec_id. The every-20th pairs whose city the
    fixture blanked score 11.71 < the 12-bit link threshold (the
    designed 'possible' band) and stay singletons — pairwise precision
    1.0, recall = the deliberate city-corruption cost."""
    from type_filtered_entity_linker_spark.plans.driver_queries import (
        _fs_customers,
        q_er_pipeline_clusters,
    )

    sf = "/root/testdata/sf0.001"
    out = {
        r["rec_id"]: r["cluster_id"]
        for r in q_er_pipeline_clusters(spark, sf).collect()
    }
    _, truth, _ = _fs_customers(spark, sf, corrupt="city")
    tpairs = [(r["id_a"], r["id_b"]) for r in truth.collect()]
    assert tpairs, "fixture must plant duplicates"
    linked = [(a, b) for a, b in tpairs if a % 20 != 0]
    blanked = [(a, b) for a, b in tpairs if a % 20 == 0]
    assert linked and blanked, "fixture must exercise both bands"
    for a, b in linked:  # clean-city planted pairs co-cluster
        assert out[a] == out[b] == a
    for a, b in blanked:  # blanked-city pairs fall below threshold
        assert out[a] == a and out[b] == b
    planted = {x for p in tpairs for x in p}
    for rec, cid in out.items():  # precision: everyone else a singleton
        if rec not in planted:
            assert cid == rec


def test_score_pr_curve_hand_computed(spark):
    from type_filtered_entity_linker_spark.operators.evaluation import (
        score_pr_curve,
    )

    rows = [
        (10.0, 1), (10.0, 1), (5.0, 1), (5.0, 0), (1.0, 0), (1.0, 0),
    ]
    df = spark.createDataFrame(rows, "score double, is_match int")
    out = {r["threshold"]: r for r in score_pr_curve(df).collect()}
    assert set(out) == {10.0, 5.0, 1.0}
    r10, r5, r1 = out[10.0], out[5.0], out[1.0]
    assert (r10["cum_pairs"], r10["cum_true"]) == (2, 2)
    assert r10["prec"] == 1.0 and r10["rec"] == round(2 / 3, 6)
    assert r10["f1"] == 0.8  # 2*2/(2+3)
    assert (r5["cum_pairs"], r5["cum_true"]) == (4, 3)
    assert r5["prec"] == 0.75 and r5["rec"] == 1.0
    assert r5["f1"] == round(6 / 7, 6)
    assert (r1["cum_pairs"], r1["cum_true"]) == (6, 3)
    assert r1["prec"] == 0.5 and r1["f1"] == round(2 * 3 / 9, 6)
