"""Unit contracts for the wave-5 production-ER-ops operators:
column profiling, uncertainty-sampling label queues, Chapman
capture-recapture, cannot-link audits, per-host corpus health. Each
test pins the operator's documented edge semantics on a hand-checked
micro-fixture (the sf0.01 oracle gate pins them again at scale)."""

import math

from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.operators.active_learning import (
    uncertainty_queue,
)
from type_filtered_entity_linker_spark.operators.clustering import (
    cannot_link_violations,
)
from type_filtered_entity_linker_spark.operators.evaluation import (
    capture_recapture,
)
from type_filtered_entity_linker_spark.operators.profiling import (
    profile_columns,
)
from type_filtered_entity_linker_spark.operators.textstats import host_health


def test_profile_columns_nulls_distinct_and_modal_tiebreak(spark):
    df = spark.createDataFrame(
        [
            ("a", "x"),
            ("a", "y"),
            ("bb", None),
            ("bb", None),
            ("ccc", "y"),
            (None, "x"),
        ],
        "s string, t string",
    )
    rows = {r["col_name"]: r for r in profile_columns(df, ["s", "t"]).collect()}

    s = rows["s"]
    assert (s["n_rows"], s["n_null"], s["n_distinct"]) == (6, 1, 3)
    assert s["null_rate"] == round(1 / 6, 6)
    # lengths 1,1,2,2,3 over 5 non-null rows
    assert s["avg_len"] == round(9 / 5, 6)
    # counts: a=2, bb=2, ccc=1 -> tie on 2 broken by LARGEST value
    assert (s["top_value"], s["top_count"]) == ("bb", 2)

    t = rows["t"]
    assert (t["n_null"], t["n_distinct"]) == (2, 2)
    # x=2, y=2 -> tie -> 'y'
    assert (t["top_value"], t["top_count"]) == ("y", 2)


def test_profile_columns_all_null_column(spark):
    df = spark.createDataFrame([(1,), (2,)], "k long").select(
        F.lit(None).cast("string").alias("v")
    )
    r = profile_columns(df, ["v"]).collect()[0]
    assert (r["n_rows"], r["n_null"], r["n_distinct"]) == (2, 2, 0)
    assert r["avg_len"] is None
    assert r["top_value"] is None and r["top_count"] is None


def test_uncertainty_queue_band_order_and_cut(spark):
    scored = spark.createDataFrame(
        [
            # outside the band: never queued
            (1, 101, -0.5),
            (2, 102, 12.0),
            # in band: uncertainty = |score - 6|
            (3, 103, 6.0),   # 0.0  -> pos 1
            (4, 104, 5.0),   # 1.0  -> pos 2 (tie with next, lower id_a)
            (5, 105, 7.0),   # 1.0  -> pos 3
            (6, 106, 11.0),  # 5.0  -> pos 4 (cut at k=3)
        ],
        "id_a long, id_b long, score double",
    )
    got = (
        uncertainty_queue(scored, 0.0, 12.0, 3)
        .orderBy("queue_pos")
        .collect()
    )
    assert [(r["queue_pos"], r["id_a"]) for r in got] == [
        (1, 3),
        (2, 4),
        (3, 5),
    ]
    assert got[0]["uncertainty"] == 0.0 and got[1]["uncertainty"] == 1.0


def test_capture_recapture_chapman(spark):
    pa = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40), (4, 40)],  # dup collapses
        "id_a long, id_b long",
    )
    pb = spark.createDataFrame(
        [(1, 10), (2, 20), (5, 50)], "id_a long, id_b long"
    )
    r = capture_recapture(pa, pb).collect()[0]
    # n_a=4, n_b=3, n_both=2 -> chapman = (5*4)//3 - 1 = 5
    assert (r["n_a"], r["n_b"], r["n_both"], r["chapman_total"]) == (
        4,
        3,
        2,
        5,
    )
    assert r["coverage_a"] == 0.8 and r["coverage_b"] == 0.6


def test_capture_recapture_disjoint_detectors(spark):
    pa = spark.createDataFrame([(1, 10)], "id_a long, id_b long")
    pb = spark.createDataFrame([(2, 20)], "id_a long, id_b long")
    r = capture_recapture(pa, pb).collect()[0]
    # n_both=0 -> chapman = (2*2)//1 - 1 = 3: the estimator still
    # extrapolates (one pair neither detector saw)
    assert (r["n_both"], r["chapman_total"]) == (0, 3)


def test_cannot_link_violations_classes_and_missing_ids(spark):
    assignments = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 300)], "rec_id long, cluster_id long"
    )
    constraints = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 999)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["violated"]
        for r in cannot_link_violations(assignments, constraints).collect()
    }
    # same cluster -> violated; different -> clean; unknown id -> dropped
    assert got == {(1, 2): 1, (1, 3): 0}


def test_host_health_dup_rate_and_lang_entropy(spark):
    docs = spark.createDataFrame(
        [
            ("h1", "same text", "en", 9),
            ("h1", "same text", "en", 9),
            ("h1", "other", "de", 5),
            ("h1", "third", "de", 5),
            ("h2", "solo", "en", 4),
        ],
        "host string, text string, lang string, n_chars long",
    )
    rows = {r["host"]: r for r in host_health(docs).collect()}

    h1 = rows["h1"]
    assert (h1["n_docs"], h1["n_unique_docs"]) == (4, 3)
    assert h1["dup_rate"] == 0.25
    assert h1["avg_chars"] == 7.0
    # 2 en / 2 de -> balanced two-language mix: entropy ln(2)
    assert h1["n_langs"] == 2
    assert h1["lang_entropy"] == round(math.log(2), 6)

    h2 = rows["h2"]
    assert (h2["dup_rate"], h2["n_langs"], h2["lang_entropy"]) == (
        0.0,
        1,
        0.0,
    )


def test_repair_overmerges_splits_only_violated_clusters(spark):
    from type_filtered_entity_linker_spark.operators.clustering import (
        repair_overmerges,
    )

    # cluster 1 = {1,2,3} chained via one weak edge; cluster 4 = {4,5}
    assignments = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)],
        "rec_id long, cluster_id long",
    )
    scored = spark.createDataFrame(
        [(1, 2, 16.0), (2, 3, 11.0), (1, 3, 4.0), (4, 5, 16.0)],
        "id_a long, id_b long, score double",
    )
    constraints = spark.createDataFrame(
        [(1, 3), (4, 999)], "id_a long, id_b long"
    )
    got = {
        r["rec_id"]: (r["cluster_id"], r["repaired"])
        for r in repair_overmerges(
            assignments, scored, constraints, 12.0
        ).collect()
    }
    # violated cluster 1 re-clusters from its >=12 edges: {1,2} + {3}
    assert got[1] == (1, 1) and got[2] == (1, 1)
    assert got[3] == (3, 1)
    # cluster 4: constraint end 999 unknown -> no violation -> untouched
    assert got[4] == (4, 0) and got[5] == (4, 0)


def test_repair_overmerges_noop_when_no_violations(spark):
    from type_filtered_entity_linker_spark.operators.clustering import (
        repair_overmerges,
    )

    assignments = spark.createDataFrame(
        [(1, 1), (2, 2)], "rec_id long, cluster_id long"
    )
    scored = spark.createDataFrame(
        [(1, 2, 16.0)], "id_a long, id_b long, score double"
    )
    constraints = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    got = {
        r["rec_id"]: (r["cluster_id"], r["repaired"])
        for r in repair_overmerges(
            assignments, scored, constraints, 12.0
        ).collect()
    }
    # the constrained pair sits in DIFFERENT clusters -> nothing to do
    assert got == {1: (1, 0), 2: (2, 0)}


def test_steward_loop_improves_f1(spark):
    from type_filtered_entity_linker_spark.plans.driver_queries import (
        q_er_steward_loop,
    )

    r = q_er_steward_loop(spark, "/root/testdata/sf0.001").collect()[0]
    # labels recover the blanked-city twins: recall rises, precision
    # holds, both label classes actually appeared in the queue
    assert r["n_must"] > 0 and r["n_cannot"] > 0
    assert r["f1_after"] >= r["f1_before"]
    assert r["p_after"] == 1.0 and r["r_after"] > r["r_before"]
