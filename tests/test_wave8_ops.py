"""Unit contracts for the wave-8 operators: temporal-decay FS
scoring, PSI score-drift, crawl-frontier scheduling."""

import math

from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.operators.crawl_frontier import (
    schedule_frontier,
)
from type_filtered_entity_linker_spark.operators.drift import score_drift_psi
from type_filtered_entity_linker_spark.operators.temporal_linkage import (
    temporal_fs_scores,
)


def test_temporal_fs_decay_steps_and_static_score(spark):
    params = {"name": (0.9, 0.05)}
    wa = math.log2(0.9 / 0.05)
    records = spark.createDataFrame(
        [
            (1, "ann", 1000),
            (2, "ann", 1100),   # gap 100d -> year 0 -> decay 1.0
            (3, "ann", 1500),   # gap 500d vs 1 -> year 1 -> decay 0.8
            (4, "ann", 9000),   # gap 8000d vs 1 -> clamps to 0.2
        ],
        "rec_id long, name string, seen_ts long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): r
        for r in temporal_fs_scores(records, pairs, params).collect()
    }
    r12 = got[(1, 2)]
    assert r12["gap_days"] == 100 and r12["decay"] == 1.0
    assert r12["score_static"] == round(wa, 6)
    assert r12["score"] == round(wa, 6)
    r13 = got[(1, 3)]
    assert r13["decay"] == 0.8 and r13["score"] == round(wa * 0.8, 6)
    r14 = got[(1, 4)]
    # beyond the table -> clamped to the last step
    assert r14["decay"] == 0.2 and r14["score"] == round(wa * 0.2, 6)


def test_temporal_fs_null_field_contributes_zero(spark):
    params = {"name": (0.9, 0.05)}
    records = spark.createDataFrame(
        [(1, None, 100), (2, "x", 150)],
        "rec_id long, name string, seen_ts long",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = temporal_fs_scores(records, pairs, params).collect()[0]
    assert r["agree_name"] is None
    assert r["score_static"] == 0.0 and r["score"] == 0.0


def test_score_drift_psi_identical_batches_zero(spark):
    a = spark.createDataFrame(
        [(float(v),) for v in (1, 5, 9, 13, 17, -2)], "score double"
    )
    rows = score_drift_psi(a, a).collect()
    assert len(rows) == 6  # every bin present, zero-count included
    assert all(r["psi_term"] == 0.0 for r in rows)
    assert sum(r["n_a"] for r in rows) == 6
    assert [r["n_a"] for r in sorted(rows, key=lambda r: r["bin_idx"])] == [
        1, 1, 1, 1, 1, 1,
    ]


def test_score_drift_psi_detects_shift(spark):
    a = spark.createDataFrame([(1.0,)] * 10, "score double")
    b = spark.createDataFrame([(17.0,)] * 10, "score double")
    rows = score_drift_psi(a, b).collect()
    psi = sum(r["psi_term"] for r in rows)
    assert psi > 0.25  # mass moved wholesale: strong drift
    # NULL scores are dropped, not binned
    a2 = spark.createDataFrame([(None,), (1.0,)], "score double")
    rows2 = score_drift_psi(a2, a2).collect()
    assert sum(r["n_a"] for r in rows2) == 1


def test_schedule_frontier_per_host_politeness(spark):
    f = spark.createDataFrame(
        [
            (1, "h1", 10),
            (2, "h1", 30),
            (3, "h1", 30),  # priority tie -> lower doc_id first
            (4, "h2", 5),
        ],
        "doc_id long, host string, priority long",
    )
    got = {
        r["doc_id"]: (r["host_rank"], r["fetch_time"])
        for r in schedule_frontier(f, 10).collect()
    }
    assert got[2] == (1, 0)   # highest priority, wins tie by id
    assert got[3] == (2, 10)
    assert got[1] == (3, 20)
    assert got[4] == (1, 0)   # other host starts its own queue


def test_schedule_frontier_rejects_bad_delay(spark):
    import pytest

    f = spark.createDataFrame([(1, "h", 1)], "doc_id long, host string, priority long")
    with pytest.raises(ValueError):
        schedule_frontier(f, 0)


def test_robots_filter_prefix_and_empty_rule(spark):
    from type_filtered_entity_linker_spark.operators.crawl_frontier import (
        robots_filter,
    )

    frontier = spark.createDataFrame(
        [
            (1, "h1", "/private/x"),
            (2, "h1", "/public/x"),
            (3, "h2", "/private/x"),   # h2 has only an EMPTY rule
            (4, "h3", "/private/x"),   # h3 has no rules at all
        ],
        "doc_id long, host string, path string",
    )
    rules = spark.createDataFrame(
        [("h1", "/private"), ("h2", "")],
        "host string, disallow_prefix string",
    )
    got = {
        r["doc_id"]: r["allowed"]
        for r in robots_filter(frontier, rules).collect()
    }
    assert got == {1: 0, 2: 1, 3: 1, 4: 1}


def test_contrastive_pairs_labels(spark):
    from type_filtered_entity_linker_spark.operators.curation import (
        contrastive_pairs,
    )

    docs = spark.createDataFrame(
        [(1,), (2,), (3,), (10,)], "doc_id long"
    )
    pos = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    got = {
        (r["doc_a"], r["doc_b"]): r["label"]
        for r in contrastive_pairs(docs, pos).collect()
    }
    # (1,2) positive wins over adjacency; (2,3) adjacent negative;
    # (3,4)/(10,11) partners absent -> dropped
    assert got == {(1, 2): 1, (2, 3): 0}
