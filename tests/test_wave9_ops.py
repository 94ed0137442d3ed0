"""Unit contracts for the wave-9 operators: winnowing fingerprints
(the Schleimer/Wilkerson/Aiken guarantee) and the drift histogram
building blocks the streaming monitor shares with the batch PSI."""

from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.operators.dedup import (
    winnowing_fingerprints,
)
from type_filtered_entity_linker_spark.operators.drift import (
    binned_histogram,
    psi_from_histograms,
)


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    # shared run of >= window + k - 1 = 6 tokens MUST yield a shared
    # fingerprint, regardless of the surrounding text
    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"intro words here {shared} tail one"),
            (2, f"completely different head {shared} other ending"),
            (3, "no overlap with anything else at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(docs)
    sets = {
        r["doc_id"]: set(x["fp"] for x in rows)
        for r in fps.select("doc_id").distinct().collect()
        for rows in [fps.where(F.col("doc_id") == r["doc_id"]).collect()]
    }
    assert sets[1] & sets[2], "shared 6-token run must share a fingerprint"
    assert not (sets[1] & sets[3])
    assert not (sets[2] & sets[3])


def test_winnowing_short_doc_gets_global_min(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "one two three four")],
        "doc_id long, text string",
    )
    got = winnowing_fingerprints(docs).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r["fp"])
    # doc 1: < k tokens -> single whole-text gram -> exactly one fp
    assert len(by_doc[1]) == 1
    # doc 2: 2 k-grams < window -> the pos-0 window spans both -> 1 fp
    assert len(by_doc[2]) == 1


def test_winnowing_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} common tokens run here for doc {i}") for i in range(6)],
        "doc_id long, text string",
    )
    a = sorted(
        (r["doc_id"], r["fp"]) for r in winnowing_fingerprints(docs).collect()
    )
    b = sorted(
        (r["doc_id"], r["fp"]) for r in winnowing_fingerprints(docs).collect()
    )
    assert a == b and len(a) > 0


def test_psi_from_histograms_matches_manual(spark):
    import math

    ha = spark.createDataFrame([(0, 8), (1, 2)], "bin_idx int, cnt long")
    hb = spark.createDataFrame([(0, 2), (1, 8)], "bin_idx int, cnt long")
    rows = {r["bin_idx"]: r for r in psi_from_histograms(ha, hb, 2).collect()}
    pa0, pb0 = 9 / 12, 3 / 12
    assert rows[0]["p_a"] == round(pa0, 6) and rows[0]["p_b"] == round(pb0, 6)
    assert rows[0]["psi_term"] == round((pa0 - pb0) * math.log(pa0 / pb0), 6)


def test_binned_histogram_edges_half_open(spark):
    df = spark.createDataFrame(
        [(v,) for v in (-1.0, 0.0, 3.9, 4.0, 100.0)], "score double"
    )
    got = {
        r["bin_idx"]: r["cnt"]
        for r in binned_histogram(df, "score", [0.0, 4.0]).collect()
    }
    # (-inf,0): -1 | [0,4): 0.0, 3.9 | [4,inf): 4.0, 100
    assert got == {0: 1, 1: 2, 2: 2}
