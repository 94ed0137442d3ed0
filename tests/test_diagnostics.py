"""Key-skew diagnostics (operators/diagnostics.py) against a
hand-computed fanout distribution."""

from type_filtered_entity_linker_spark.operators.diagnostics import (
    key_skew_stats,
)


def test_key_skew_stats_hand_computed(spark):
    rows = [("a",)] * 4 + [("b",)] * 2 + [("c",)]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_stats(df, ["k"], top_n=2).collect()
    assert [(r["k"], r["fanout"]) for r in out] == [("a", 4), ("b", 2)]
    r = out[0]
    assert r["n_rows"] == 7
    assert r["n_keys"] == 3
    assert r["max_fanout"] == 4
    assert r["mean_fanout"] == round(7 / 3, 6)
    # fanouts sorted [1, 2, 4]: p50 = 2; p99 = 2 + 0.98 * (4 - 2)
    assert r["p50_fanout"] == 2.0
    assert r["p99_fanout"] == 3.96
    # self-join pairs: C(4,2) + C(2,2) + C(1,2) = 6 + 1 + 0
    assert r["selfjoin_pairs"] == 7
    assert r["key_share"] == round(4 / 7, 6)
    assert out[1]["key_share"] == round(2 / 7, 6)


def test_key_skew_stats_uniform_keys(spark):
    df = spark.createDataFrame([(i % 5,) for i in range(20)], "k long")
    out = key_skew_stats(df, ["k"], top_n=1).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_keys"] == 5 and r["max_fanout"] == 4
    assert r["mean_fanout"] == 4.0 and r["p99_fanout"] == 4.0
    assert r["selfjoin_pairs"] == 5 * 6  # 5 keys x C(4,2)


def _physical_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


def test_new_ops_plan_shapes(spark):
    """Plan pins for the round-3 additions: top-k paths must be
    per-partition heaps (TakeOrderedAndProject), never a global Sort;
    the CMS probe join must broadcast the (<= depth*width)-row
    sketch."""
    from pyspark.sql import functions as F

    from type_filtered_entity_linker_spark.operators.curation import (
        weighted_sample,
    )
    from type_filtered_entity_linker_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    docs = spark.createDataFrame(
        [(i, f"t{i} u{i}", 10 + i) for i in range(50)],
        "doc_id long, text string, n_chars long",
    )
    ws_plan = _physical_plan(weighted_sample(docs, 5, "n_chars"))
    assert "TakeOrderedAndProject" in ws_plan
    assert "Exchange rangepartitioning" not in ws_plan

    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    probe = cms_estimate(cms_build(toks), toks.distinct())
    cms_plan = _physical_plan(probe)
    assert "BroadcastHashJoin" in cms_plan

    skew_plan = _physical_plan(key_skew_stats(docs, ["n_chars"], top_n=3))
    assert "TakeOrderedAndProject" in skew_plan
