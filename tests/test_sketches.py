"""Count-Min and HyperLogLog sketches (operators/sketches.py):
overestimate-only guarantee, degenerate-width collision behavior,
linearity (merge = add), and HLL error bounds on known cardinalities."""

from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
    hll_distinct,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _tokens(spark, toks):
    return spark.createDataFrame([(t,) for t in toks], "token string")


def test_cms_exact_when_no_collisions(spark):
    rows = [(1, "a a a b b c"), (2, "a c d")]
    out = {r["token"]: r for r in cms_heavy_hitters(_docs(spark, rows), k=10).collect()}
    truth = {"a": 4, "b": 2, "c": 2, "d": 1}
    assert set(out) == set(truth)
    for t, n in truth.items():
        assert out[t]["exact_n"] == n
        # CMS never underestimates
        assert out[t]["cms_est"] >= n
        assert out[t]["overestimate"] == out[t]["cms_est"] - n
    # 4 distinct tokens into 4x256 cells: no collisions, estimates exact
    assert all(r["overestimate"] == 0 for r in out.values())


def test_cms_width_one_collides_everything(spark):
    toks = _tokens(spark, ["x", "y", "y", "z"])
    sketch = cms_build(toks, width=1)
    est = {
        r["token"]: r["cms_est"]
        for r in cms_estimate(sketch, toks.distinct(), width=1).collect()
    }
    # every token shares the single cell per row -> est = stream length
    assert est == {"x": 4, "y": 4, "z": 4}


def test_cms_is_linear_merge_by_addition(spark):
    a = _tokens(spark, ["p", "q", "p"])
    b = _tokens(spark, ["q", "r"])
    merged = (
        cms_build(a).unionByName(cms_build(b))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(a.unionByName(b))
    diff = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    assert diff == 0


def test_hll_small_range_correction_is_tight(spark):
    # 5 distinct items per group: linear-counting path, must be close
    rows = [(1, "a b c d e"), (2, "a b c d e")]
    d = _docs(spark, rows).select(
        F.lit("g").alias("grp"),
        F.explode(F.split("text", r"\s+")).alias("token"),
    )
    out = hll_distinct(d, "grp", "token").collect()
    assert len(out) == 1
    r = out[0]
    assert r["exact_distinct"] == 5
    assert abs(r["hll_est"] - 5) <= 2


def test_hll_error_within_bound_at_hundreds(spark):
    # 300 distinct tokens: standard error ~1.04/sqrt(64) = 13%;
    # assert a loose 3-sigma-ish bound so the test pins the estimator
    # without being seed-brittle.
    d = _tokens(spark, [f"tok{i}" for i in range(300)] * 2).select(
        F.lit("g").alias("grp"), F.col("token")
    )
    r = hll_distinct(d, "grp", "token").collect()[0]
    assert r["exact_distinct"] == 300
    assert abs(r["rel_err"]) < 0.4


def test_token_entropy_hand_computed(spark):
    import math

    from type_filtered_entity_linker_spark.operators.textstats import (
        token_entropy,
    )

    rows = [
        (1, "a a b b", "u"),   # uniform over 2 tokens -> ln 2, norm 1
        (2, "x x x x", "d"),   # degenerate single token -> 0, norm 0
        (3, "p p q r", "m"),   # H = ln4 - (2 ln2)/4
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in token_entropy(df).collect()}
    assert out["u"]["entropy"] == round(math.log(2), 6)
    assert out["u"]["norm_entropy"] == 1.0
    assert out["d"]["entropy"] == 0.0
    assert out["d"]["vocab"] == 1 and out["d"]["norm_entropy"] == 0.0
    h = math.log(4) - (2 * math.log(2)) / 4
    assert out["m"]["entropy"] == round(h, 6)
    assert out["m"]["norm_entropy"] == round(h / math.log(3), 6)


def test_sketches_xxhash64_production_path(spark):
    """The production hash path must satisfy the same structural
    guarantees as the oracle path: CMS never underestimates (exact in
    the collision-free regime), HLL small-range counting stays tight."""
    rows = [(1, "a a a b b c", None), (2, "a c d", None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["token"]: r
        for r in cms_heavy_hitters(docs, k=10, hash_fn="xxhash64").collect()
    }
    truth = {"a": 4, "b": 2, "c": 2, "d": 1}
    assert {t: r["exact_n"] for t, r in out.items()} == truth
    assert all(r["cms_est"] >= r["exact_n"] for r in out.values())
    assert all(r["overestimate"] == 0 for r in out.values())

    d = _tokens(spark, ["a", "b", "c", "d", "e", "a", "b"]).select(
        F.lit("g").alias("grp"), F.col("token")
    )
    r = hll_distinct(d, "grp", "token", hash_fn="xxhash64").collect()[0]
    assert r["exact_distinct"] == 5
    assert abs(r["hll_est"] - 5) <= 2
