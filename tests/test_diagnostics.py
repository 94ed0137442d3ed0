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


def test_histogram_quantiles_hand_computed(spark):
    from type_filtered_entity_linker_spark.operators.diagnostics import (
        histogram_quantiles,
    )

    # values 0..99 uniform, 10 buckets of width 9.9
    df = spark.createDataFrame([(i,) for i in range(100)], "v long")
    out = {r["q"]: r for r in histogram_quantiles(df, "v", [0.5, 0.9], n_buckets=10).collect()}
    # nearest-rank k = 50 -> bucket 5 holds ranks 51..60? compute:
    # bucket(v) = min(floor(v/9.9), 9); bucket 5 = v in [50..59]
    # cum through bucket 4 (v<=49) = 50 -> first bucket with cum>=50
    # is bucket 4; est = 0 + 4*9.9 + ((50-40)/10)*9.9 = 49.5
    assert out[0.5]["hist_est"] == 49.5
    # exact median of 0..99 = 49.5 -> err 0 here
    assert out[0.5]["exact_pctl"] == 49.5
    assert out[0.5]["abs_err"] == 0.0
    # error always bounded by one bucket width
    assert all(r["abs_err"] <= 9.9 for r in out.values())


def test_histogram_quantiles_within_bucket_of_true_rank(spark):
    """The sketch guarantee: the estimate lies within ONE bucket width
    of the true nearest-rank value (the in-bucket interpolation can
    only move it inside that bucket). Checked against a pure-Python
    nearest-rank on random data, at both a coarse and a fine dial.
    (Note: abs_err vs the INTERPOLATED exact percentile is reported,
    not bounded — adjacent-rank gaps belong to the data, not the
    sketch; the bound below is the one the histogram actually owns.)"""
    import math
    import random

    from type_filtered_entity_linker_spark.operators.diagnostics import (
        histogram_quantiles,
    )

    rng = random.Random(7)
    vals = [rng.randint(0, 10000) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    svals = sorted(vals)
    lo, hi, n = min(vals), max(vals), len(vals)
    for nb in (8, 256):
        width = (hi - lo) / nb
        out = histogram_quantiles(df, "v", [0.5, 0.9], n_buckets=nb).collect()
        for r in out:
            k = math.ceil(r["q"] * n)
            true_rank_val = svals[k - 1]
            assert abs(r["hist_est"] - true_rank_val) <= width, (nb, r)


def test_histogram_quantiles_constant_column(spark):
    """hi == lo guard (advice r03): a constant-valued column used to
    divide by zero in the bucket expression; now every q reports the
    trivially-correct estimate lo with zero error."""
    from type_filtered_entity_linker_spark.operators.diagnostics import (
        histogram_quantiles,
    )

    df = spark.createDataFrame([(7,)] * 20, "v long")
    out = histogram_quantiles(df, "v", [0.5, 0.9, 0.99], n_buckets=16).collect()
    assert len(out) == 3
    for r in out:
        assert r["hist_est"] == 7.0
        assert r["exact_pctl"] == 7.0
        assert r["abs_err"] == 0.0


def test_key_skew_selfjoin_pairs_exact_past_double_precision(spark):
    """selfjoin_pairs stays in bigint (advice r03): a fanout large
    enough that f*(f-1)/2 is not double-representable must come back
    exact. One synthetic key row with fanout 2^28+1 would need 2^55-
    scale pair counts; build the aggregate directly from a fanout
    table via the same expression the operator uses."""
    from pyspark.sql import functions as F

    f = (1 << 28) + 3  # f*(f-1)/2 = 2^55 + ... , beyond 2^53 exactness
    fan = spark.createDataFrame([(f,), (5,)], "fanout long")
    got = fan.agg(
        F.coalesce(
            F.sum(F.shiftright(F.col("fanout") * (F.col("fanout") - 1), 1)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("p")
    ).first()["p"]
    assert got == f * (f - 1) // 2 + 10


def test_interval_overlap_join_unit_validation(spark):
    """Unsupported trunc_unit raises a ValueError naming the options
    (advice r03), and the newly-supported 'minute' unit produces the
    same pairs as 'hour' on minute-grain data."""
    import datetime as dt

    import pytest

    from type_filtered_entity_linker_spark.operators.temporal import (
        interval_overlap_join,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0)
    l = spark.createDataFrame(
        [(1, t0, t0 + dt.timedelta(minutes=90))], "lid long, ls timestamp, le timestamp"
    )
    r = spark.createDataFrame(
        [
            (10, t0 + dt.timedelta(minutes=30), t0 + dt.timedelta(minutes=45)),
            (11, t0 + dt.timedelta(minutes=120), t0 + dt.timedelta(minutes=130)),
        ],
        "rid long, rs timestamp, re timestamp",
    )
    with pytest.raises(ValueError, match="fortnight.*day.*hour.*minute.*week"):
        interval_overlap_join(l, r, "ls", "le", "rs", "re", trunc_unit="fortnight")
    for unit in ("minute", "hour"):
        got = sorted(
            (x["lid"], x["rid"])
            for x in interval_overlap_join(
                l, r, "ls", "le", "rs", "re", trunc_unit=unit
            ).collect()
        )
        assert got == [(1, 10)], unit


def test_powerlaw_alpha_hand_example(spark):
    import math

    from type_filtered_entity_linker_spark.operators.diagnostics import (
        powerlaw_alpha,
    )

    sizes = spark.createDataFrame(
        [(s,) for s in (1, 1, 2, 4, 8)], "sz long"
    )
    m = powerlaw_alpha(sizes, "sz", xmin=2).collect()[0]
    lnsum = sum(math.log(x / 1.5) for x in (2, 4, 8))
    assert (m.n_keys, m.xmin, m.n_tail, m.max_size) == (5, 2, 3, 8)
    assert m.alpha == round(1.0 + 3 / lnsum, 6)
    # pair predictor stays exact-integer: 1 + 6 + 28
    assert m.selfjoin_pairs == 35
    assert m.top_key_pair_share == round(28 / 35, 6)


def test_powerlaw_alpha_degenerate_all_singletons(spark):
    from type_filtered_entity_linker_spark.operators.diagnostics import (
        powerlaw_alpha,
    )

    sizes = spark.createDataFrame([(1,), (1,), (1,)], "sz long")
    m = powerlaw_alpha(sizes, "sz", xmin=2).collect()[0]
    # no tail at all: alpha undefined (NULL, not a fabricated number),
    # zero pairs, zero share
    assert (m.n_tail, m.alpha) == (0, None)
    assert (m.selfjoin_pairs, m.top_key_pair_share) == (0, 0.0)
