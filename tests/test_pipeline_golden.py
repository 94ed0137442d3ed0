"""End-to-end golden test: Spark pipeline vs the pure-Python oracle on
the seeded corpus (SURVEY.md §5.2 items 1-3)."""

import pytest
from pyspark.sql import functions as F

from conftest import assert_df_equal
from type_filtered_entity_linker_spark.config import LinkerConfig
from type_filtered_entity_linker_spark.operators.mentions import with_extracted_text
from type_filtered_entity_linker_spark.oracle import link_corpus, pairwise_f1
from type_filtered_entity_linker_spark.plans.pipeline import run_pipeline


@pytest.fixture(scope="module")
def result(spark, inputs, workdir_module):
    return run_pipeline(spark, inputs, workdir_module, LinkerConfig())


@pytest.fixture(scope="module")
def workdir_module(tmp_path_factory):
    return str(tmp_path_factory.mktemp("wd"))


def test_extracted_text_byte_identical(spark, inputs, fx):
    """Every url's Spark-extracted text equals the oracle text (which the
    fixture guarantees equals the `text` column) — byte identity."""
    out = with_extracted_text(inputs["pages"], LinkerConfig()).toPandas()
    truth = fx["pages"][fx["pages"].lang == "en"][["url", "text"]]
    merged = out.merge(truth, on="url", suffixes=("_got", "_want"))
    assert len(merged) == len(truth)
    assert merged.text_got.eq(merged.text_want).all()


def test_fixture_has_multiline_pages(fx):
    """Guard: the corpus must contain \\n and \\r\\n bodies so the
    byte-identity test above actually exercises multiline extraction
    (the round-2 DOTALL divergence was invisible to single-line
    fixtures)."""
    en = fx["pages"][fx["pages"].lang == "en"].text
    assert en.str.contains("\n", regex=False).any()
    assert en.str.contains("\r\n", regex=False).any()


def test_mentions_match_oracle(result, golden):
    assert_df_equal(
        result.mentions.select(
            "url", "mention_id", "start", "end", "sf", "sf_norm", "ner_type"
        ),
        golden["golden_mentions"],
        ["url", "mention_id"],
    )


def test_candidates_match_oracle(result, golden):
    assert_df_equal(
        result.candidates.select("url", "mention_id", "item_id"),
        golden["golden_candidates"],
        ["url", "mention_id", "item_id"],
    )


def test_spark_pairwise_f1_matches_oracle_and_target(result, spark, fx):
    """The distributed F1 job (operators/evaluation.py) agrees with the
    pure-Python oracle metric on the same clusters, and meets the
    BASELINE acceptance threshold (f1 >= 0.99)."""
    from type_filtered_entity_linker_spark.operators.evaluation import (
        pairwise_f1_spark,
    )

    lp = spark.createDataFrame(fx["labeled_pairs"])
    row = pairwise_f1_spark(result.clusters, lp).collect()[0]
    got_clusters = result.clusters.toPandas()
    want = pairwise_f1(got_clusters, fx["labeled_pairs"])
    assert row.n_pairs_evaluated > 0
    assert (row.tp, row.fp, row.fn, row.tn) == (
        want["tp"], want["fp"], want["fn"], want["tn"],
    )
    assert abs(row.f1 - want["f1"]) < 1e-12
    assert row.f1 >= 0.99


def test_model_filter_mode_matches_oracle(spark, inputs, fx, tmp_path):
    """filter_mode='model' (TypeRec classifier path, O13): the batched-
    inference UDF's filter decisions equal the oracle's bit-for-bit
    (same shared predict function on both sides)."""
    cfg = LinkerConfig(filter_mode="model")
    res = run_pipeline(spark, inputs, str(tmp_path / "wd_model"), cfg)
    g = link_corpus(fx, cfg)
    assert_df_equal(
        res.candidates.select("url", "mention_id", "item_id"),
        g["golden_candidates"],
        ["url", "mention_id", "item_id"],
    )
    # model mode must actually change decisions vs rule mode somewhere
    rule = run_pipeline(
        spark, inputs, str(tmp_path / "wd_rule_cmp"), LinkerConfig()
    )
    n_model = res.candidates.count()
    n_rule = rule.candidates.count()
    assert n_model != n_rule


def test_d2kb_premarked_equals_a2kb(spark, inputs, fx, tmp_path, result):
    """D2KB with the ground-truth spans pre-marked reproduces the A2KB
    links exactly (fixture mentions == detectable mentions), proving
    the premarked path feeds the identical downstream chain."""
    gt_en = fx["gt_mentions"][fx["gt_mentions"].lang == "en"]
    premarked = spark.createDataFrame(gt_en[["url", "start", "end"]])
    res = run_pipeline(
        spark, inputs, str(tmp_path / "wd_d2kb"), LinkerConfig(),
        premarked=premarked,
    )
    a = result.links.toPandas().sort_values(["url", "mention_id"]).reset_index(drop=True)
    d = res.links.toPandas().sort_values(["url", "mention_id"]).reset_index(drop=True)
    assert len(a) == len(d)
    assert a[["url", "mention_id", "item_id"]].equals(
        d[["url", "mention_id", "item_id"]]
    )
    assert (a.score - d.score).abs().max() < 1e-12


def test_mlp_head_matches_oracle_and_f1(spark, inputs, fx, tmp_path):
    """The neural-comparator scorer head (reference disamb/model.py
    compute profile) produces oracle-identical links and clusters with
    pairwise F1 >= 0.99."""
    from type_filtered_entity_linker_spark.operators.evaluation import (
        pairwise_f1_spark,
    )

    cfg = LinkerConfig(scorer_head="mlp")
    res = run_pipeline(spark, inputs, str(tmp_path / "wd_mlp"), cfg)
    g = link_corpus(fx, cfg)
    assert_df_equal(
        res.links, g["golden_links"], ["url", "mention_id"], float_cols=("score",),
        tol=1e-6,  # f32 GEMM: reduction order may differ across BLAS paths
    )
    assert_df_equal(
        res.clusters, g["golden_clusters"], ["mention_key"]
    )
    lp = spark.createDataFrame(fx["labeled_pairs"])
    row = pairwise_f1_spark(res.clusters, lp).collect()[0]
    assert row.n_pairs_evaluated > 0
    assert row.f1 >= 0.99


def test_links_match_oracle(result, golden):
    assert_df_equal(
        result.links,
        golden["golden_links"],
        ["url", "mention_id"],
        float_cols=("score",),
    )


def test_clusters_match_oracle(result, golden):
    assert_df_equal(
        result.clusters, golden["golden_clusters"], ["mention_key"]
    )


def test_pairwise_f1_gate(result, fx):
    """BASELINE.json acceptance: pairwise F1 >= 0.99 on labeled pairs at
    the fixed blocking key."""
    m = pairwise_f1(result.clusters.toPandas(), fx["labeled_pairs"])
    assert m["f1"] >= 0.99, m


def test_filter_reduces_candidates(result):
    """Filter effectiveness metric (reference evaluation.py:9-19):
    the type filter must prune the candidate stream."""
    n_u = result.candidates_unfiltered.count()
    n_f = result.candidates.count()
    assert n_f < n_u


def test_fallback_links_present(result):
    """Ghost alias: all candidates lack embeddings → first-candidate
    fallback with score 0.0 (el/entity_disambiguator.py:49-55)."""
    assert result.links.where(F.col("score") == 0.0).count() > 0


def test_span_filter_mode_matches_oracle(spark, inputs, fx, tmp_path):
    """filter_mode='span' (containment-join type assignment, reference
    el/filter.py:123,146-175): the range-join plan must reproduce the
    oracle's filter decisions exactly. With rule-NER token spans the
    first span contained in a mention IS its first token, whose band
    equals the mention's — so the oracle's rule path is the correct
    golden for the span plan."""
    cfg = LinkerConfig(filter_mode="span")
    res = run_pipeline(spark, inputs, str(tmp_path / "wd_span"), cfg)
    g = link_corpus(fx, cfg)
    assert_df_equal(
        res.candidates.select("url", "mention_id", "item_id"),
        g["golden_candidates"],
        ["url", "mention_id", "item_id"],
    )


def test_d2kb_with_span_filter_mode(spark, inputs, fx, tmp_path):
    """Premarked (D2KB) + filter_mode='span' compose: the containment
    join types premarked spans from the re-tagged page spans, and the
    result equals the rule-mode D2KB run (first contained span = first
    token of the mention)."""
    gt_en = fx["gt_mentions"][fx["gt_mentions"].lang == "en"]
    premarked = spark.createDataFrame(gt_en[["url", "start", "end"]])
    span = run_pipeline(
        spark, inputs, str(tmp_path / "wd_d2kb_span"),
        LinkerConfig(filter_mode="span"), premarked=premarked,
    )
    rule = run_pipeline(
        spark, inputs, str(tmp_path / "wd_d2kb_rule"),
        LinkerConfig(filter_mode="rule"), premarked=premarked,
    )
    a = span.candidates.select("url", "mention_id", "item_id").toPandas()
    b = rule.candidates.select("url", "mention_id", "item_id").toPandas()
    key = ["url", "mention_id", "item_id"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


def test_golden_records_over_pipeline_clusters(result):
    """Survivorship merge composes with the real pipeline output:
    one golden record per cluster, member counts conserved, and every
    elected canonical surface form actually occurs in its cluster."""
    from type_filtered_entity_linker_spark.operators.survivorship import (
        golden_records,
    )

    members = result.clusters.join(
        result.mentions.select(
            F.concat_ws("#", "url", "mention_id").alias("mention_key"),
            "url",
            "sf",
        ),
        "mention_key",
    ).select("cluster_id", "url", "sf")
    gr = golden_records(members, mode_col="sf", doc_col="url")
    assert gr.count() == members.select("cluster_id").distinct().count()
    assert (
        gr.agg(F.sum("n_members")).collect()[0][0] == members.count()
    )
    strays = (
        gr.select("cluster_id", F.col("canonical_sf").alias("sf"))
        .join(members, ["cluster_id", "sf"], "left_anti")
        .count()
    )
    assert strays == 0
