"""End-to-end golden test: Spark pipeline vs the pure-Python oracle on
the seeded corpus (SURVEY.md §5.2 items 1-3)."""

import pytest
from pyspark.sql import functions as F

from conftest import assert_df_equal
from type_filtered_entity_linker_spark.config import LinkerConfig
from type_filtered_entity_linker_spark.operators.mentions import with_extracted_text
from type_filtered_entity_linker_spark.oracle import pairwise_f1
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
