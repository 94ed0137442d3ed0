"""O11 dirty-URI munging, O25 entity-URL projection, O6 JSON dataset
sink — the reference's id/serialization trivia, each exercised by a
fixture with the reference's own edge cases."""

import pandas as pd
from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.functions.ids import (
    clean_alias_dict,
    entity_url,
    qid_from_uri,
    with_entity_urls,
)


def test_qid_from_uri_reference_rules(spark):
    """Exactly inout/wikidata.py:77-85: slash → last segment; slash +
    dash → statement-suffix strip; no slash → unchanged."""
    cases = {
        "http://www.wikidata.org/entity/Q42": "Q42",
        "http://www.wikidata.org/entity/statement/Q42-4FA06DA0-8C47": "Q42",
        "http://www.wikidata.org/prop/direct/P31": "P31",
        "https://other.example/path/Q77": "Q77",
        "Q7": "Q7",
        "Q7-already-bare": "Q7-already-bare",  # no slash → unchanged
    }
    df = spark.createDataFrame(pd.DataFrame({"u": list(cases)}))
    got = {r.u: r.q for r in df.select("u", qid_from_uri("u").alias("q")).collect()}
    assert got == cases


def test_clean_alias_dict_drops_non_entities(spark):
    aliases = spark.createDataFrame(
        pd.DataFrame(
            {
                "alias_norm": ["douglas adams", "instance of", "douglas adams",
                               "broken"],
                "item_uri": [
                    "http://www.wikidata.org/entity/Q42",
                    "http://www.wikidata.org/prop/direct/P31",  # property → drop
                    "http://www.wikidata.org/entity/statement/Q42-AB-CD",
                    "http://x/y/notanid",  # malformed → drop
                ],
            }
        )
    )
    got = sorted(map(tuple, clean_alias_dict(aliases).collect()))
    assert got == [("douglas adams", "Q42"), ("douglas adams", "Q42")]


def test_entity_url_projection(spark):
    links = spark.createDataFrame(
        pd.DataFrame({"url": ["u"], "mention_id": [0], "item_id": ["Q5"]})
    )
    row = with_entity_urls(links).collect()[0]
    assert row.item_url == "http://www.wikidata.org/entity/Q5"


def test_pipeline_links_carry_item_url(spark, inputs, workdir):
    """The links stage exposes the O25 projection end-to-end."""
    from type_filtered_entity_linker_spark.config import LinkerConfig
    from type_filtered_entity_linker_spark.plans.pipeline import run_pipeline

    res = run_pipeline(
        spark, dict(inputs, pages=inputs["pages"].limit(20)), workdir,
        LinkerConfig(),
    )
    rows = res.links.limit(5).collect()
    assert rows and all(
        r.item_url == "http://www.wikidata.org/entity/" + r.item_id
        for r in rows
    )


def test_json_dataset_round_trip(spark, tmp_path):
    """O6 sink + O3 source: write a derived dataset as JSON lines, read
    it back schema'd, values identical."""
    from type_filtered_entity_linker_spark.sources.dataset import (
        read_json_dataset,
        write_json_dataset,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "item_id": ["Q1", "Q2", "Q3"],
                "label": [1, 0, 1],
            }
        )
    )
    path = str(tmp_path / "ds_json")
    write_json_dataset(df, path)
    back = read_json_dataset(
        spark, path, "doc_id bigint, item_id string, label bigint"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
