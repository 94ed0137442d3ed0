"""Automated loop-barrier tripwires (VERDICT r04 item 3).

Round 4 caught the both-sides-recompute bug class twice by 10x probe
(MinHash 224 s -> 43.7 s, canopy 2x). These tests assert the barrier
at the PLAN level so a regression fails in pytest, not on a cluster:
the expensive derivation pattern must not appear downstream of its
checkpoint, and the un-barriered pre-fix shape must FAIL the same
assertion (proof the tripwire has teeth).
"""

import pytest
from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.plans.plan_asserts import (
    assert_barriered,
    count_in_plan,
)

# regexes matching nodes only the expensive upstream derivation emits
MINHASH_SIG_AGG = r"min\(pmod\("
SIMHASH_VOTE_AGG = r"sum\(CASE WHEN \(\(shiftright"


def _docs(spark, tmp_path, n=30):
    spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i} z{i % 3}") for i in range(n)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(tmp_path / "docs"))
    return spark.read.parquet(str(tmp_path / "docs"))


def test_minhash_lsh_barrier_holds(spark, tmp_path):
    from type_filtered_entity_linker_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = _docs(spark, tmp_path)
    pairs = lsh_candidate_pairs(minhash_signatures(docs, k=16), bands=4, k=16)
    # the 64-way min signature aggregate lives entirely behind the
    # checkpoint: zero occurrences downstream, both join sides read
    # the checkpoint RDD, and the parquet source is never re-scanned
    assert_barriered(pairs, MINHASH_SIG_AGG, min_existing_rdd=2)
    assert count_in_plan(pairs, r"Scan parquet") == 0


def test_minhash_prefix_shape_fails_the_assertion(spark, tmp_path):
    """The exact pre-fix plan (banded self-join over UN-checkpointed
    signatures — the 224 s shape the r4 10x probe caught) must fail."""
    from type_filtered_entity_linker_spark.operators.dedup import (
        _banded,
        minhash_signatures,
    )

    docs = _docs(spark, tmp_path)
    sigs = minhash_signatures(docs, k=16)  # NO localCheckpoint
    banded = _banded(sigs, 4, 16)
    l = banded.select(F.col("doc_id").alias("doc_a"), "band", "bh")
    r = banded.select(F.col("doc_id").alias("doc_b"), "band", "bh")
    pre = (
        l.join(r, ["band", "bh"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # the signature aggregate is present (twice) in the plan
    assert count_in_plan(pre, MINHASH_SIG_AGG) > 0
    with pytest.raises(AssertionError, match="loop-barrier regression"):
        assert_barriered(pre, MINHASH_SIG_AGG, min_existing_rdd=2)


def test_simhash_barrier_holds(spark, tmp_path):
    from type_filtered_entity_linker_spark.operators.dedup import (
        near_duplicates_simhash,
    )

    docs = _docs(spark, tmp_path)
    out = near_duplicates_simhash(docs, max_hamming=3)
    assert_barriered(out, SIMHASH_VOTE_AGG, min_existing_rdd=2)
    assert count_in_plan(out, r"Scan parquet") == 0


def test_blocking_rules_keys_barrier_holds(spark, tmp_path):
    """The _keys form checkpoints the records projection once; the
    per-rule legacy form re-derives it per rule side (the 21-exchange
    r4 audit shape) and fails the same assertion."""
    from type_filtered_entity_linker_spark.operators.blocking import (
        blocking_rules_cumulative,
        blocking_rules_cumulative_keys,
    )

    spark.createDataFrame(
        [(i, f"name{i % 5}", f"07{i % 7}000{i % 3}") for i in range(40)],
        "rec_id long, name string, phone string",
    ).write.mode("overwrite").parquet(str(tmp_path / "recs"))
    records = spark.read.parquet(str(tmp_path / "recs"))
    truth = spark.createDataFrame([(0, 5), (1, 6)], "id_a long, id_b long")
    keys = [
        ("phone", F.col("phone")),
        ("name4", F.substring("name", 1, 4)),
        ("suffix", F.expr("substring(phone, 4)")),
    ]
    out = blocking_rules_cumulative_keys(records, keys, truth)
    # records parquet never re-scanned: every rule build reads the
    # one checkpointed projection
    assert count_in_plan(out, r"Scan parquet") == 0
    assert count_in_plan(out, r"Scan ExistingRDD") >= 3

    legacy_rules = [
        (name, records.select("rec_id", key.alias("block_key")))
        for name, key in keys
    ]
    legacy = blocking_rules_cumulative(legacy_rules, truth)
    # the legacy shape scans the source once per rule SIDE (2k = 6)
    assert count_in_plan(legacy, r"Scan parquet") >= 6


def test_cc_canopy_pivot_swoosh_outputs_are_checkpoint_rooted(
    spark, tmp_path
):
    """Iterative composites must return checkpoint-rooted plans: the
    source is never in the final lineage (each round barriered), so
    re-evaluating the result can never replay the loop."""
    from type_filtered_entity_linker_spark.operators.canopy import (
        canopy_clusters,
    )
    from type_filtered_entity_linker_spark.operators.clustering import (
        connected_components,
        pivot_clusters,
    )
    from type_filtered_entity_linker_spark.operators.swoosh import swoosh_er

    spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "src long, dst long"
    ).write.mode("overwrite").parquet(str(tmp_path / "edges"))
    edges = spark.read.parquet(str(tmp_path / "edges"))

    cc = connected_components(edges)
    assert count_in_plan(cc, r"Scan parquet") == 0
    assert count_in_plan(cc, r"Scan ExistingRDD") >= 1

    pv = pivot_clusters(edges)
    assert count_in_plan(pv, r"Scan parquet") == 0

    nodes = edges.select(F.col("src").alias("doc_id")).union(
        edges.select("dst")
    ).distinct()
    pairs = edges.select(
        F.col("src").alias("doc_a"),
        F.col("dst").alias("doc_b"),
        F.lit(0.9).alias("jaccard"),
    )
    cn = canopy_clusters(nodes, pairs, s1=0.5, s2=0.8)
    assert count_in_plan(cn, r"Scan parquet") == 0

    spark.createDataFrame(
        [(1, "a", "x"), (2, "a", None), (3, "b", "y")],
        "rec_id long, k string, v string",
    ).write.mode("overwrite").parquet(str(tmp_path / "swrecs"))
    recs = spark.read.parquet(str(tmp_path / "swrecs"))
    sw = swoosh_er(
        recs, [[{"field": "k", "op": "exact"}]], ["k", "v"]
    )
    assert count_in_plan(sw, r"Scan parquet") == 0


def test_linkage_e2e_candidate_barrier_holds(spark, inputs):
    """link_mentions_batch persists+counts the capped candidates once;
    the links plan must read them via InMemoryTableScan, never replay
    the detect→block→filter chain a second time for the scorer."""
    from type_filtered_entity_linker_spark.plans.pipeline import (
        link_pages_batch,
    )

    links = link_pages_batch(inputs["pages"], inputs)
    assert count_in_plan(links, r"InMemoryTableScan") >= 1


def test_incremental_probe_barriers_hold(spark, tmp_path):
    """Both nightly-batch probes checkpoint their index once; the
    final pair plans must read it via Scan ExistingRDD with the
    signature/chunk derivation absent downstream."""
    from type_filtered_entity_linker_spark.operators.dedup import (
        cdc_shared_passages_incremental,
        near_duplicates_incremental,
    )

    docs = _docs(spark, tmp_path)
    old = docs.where(F.col("doc_id") < 20)
    new = docs.where(F.col("doc_id") >= 20).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    nd = near_duplicates_incremental(old, new, 0.5, k=16, bands=4)
    # the 16-way min signature aggregate is behind the checkpoint
    assert_barriered(nd, MINHASH_SIG_AGG, min_existing_rdd=2)

    cdc = cdc_shared_passages_incremental(old, new)
    # the chunk derivation (array-native: the boundary filter's pmod
    # over the gram hash) is behind the chunk-index checkpoint
    assert_barriered(cdc, r"pmod\(xxhash64", min_existing_rdd=2)
