"""NIL-mention clustering: sorted-neighborhood pair bounding on a
pathological block (VERDICT r01 item 5) and end-to-end cluster parity
vs the oracle on a corpus with genuine out-of-KB mentions (a path the
default golden corpus never exercises)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from conftest import assert_df_equal
from type_filtered_entity_linker_spark.config import LinkerConfig
from type_filtered_entity_linker_spark.fixtures import fixtures_to_spark
from type_filtered_entity_linker_spark.functions.strings import embed_text
from type_filtered_entity_linker_spark.operators.clustering import (
    connected_components,
)
from type_filtered_entity_linker_spark.operators.nil import nil_edges
from type_filtered_entity_linker_spark.oracle import link_corpus
from type_filtered_entity_linker_spark.plans.pipeline import run_pipeline
from type_filtered_entity_linker_spark.textlib import make_html


def test_nil_pathological_block_bounded_pairs(spark):
    """One viral NIL surface form with n identical-context mentions:
    the block must cost O(n·w) pairs, not O(n²) — and the neighborhood
    chain must still connect the whole block into one component."""
    n, w = 200, 16
    emb = embed_text("viral thing | same context words").tobytes()
    nils = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [f"u{i:04d}" for i in range(n)],
                "mention_id": [0] * n,
                "sf_norm": ["viral thing"] * n,
                "m_emb": [emb] * n,
            }
        )
    )
    cfg = LinkerConfig(nil_neighborhood=w)
    edges = nil_edges(nils, cfg)
    n_edges = edges.count()
    expected = n * w - w * (w + 1) // 2  # sum of min(w, n-1-rank)
    assert n_edges == expected, f"{n_edges} != {expected} (all-pairs {n*(n-1)//2})"
    comp = connected_components(edges.select("src", "dst")).toPandas()
    assert comp.cluster_id.nunique() == 1
    assert len(comp) == n


def test_nil_pair_generation_is_linear_in_w(spark):
    """The r02 finding was about JOIN ROW GENERATION, not the filtered
    edge count: the bucketed equi-join must GENERATE ≤ 2·n·w rows on a
    viral key (a key-only join generates n² and filters after)."""
    from type_filtered_entity_linker_spark.operators.nil import (
        _nil_pair_candidates,
    )

    n, w = 400, 8
    emb = embed_text("viral thing | same context words").tobytes()
    nils = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [f"u{i:04d}" for i in range(n)],
                "mention_id": [0] * n,
                "sf_norm": ["viral thing"] * n,
                "m_emb": [emb] * n,
            }
        )
    )
    generated = _nil_pair_candidates(nils, LinkerConfig(nil_neighborhood=w)).count()
    assert generated <= 2 * n * w, f"{generated} > {2*n*w} (n²={n*n})"
    # and the rank-filtered edge set is unchanged by the bucketing
    edges = nil_edges(nils, LinkerConfig(nil_neighborhood=w)).count()
    assert edges == n * w - w * (w + 1) // 2


def test_nil_small_block_equals_all_pairs(spark):
    """Blocks of ≤ w+1 mentions are compared all-pairs exactly."""
    n = 5
    emb = embed_text("small block | ctx").tobytes()
    nils = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [f"u{i}" for i in range(n)],
                "mention_id": [0] * n,
                "sf_norm": ["small block"] * n,
                "m_emb": [emb] * n,
            }
        )
    )
    edges = nil_edges(nils, LinkerConfig(nil_neighborhood=16))
    assert edges.count() == n * (n - 1) // 2


@pytest.fixture(scope="module")
def nil_fx(fx):
    """Fixture corpus + crafted pages mentioning gazetteer-only aliases
    ('unknown ville', 'mystery box' — in the gazetteer, absent from
    entity_aliases → zero candidates → NIL). Two context groups per
    alias: same-context mentions must cluster, cross-context must not."""
    rows = []
    ts = dt.datetime(2024, 6, 1)
    ctxs = {
        "A": "glimmer harbor votes",
        "B": "quarry basalt mines",
    }
    k = 0
    for alias in ("Unknown Ville", "Mystery Box"):
        for grp, ctx in ctxs.items():
            for i in range(3):
                text = f"report about {ctx} {alias} {ctx} end"
                url = f"https://nil.example.org/{alias.split()[0].lower()}/{grp}/{i}"
                rows.append(
                    (url, ts + dt.timedelta(minutes=k), make_html(text), text, "en")
                )
                k += 1
    pages = pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )
    fx2 = dict(fx)
    fx2["pages"] = pages
    return fx2


def test_nil_end_to_end_cluster_parity(spark, nil_fx, tmp_path):
    """Pipeline clusters == oracle clusters on the NIL corpus: NIL
    mentions cluster within same-context groups (multi-hop components
    via the CC loop), never across context groups or aliases."""
    cfg = LinkerConfig()
    inputs = fixtures_to_spark(spark, nil_fx)
    res = run_pipeline(spark, inputs, str(tmp_path / "wd_nil"), cfg)
    golden = link_corpus(nil_fx, cfg)
    assert_df_equal(
        res.clusters, golden["golden_clusters"], ["mention_key"]
    )
    got = res.clusters.toPandas()
    assert len(got) == 12  # 2 aliases × 2 context groups × 3 mentions
    # 4 distinct components of size 3 (alias × context group)
    sizes = got.groupby("cluster_id").size()
    assert sorted(sizes) == [3, 3, 3, 3]


def test_nil_viral_block_rank_is_two_level(spark):
    """Verdict r03 #3: a viral NIL block must not funnel through one
    task's sort. The rank window partitions by (k, _sb) — visible in
    the physical plan — and a 300-mention block actually splits across
    many sub-buckets; edges still match the pure-Python replication of
    the (sub_bucket, mk) neighborhood."""
    import hashlib
    from math import sqrt

    import numpy as np

    from type_filtered_entity_linker_spark.operators.nil import (
        _nil_pair_candidates,
        nil_sub_bucket,
    )

    n, w = 300, 4
    cfg = LinkerConfig(nil_neighborhood=w)
    # two context groups -> some pairs pass tau, some don't, so the
    # edge set genuinely depends on WHICH ranks are adjacent
    embs = {
        0: embed_text("viral thing | ctx group zero"),
        1: embed_text("viral thing | ctx group one"),
    }
    rows = pd.DataFrame(
        {
            "url": [f"u{i:04d}" for i in range(n)],
            "mention_id": [0] * n,
            "sf_norm": ["viral thing"] * n,
            "m_emb": [embs[i % 2].tobytes() for i in range(n)],
        }
    )
    nils = spark.createDataFrame(rows)
    pairs = _nil_pair_candidates(nils, cfg)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "_sb" in plan  # the rank window is partitioned by (k, _sb)
    # the block really splits: > 16 distinct sub-buckets at B=64, n=300
    sb = nils.select(
        nil_sub_bucket(F.concat_ws("#", "url", "mention_id"), cfg.nil_rank_buckets).alias("sb")
    )
    assert sb.distinct().count() > 16
    # pure-Python replication of the two-level order
    def sbk(mk):
        return int(hashlib.md5(mk.encode()).hexdigest()[:15], 16) % cfg.nil_rank_buckets

    mks = sorted((f"u{i:04d}#0" for i in range(n)), key=lambda m: (sbk(m), m))
    def cos(a, b):
        va, vb = embs[a], embs[b]
        return float(np.dot(va, vb) / (sqrt(np.dot(va, va)) * sqrt(np.dot(vb, vb))))

    expect = set()
    for i in range(n):
        for j in range(i + 1, min(n, i + 1 + w)):
            ga, gb = int(mks[i][1:5]) % 2, int(mks[j][1:5]) % 2
            if cos(ga, gb) >= cfg.nil_tau:
                expect.add((mks[i], mks[j]))
    got = {(r["src"], r["dst"]) for r in nil_edges(nils, cfg).collect()}
    assert got == expect
    assert 0 < len(got) < n * (n - 1) // 2
