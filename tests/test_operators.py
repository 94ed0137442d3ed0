"""Operator unit tests: type-filter truth table, top-K determinism,
argmax tie-break + fallback, blocking salt-invariance, CC shapes
(SURVEY.md §5.2 item 4)."""

import pandas as pd
from pyspark.sql import functions as F

from type_filtered_entity_linker_spark.config import LinkerConfig
from type_filtered_entity_linker_spark.operators.blocking import generate_candidates
from type_filtered_entity_linker_spark.operators.clustering import (
    connected_components,
)
from type_filtered_entity_linker_spark.operators.topk import (
    argmax_links,
    cap_candidates,
)
from type_filtered_entity_linker_spark.operators.type_filter import (
    entity_type_summary,
    filter_candidates,
)

# --- type filter truth table ------------------------------------------------


def _tf_fixture(spark):
    # mentions typed: PERSON→S1; MISC→OTHER
    cands = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u"] * 6,
                "mention_id": [0, 0, 0, 1, 1, 1],
                "sf_norm": ["alvar x"] * 3 + ["zeta y"] * 3,
                "ner_type": ["PERSON"] * 3 + ["MISC"] * 3,
                # Q1: S1-typed; Q2: typed but wrong supertype; Q3 typeless
                "item_id": ["Q1", "Q2", "Q3", "Q1", "Q2", "Q3"],
            }
        )
    )
    types = spark.createDataFrame(
        pd.DataFrame({"item_id": ["Q1", "Q2"], "type_id": ["T0", "T1"]})
    )
    closure = spark.createDataFrame(
        pd.DataFrame({"subclass_id": ["T0", "T1"], "supertype_id": ["S1", "S9"]})
    )
    return cands, entity_type_summary(types, closure)


def _kept(df, mid):
    return sorted(
        r.item_id for r in df.where(F.col("mention_id") == mid).collect()
    )


def test_type_filter_truth_table(spark):
    cands, summary = _tf_fixture(spark)
    out = filter_candidates(cands, summary, LinkerConfig())
    # PERSON mention: S1 match kept, S9 dropped, typeless kept
    assert _kept(out, 0) == ["Q1", "Q3"]
    # MISC mention → OTHER → all pass (el/filter.py:43-47)
    assert _kept(out, 1) == ["Q1", "Q2", "Q3"]


def test_type_filter_drop_typeless_flag(spark):
    cands, summary = _tf_fixture(spark)
    out = filter_candidates(
        cands, summary, LinkerConfig(keep_typeless=False)
    )
    assert _kept(out, 0) == ["Q1"]


def test_type_filter_other_strict_flag(spark):
    cands, summary = _tf_fixture(spark)
    out = filter_candidates(
        cands, summary, LinkerConfig(other_passes_all=False)
    )
    # OTHER no longer passes typed candidates; typeless still kept
    assert _kept(out, 1) == ["Q3"]


def test_type_filter_none_mode(spark):
    cands, summary = _tf_fixture(spark)
    out = filter_candidates(cands, summary, LinkerConfig(filter_mode="none"))
    assert out.count() == 6


# --- top-K + argmax -----------------------------------------------------------


def test_cap_candidates_deterministic(spark):
    cands = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u"] * 5,
                "mention_id": [0] * 5,
                "item_id": ["Q10", "Q2", "Q33", "Q4", "Q101"],
            }
        )
    )
    out = cap_candidates(cands, LinkerConfig(candidates_limit=3))
    assert sorted(r.item_id for r in out.collect()) == ["Q10", "Q2", "Q4"]


def test_argmax_tie_breaks_to_lowest_qid(spark):
    scored = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u"] * 3,
                "mention_id": [0] * 3,
                "item_id": ["Q7", "Q3", "Q5"],
                "score": [0.9, 0.9, 0.1],
            }
        )
    )
    rows = argmax_links(scored).collect()
    assert len(rows) == 1 and rows[0].item_id == "Q3"


def test_argmax_fallback_all_null(spark):
    scored = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u", "u"],
                "mention_id": [0, 0],
                "item_id": ["Q9", "Q4"],
                "score": [None, None],
            }
        ).astype({"score": "float64"})
    )
    rows = argmax_links(scored).collect()
    assert len(rows) == 1
    assert rows[0].item_id == "Q4" and rows[0].score == 0.0


# --- blocking: salting must not change the candidate set ----------------------


def test_salted_join_equals_unsalted(spark):
    mentions = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [f"u{i}" for i in range(20)],
                "mention_id": [0] * 20,
                "sf_norm": ["head key"] * 15 + ["tail key"] * 5,
                "ner_type": ["ORG"] * 20,
            }
        )
    )
    aliases = spark.createDataFrame(
        pd.DataFrame(
            {
                "alias_norm": ["head key"] * 30 + ["tail key"] * 2,
                "item_id": [f"Q{i}" for i in range(30)] + ["Q100", "Q101"],
            }
        )
    )
    salted = generate_candidates(
        mentions, aliases, LinkerConfig(salt_threshold=10, n_salt=4)
    )
    plain = generate_candidates(
        mentions, aliases, LinkerConfig(salt_threshold=10**9)
    )
    a = sorted(map(tuple, salted.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b and len(a) == 15 * 30 + 5 * 2


# --- connected components ------------------------------------------------------


def _cc(spark, edges):
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    rows = connected_components(df).collect()
    comp = {}
    for r in rows:
        comp[r.node] = r.cluster_id
    return comp


def test_cc_chain(spark):
    comp = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert {comp[x] for x in "abcd"} == {"a"}


def test_cc_two_components_and_star(spark):
    comp = _cc(spark, [("a", "b"), ("a", "c"), ("a", "d"), ("x", "y")])
    assert {comp[x] for x in "abcd"} == {"a"}
    assert comp["x"] == comp["y"] == "x"


def test_cc_self_loops_ignored(spark):
    comp = _cc(spark, [("a", "a"), ("a", "b"), ("c", "c")])
    assert comp["a"] == comp["b"] == "a"
    assert "c" not in comp  # self-loop only → no edge → handled as singleton upstream


def test_cc_merged_components(spark):
    comp = _cc(spark, [("a", "b"), ("c", "d"), ("b", "c")])
    assert {comp[x] for x in "abcd"} == {"a"}


# --- scorer broadcast size gate --------------------------------------------


def _scorer_fixture(spark):
    import numpy as np

    from type_filtered_entity_linker_spark.functions.strings import embed_text
    from type_filtered_entity_linker_spark.operators.scoring import entity_dim

    m_emb = embed_text("alvar x | some ctx").astype(np.float32).tobytes()
    mentions = spark.createDataFrame(
        pd.DataFrame({"url": ["u"], "mention_id": [0], "m_emb": [m_emb]})
    )
    cands = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u"] * 2,
                "mention_id": [0, 0],
                "sf_norm": ["alvar x"] * 2,
                "ner_type": ["PERSON"] * 2,
                "item_id": ["Q1", "Q2"],
            }
        )
    )
    entities = spark.createDataFrame(
        pd.DataFrame(
            {"item_id": ["Q1", "Q2"], "canonical_norm": ["alvar x", "alvar y"]}
        )
    )
    embs = spark.createDataFrame(
        pd.DataFrame(
            {
                "item_id": ["Q1", "Q2"],
                "emb": [
                    [float(v) for v in embed_text("alvar x | sig")],
                    [float(v) for v in embed_text("alvar y | sig")],
                ],
            }
        )
    )
    return cands, mentions, entity_dim(entities, embs)


def _physical_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


def test_scorer_broadcast_gate(spark):
    """Above the row threshold the sims join must NOT be a forced
    broadcast (web-scale distinct-pair tables can exceed the 8 GB
    broadcast hard limit); scores are identical on both paths."""
    from type_filtered_entity_linker_spark.operators.scoring import (
        score_candidates,
    )

    cands, mentions, dim = _scorer_fixture(spark)
    small = score_candidates(
        cands, mentions, dim, sims_rows_hint=2, broadcast_max_rows=1000
    )
    large = score_candidates(
        cands, mentions, dim, sims_rows_hint=10**9, broadcast_max_rows=1000
    )
    # disable Catalyst's size-based auto-broadcast so the plan shows
    # only EXPLICIT broadcast hints (test tables are tiny; in
    # production the auto path never fires on an unbounded pair table)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan_small = _physical_plan(small)
        plan_large = _physical_plan(large)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert plan_small.count("BroadcastHashJoin") > plan_large.count(
        "BroadcastHashJoin"
    ), "gate did not switch the sims join off the broadcast path"

    def scores(df):
        return {
            (r.url, r.mention_id, r.item_id): round(r.score, 12)
            for r in df.collect()
        }

    assert scores(small) == scores(large)


def test_scorer_gate_counts_distinct_pairs_without_hint(spark):
    """No hint → the gate measures the narrow distinct pair count
    itself (2 pairs here → under any sane threshold → broadcast)."""
    from type_filtered_entity_linker_spark.operators.scoring import (
        score_candidates,
    )

    cands, mentions, dim = _scorer_fixture(spark)
    scored = score_candidates(cands, mentions, dim)
    assert {r.item_id for r in scored.collect()} == {"Q1", "Q2"}


# --- containment-join span type assignment ---------------------------------


def test_span_mention_types_containment_and_default(spark):
    """First CONTAINED span wins (span fully inside the mention range);
    partially-overlapping spans are ignored; mentions containing no
    span default to OTHER (reference el/filter.py:123,146-175)."""
    from type_filtered_entity_linker_spark.operators.type_filter import (
        span_mention_types,
    )

    mentions = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u", "u", "u"],
                "mention_id": [0, 1, 2],
                "start": [10, 50, 90],
                "end": [30, 60, 95],
            }
        )
    )
    spans = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u"] * 4,
                # span A: overlaps mention 0's start but NOT contained;
                # span B and C contained in mention 0 (B first);
                # span D contained in mention 1; mention 2 has none
                "s_start": [5, 12, 20, 52],
                "s_end": [15, 18, 28, 58],
                "s_label": ["GPE", "ORG", "PERSON", "PRODUCT"],
            }
        )
    )
    got = {
        r.mention_id: r.m_type
        for r in span_mention_types(mentions, spans).collect()
    }
    # NER→supertype: ORG→S2, PRODUCT→S4; no contained span → OTHER
    assert got == {0: "S2", 1: "S4", 2: "OTHER"}


def test_span_containment_banded_join_key(spark):
    """The containment join's equi key must include the char-offset
    band (caps row generation at |mentions|×|spans-per-band| on a
    pathological page), and a mention straddling a band boundary must
    still pick up a span that lies entirely in its second band."""
    from type_filtered_entity_linker_spark.operators.type_filter import (
        _SPAN_BAND,
        span_mention_types,
    )

    B = _SPAN_BAND
    mentions = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u", "u"],
                "mention_id": [0, 1],
                # mention 0 straddles the band-0/band-1 boundary; its
                # first contained span starts in band 1
                "start": [B - 10, 3 * B + 5],
                "end": [B + 40, 3 * B + 20],
            }
        )
    )
    spans = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u"] * 3,
                "s_start": [B + 2, B + 20, 3 * B + 6],
                "s_end": [B + 10, B + 30, 3 * B + 12],
                "s_label": ["ORG", "GPE", "PERSON"],
            }
        )
    )
    df = span_mention_types(mentions, spans)
    got = {r.mention_id: r.m_type for r in df.collect()}
    assert got == {0: "S2", 1: "S1"}
    plan = _physical_plan(df)
    join_lines = [
        l for l in plan.splitlines()
        if "Join" in l or "hashpartitioning" in l
    ]
    assert any("bkt" in l for l in join_lines), plan


# --- filter effectiveness summary ------------------------------------------


def test_filter_effectiveness_micro_vs_macro(spark):
    """Micro = totals over all mentions; macro = mean of per-doc means
    (reference evaluation.py:84-159 semantics, computed from candidate
    tables instead of scraped logs)."""
    from type_filtered_entity_linker_spark.operators.evaluation import (
        filter_effectiveness,
    )

    def cands(counts):
        rows = [
            {"url": u, "mention_id": m, "item_id": f"Q{i}"}
            for (u, m), n in counts.items()
            for i in range(n)
        ]
        return spark.createDataFrame(pd.DataFrame(rows))

    unfiltered = cands({("a", 0): 4, ("a", 1): 2, ("b", 0): 10})
    filtered = cands({("a", 0): 1, ("a", 1): 1, ("b", 0): 5})
    row = filter_effectiveness(unfiltered, filtered).collect()[0]
    assert row.micro_avg_unfiltered == round(16 / 3, 6)
    assert row.micro_avg_filtered == round(7 / 3, 6)
    assert row.macro_avg_unfiltered == 6.5  # mean(3, 10)
    assert row.macro_avg_filtered == 3.0  # mean(1, 5)
    assert row.reduction_micro == 0.4375


def test_filter_effectiveness_zero_filtered_mention(spark):
    """A mention whose candidates are ALL filtered still counts with 0
    (left join, not inner)."""
    from type_filtered_entity_linker_spark.operators.evaluation import (
        filter_effectiveness,
    )

    unfiltered = spark.createDataFrame(
        pd.DataFrame(
            {"url": ["a", "a"], "mention_id": [0, 1], "item_id": ["Q1", "Q2"]}
        )
    )
    filtered = spark.createDataFrame(
        pd.DataFrame({"url": ["a"], "mention_id": [0], "item_id": ["Q1"]})
    )
    row = filter_effectiveness(unfiltered, filtered).collect()[0]
    assert row.micro_avg_filtered == 0.5
    assert row.macro_avg_filtered == 0.5


# --- as-of join -------------------------------------------------------------


def test_asof_join_backward_inclusive_and_nulls(spark):
    """Most recent right row at-or-before each left ts per key:
    simultaneous right row counts (inclusive), keys with no prior right
    row keep nulls, later right rows never leak backward."""
    import datetime as dt

    from type_filtered_entity_linker_spark.operators.temporal import asof_join

    def t(m):
        return dt.datetime(2024, 1, 1, 0, m)

    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4],
                "user_id": [1, 1, 1, 2],
                "ts": [t(1), t(5), t(10), t(3)],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1],
                "ts": [t(1), t(7)],
                "p_value": [10.0, 20.0],
            }
        )
    )
    rows = {
        r.event_id: (r.ts_right, r.p_value_right)
        for r in asof_join(left, right, on=["user_id"]).collect()
    }
    assert rows[1] == (t(1), 10.0)  # inclusive tie at equal ts
    assert rows[2] == (t(1), 10.0)  # t=7 purchase must not leak back
    assert rows[3] == (t(7), 20.0)
    assert rows[4] == (None, None)  # user 2: no prior right row


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized cross-check vs pandas.merge_asof (backward,
    allow_exact_matches) — an independent implementation of the same
    semantics."""
    import datetime as dt
    import random

    import numpy as np

    from type_filtered_entity_linker_spark.operators.temporal import asof_join

    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)

    def ts():
        return base + dt.timedelta(minutes=rng.randrange(0, 500))

    left_pd = pd.DataFrame(
        {
            "event_id": range(120),
            "user_id": [rng.randrange(6) for _ in range(120)],
            "ts": [ts() for _ in range(120)],
        }
    )
    right_pd = pd.DataFrame(
        {
            "user_id": [rng.randrange(6) for _ in range(80)],
            "ts": [ts() for _ in range(80)],
            "p_value": [round(rng.random(), 6) for _ in range(80)],
        }
    )
    # merge_asof requires unique right (user_id, ts) for determinism
    right_pd = right_pd.drop_duplicates(["user_id", "ts"])
    got = (
        asof_join(
            spark.createDataFrame(left_pd),
            spark.createDataFrame(right_pd),
            on=["user_id"],
        )
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left_pd.sort_values("ts"),
        right_pd.sort_values("ts").rename(
            columns={"ts": "ts_right", "p_value": "p_value_right"}
        ),
        left_on="ts",
        right_on="ts_right",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("event_id").reset_index(drop=True)
    for c in ("ts_right", "p_value_right"):
        a, b = got[c], want[c]
        assert ((a.isna() & b.isna()) | (a == b)).all(), c


def test_simhash_banding_exact_at_any_hamming(spark):
    """Generalized pigeonhole banding (max_hamming+1 bands) must equal
    the brute-force Hamming join at max_hamming values beyond the
    original 4x16 design (recall-1 claim of the operator docstring)."""
    from type_filtered_entity_linker_spark.operators.dedup import (
        near_duplicates_simhash,
        simhash64,
    )

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    import random

    rng = random.Random(11)
    rows = []
    for d in range(40):
        toks = [rng.choice(words) for _ in range(12)]
        rows.append((d, " ".join(toks)))
        if d % 3 == 0:  # near-copy: one token changed
            toks2 = list(toks)
            toks2[rng.randrange(12)] = rng.choice(words)
            rows.append((d + 1000, " ".join(toks2)))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    for mh in (3, 6, 9):
        banded = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in near_duplicates_simhash(docs, max_hamming=mh).collect()
        }
        sh = simhash64(docs)
        a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
        b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
        brute = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in a.crossJoin(b)
            .where(F.col("doc_a") < F.col("doc_b"))
            .select(
                "doc_a",
                "doc_b",
                F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"),
            )
            .where(F.col("hamming") <= mh)
            .collect()
        }
        assert banded == brute, f"max_hamming={mh}"


def test_detector_correct_under_shuffle_join_plan(spark):
    """With auto-broadcast disabled (the huge-gazetteer regime), the
    membership semi join takes the shuffle path and the detector output
    must be identical to the broadcast-plan output."""
    from type_filtered_entity_linker_spark.config import LinkerConfig
    from type_filtered_entity_linker_spark.fixtures import make_fixtures
    from type_filtered_entity_linker_spark.operators.mentions import (
        detect_mentions_df,
        with_extracted_text,
    )

    fx = make_fixtures(seed=43, n_pages=40)
    cfg = LinkerConfig()
    pages = spark.createDataFrame(fx["pages"])
    gaz = spark.createDataFrame(fx["gazetteer"])
    pt = with_extracted_text(pages, cfg)

    def mentions():
        return sorted(
            (r.url, r.mention_id, r.start, r.end, r.sf_norm, r.ner_type)
            for r in detect_mentions_df(pt, gaz, cfg).collect()
        )

    broadcast_run = mentions()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        shuffle_run = mentions()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert broadcast_run and broadcast_run == shuffle_run


def test_ngram_df_cut_oracle_parity_when_cut_fires(spark):
    """The DF-cut oracle pairing must hold on a corpus where the cut
    actually FIRES (not just while the gate fixture stays under it):
    with max_doc_freq=50 on the boilerplate corpus the footer shingles
    exceed the cut, and the engine must equal the cut-replicating
    DuckDB oracle exactly."""
    import duckdb

    from type_filtered_entity_linker_spark.operators.dedup import (
        near_duplicates_ngram,
        shingle_df_stats,
    )
    from type_filtered_entity_linker_spark.plans.driver_queries import (
        BOILER_CORPUS_SQL,
        _boiler_corpus,
        _jaccard_oracle_sql,
    )

    sf = "/root/testdata/sf0.001"
    corpus = _boiler_corpus(spark, sf)
    stats = shingle_df_stats(corpus, max_doc_freq=50).collect()[0]
    assert stats.n_dropped_shingles > 0, "cut must fire for this test"
    got = (
        near_duplicates_ngram(corpus, threshold=0.6, max_doc_freq=50)
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = (
        con.sql(_jaccard_oracle_sql(BOILER_CORPUS_SQL, max_doc_freq=50))
        .df()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got.doc_a.tolist() == want.doc_a.tolist()
    assert got.doc_b.tolist() == want.doc_b.tolist()
    assert (got.jaccard - want.jaccard).abs().max() <= 1e-9


def test_ann_recall_gate(spark):
    """The recall@5 metrics row (driver query ann_lsh_recall): IVF at
    n_probe=2/8 must recover most of the brute-force truth, and
    OR-amplified multi-table LSH must materially beat the single-table
    bucket (the round-2 gap: no measured recall for the approx paths).
    Thresholds sit below the measured sf0.001 values (0.86 / 0.36 /
    0.06) with head-room for fixture drift."""
    from type_filtered_entity_linker_spark.plans.driver_queries import QUERIES

    row = QUERIES["ann_lsh_recall"](spark, "/root/testdata/sf0.001").collect()[0]
    assert row.recall_ivf >= 0.7, row
    assert row.recall_lsh_mt >= 0.25, row
    assert row.recall_lsh_mt >= row.recall_lsh + 0.1, row


def test_pq_recall_gate(spark):
    """The PQ-ADC recall@5 metrics row (driver query ann_pq_recall):
    the tuned codebook (16 subspaces × 128 centroids) must materially
    beat the default 4×16 floor — the (m_sub, K) curve a user tunes
    against. Thresholds sit below the measured sf0.001 values
    (0.44 / 0.08) with head-room for fixture drift."""
    from type_filtered_entity_linker_spark.plans.driver_queries import QUERIES

    row = QUERIES["ann_pq_recall"](spark, "/root/testdata/sf0.001").collect()[0]
    assert row.recall_pq_tuned >= 0.35, row
    assert row.recall_pq_tuned >= row.recall_pq + 0.2, row


def test_minhash_recall_gate(spark):
    """The MinHash-LSH S-curve metrics row (driver query
    dedup_minhash_recall): on the decayed-copy corpus (truth pairs sit
    at Jaccard ≈ 2/3, mid-S-curve) 16-band×4-row banding must recover
    nearly all truth while 4-band×16-row must miss most of it — the
    measured curve a user tunes (bands, rows) against, not the formula.
    Thresholds sit below/above the measured sf0.001 values
    (0.946 / 0.203) with head-room for fixture drift."""
    from type_filtered_entity_linker_spark.plans.driver_queries import QUERIES

    row = QUERIES["dedup_minhash_recall"](spark, "/root/testdata/sf0.001").collect()[0]
    assert row.n_true > 50, row
    assert row.recall_16b >= 0.85, row
    assert row.recall_4b <= 0.5, row
    assert row.recall_16b >= row.recall_4b + 0.3, row


def test_collected_detector_matches_join_detector(spark):
    """cfg.detector='collected' (single-pass broadcast-set fast path)
    must emit byte-identical mentions — including embeddings — to the
    default join detector."""
    from type_filtered_entity_linker_spark.config import LinkerConfig
    from type_filtered_entity_linker_spark.fixtures import make_fixtures
    from type_filtered_entity_linker_spark.operators.mentions import (
        detect_mentions_df,
        with_extracted_text,
    )

    fx = make_fixtures(seed=45, n_pages=40)
    pages = spark.createDataFrame(fx["pages"])
    gaz = spark.createDataFrame(fx["gazetteer"])

    def mentions(cfg):
        pt = with_extracted_text(pages, cfg)
        return sorted(
            (r.url, r.mention_id, r.start, r.end, r.sf, r.sf_norm,
             r.ner_type, bytes(r.m_emb))
            for r in detect_mentions_df(pt, gaz, cfg).collect()
        )

    # bloom_min_aliases=0 forces the probe even on this small fixture
    # gazetteer (the default gate skips dictionaries under 1024
    # aliases) — the parity claim is about the PROBE being lossless
    join_run = mentions(LinkerConfig(bloom_min_aliases=0))
    collected_run = mentions(LinkerConfig(detector="collected"))
    assert join_run and join_run == collected_run
    # Bloom pre-probe OFF must also be byte-identical: the filter may
    # only change how much work reaches the semi-join, never the output
    no_bloom_run = mentions(LinkerConfig(bloom_bits_per_key=0))
    assert join_run == no_bloom_run
    # and the size gate itself must be output-neutral (probe skipped)
    gated_run = mentions(LinkerConfig(bloom_min_aliases=1 << 30))
    assert join_run == gated_run


def test_bloom_no_false_negatives_and_low_fp(spark):
    """Distributed Bloom build: every inserted alias probes True (no
    false negatives — exactness of the detector depends on it) and the
    false-positive rate on 20k non-members stays near the design point
    (~0.8% at 10 bits/key, 6 hashes; asserted < 3%)."""
    import numpy as np

    from type_filtered_entity_linker_spark.functions.bloom import (
        bloom_probe,
        build_bloom,
    )

    aliases = [f"alias {i} corp" for i in range(5000)]
    # unicode + empty + long strings exercise the cap/length mixing
    aliases += ["", "königs straße", "x" * 500, "x" * 501]
    df = spark.createDataFrame(
        pd.DataFrame({"alias_norm": aliases})
    ).repartition(8)
    words, m_bits, k = build_bloom(df, "alias_norm")
    assert bloom_probe(aliases, words, m_bits, k).all()
    non_members = [f"miss {i} ltd" for i in range(20000)]
    fp = bloom_probe(non_members, words, m_bits, k).mean()
    assert fp < 0.03, fp


def test_columnar_keep_filters_before_ctx():
    """candidate_windows_columnar(keep=...) must return exactly the
    unfiltered run's surviving rows — same ctx strings, same offsets —
    for an arbitrary keep mask."""
    import numpy as np

    from type_filtered_entity_linker_spark.functions.tokenize import (
        candidate_windows_columnar,
    )

    texts = [
        "Alpha Beta Gamma walked to Delta City yesterday",
        "nothing capitalized here",
        "Zeta One visited Alpha Beta",
    ]
    full = candidate_windows_columnar(texts)
    wanted = {"alpha beta", "delta city", "zeta one"}
    got = candidate_windows_columnar(
        texts, keep=lambda sfns: np.array([s in wanted for s in sfns])
    )
    keep_idx = [i for i, s in enumerate(full["sf_norm"]) if s in wanted]
    assert len(keep_idx) == len(got["sf_norm"]) > 0
    for col in ("tid", "run_id", "i", "j", "start", "end"):
        assert got[col].tolist() == [int(full[col][i]) for i in keep_idx]
    for col in ("sf", "sf_norm", "ctx"):
        assert got[col] == [full[col][i] for i in keep_idx]


def test_extract_text_scan_pushdown_and_pruning(spark, tmp_path):
    """The lang filter must reach the parquet scan (PushedFilters) and
    the unused `text` column must be pruned from ReadSchema — the two
    scan properties the 100 TB design depends on."""
    from type_filtered_entity_linker_spark.config import LinkerConfig
    from type_filtered_entity_linker_spark.fixtures import make_fixtures
    from type_filtered_entity_linker_spark.operators.mentions import (
        with_extracted_text,
    )

    fx = make_fixtures(seed=44, n_pages=20)
    path = str(tmp_path / "pages_pq")
    spark.createDataFrame(fx["pages"]).write.mode("overwrite").parquet(path)
    pages = spark.read.parquet(path)
    plan = _physical_plan(with_extracted_text(pages, LinkerConfig()))
    scan = next(l for l in plan.splitlines() if "Scan parquet" in l)
    assert "PushedFilters" in scan and "lang" in scan.split("PushedFilters")[1]
    read_schema = scan.split("ReadSchema:")[1]
    assert "html" in read_schema and "text" not in read_schema


def test_pq_scan_pushdown_and_broadcasts(spark):
    """ann_topk_pq plan pins: the codebook's vec_id range filter and
    the query-side vec_id < 10 filter both reach the parquet scan, and
    the codebook/LUT sides are broadcast (never shuffled corpus-wide)."""
    from type_filtered_entity_linker_spark.plans.driver_queries import QUERIES

    plan = _physical_plan(
        QUERIES["ann_topk_pq"](spark, "/root/testdata/sf0.001")
    )
    scans = [l for l in plan.splitlines() if "Scan parquet" in l]
    pushed = " | ".join(
        l.split("PushedFilters")[1] for l in scans if "PushedFilters" in l
    )
    assert "GreaterThanOrEqual(vec_id,100)" in pushed
    assert "LessThan(vec_id,10)" in pushed
    assert "BroadcastExchange" in plan


def test_asof_join_carries_latest_row_including_nulls(spark):
    """The MOST RECENT right row wins as a whole row — a NULL value in
    it must not be papered over with an older row's non-null value
    (true ASOF row semantics, matching DuckDB/pandas)."""
    import datetime as dt

    from type_filtered_entity_linker_spark.operators.temporal import asof_join

    def t(m):
        return dt.datetime(2024, 1, 1, 0, m)

    left = spark.createDataFrame(
        pd.DataFrame({"event_id": [1], "user_id": [1], "ts": [t(6)]})
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1],
                "ts": [t(1), t(5)],
                "p_value": [10.0, None],
            }
        ).astype({"p_value": "float64"})
    )
    row = asof_join(left, right, on=["user_id"]).collect()[0]
    assert row.ts_right == t(5) and row.p_value_right is None


def test_asof_join_deterministic_on_duplicate_right_ts(spark):
    """Duplicate (key, ts) right rows resolve deterministically (the
    struct-greatest row wins), not by partition luck."""
    import datetime as dt

    from type_filtered_entity_linker_spark.operators.temporal import asof_join

    ts = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        pd.DataFrame({"event_id": [1], "user_id": [1], "ts": [ts]})
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {"user_id": [1, 1], "ts": [ts, ts], "p_value": [3.0, 9.0]}
        )
    )
    got = {
        asof_join(left, right, on=["user_id"]).collect()[0].p_value_right
        for _ in range(3)
    }
    assert got == {9.0}


def test_golden_records_survivorship(spark):
    """Mode election with deterministic tie-break + min/max/count
    merges: the post-cluster survivorship step."""
    from type_filtered_entity_linker_spark.operators.survivorship import (
        golden_records,
    )

    members = spark.createDataFrame(
        pd.DataFrame(
            {
                "cluster_id": ["c1"] * 4 + ["c2"] * 2,
                "doc_id": [1, 1, 2, 3, 4, 4],
                "sf": ["acme", "acme", "acme inc", "acme", "byte", "bite"],
                "lev": [2, 1, 5, 3, 0, 7],
            }
        )
    )
    rows = {
        r.cluster_id: r
        for r in golden_records(
            members, min_cols=("lev",), max_cols=("lev",)
        ).collect()
    }
    c1, c2 = rows["c1"], rows["c2"]
    assert (c1.canonical_sf, c1.n_members, c1.n_docs) == ("acme", 4, 3)
    assert (c1.min_lev, c1.max_lev) == (1, 5)
    # c2: tie (1 vote each) -> lexicographically smallest wins
    assert (c2.canonical_sf, c2.n_members, c2.n_docs) == ("bite", 2, 1)


def test_merge_upsert_arms(spark):
    """All three MERGE arms: matched->update, unmatched-source->insert,
    matched+tombstone->delete; unmatched target survives; tombstoned
    inserts never appear; schema mismatch is rejected."""
    import pytest

    from type_filtered_entity_linker_spark.operators.merge import (
        merge_upsert,
    )

    target = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "v": ["t1", "t2", "t3"]})
    )
    source = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [2, 3, 4, 5],
                "v": ["s2", "s3", "s4", "s5"],
                "dead": [False, True, False, True],
            }
        )
    )
    got = {
        r.k: r.v
        for r in merge_upsert(target, source, "k", delete_col="dead").collect()
    }
    assert got == {1: "t1", 2: "s2", 4: "s4"}  # 3 deleted, 5 never born

    # without the tombstone column the flag must be part of the schema
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(target, source, "k")


def test_golden_records_null_never_beats_real_value(spark):
    """NULLS-LAST tie-break (oracle-parity convention): a NULL member
    value tied with a real one must lose the mode election."""
    from type_filtered_entity_linker_spark.operators.survivorship import (
        golden_records,
    )

    members = spark.createDataFrame(
        pd.DataFrame(
            {
                "cluster_id": ["c"] * 4,
                "doc_id": [1, 2, 3, 4],
                "sf": [None, None, "a", "a"],
            }
        )
    )
    row = golden_records(members).collect()[0]
    assert row.canonical_sf == "a"


def _blocks_df(spark, entries):
    return spark.createDataFrame(
        pd.DataFrame(entries, columns=["rec_id", "block_key"])
    )


def test_meta_blocking_purge_and_wnp(spark):
    """Block purging drops the oversized block entirely (rec 4's only
    key), CBS counts shared blocks, and weighted-node pruning drops
    the edge that is weak in BOTH endpoints' neighborhoods."""
    from type_filtered_entity_linker_spark.operators.meta_blocking import (
        meta_block_prune,
    )

    entries = (
        [(1, "b1"), (2, "b1"), (1, "b2"), (2, "b2")]
        + [(1, "b3"), (3, "b3"), (1, "b4"), (3, "b4")]
        + [(2, "b5"), (3, "b5")]
        + [(i, "big") for i in (1, 2, 3, 4)]  # purged at max 3
    )
    got = {
        (r.id_a, r.id_b): (r.cbs, r.weight)
        for r in meta_block_prune(
            _blocks_df(spark, entries), max_block_size=3
        ).collect()
    }
    # edges before pruning: (1,2)=2, (1,3)=2, (2,3)=1; node means:
    # 1 -> 2.0, 2 -> 1.5, 3 -> 1.5; (2,3) < both endpoint means -> cut
    assert got == {(1, 2): (2, 2.0), (1, 3): (2, 2.0)}


def test_meta_blocking_wep(spark):
    """Weighted-edge pruning keeps only edges at or above the global
    mean edge weight."""
    from type_filtered_entity_linker_spark.operators.meta_blocking import (
        meta_block_prune,
    )

    entries = [(1, "b1"), (2, "b1"), (3, "b1"), (1, "b2"), (2, "b2")]
    got = {
        (r.id_a, r.id_b): r.cbs
        for r in meta_block_prune(
            _blocks_df(spark, entries), scheme="wep", max_block_size=10
        ).collect()
    }
    # edges (1,2)=2, (1,3)=1, (2,3)=1; mean 4/3 -> only (1,2) survives
    assert got == {(1, 2): 2}

    # keep_all returns every edge with the kept flag instead
    flags = {
        (r.id_a, r.id_b): r.kept
        for r in meta_block_prune(
            _blocks_df(spark, entries),
            scheme="wep",
            max_block_size=10,
            keep_all=True,
        ).collect()
    }
    assert flags == {(1, 2): True, (1, 3): False, (2, 3): False}


def test_meta_blocking_ecbs_matches_python_reference(spark):
    """ECBS weights equal the paper's formula computed independently in
    Python: cbs * ln(B/|B_a|) * ln(B/|B_b|) over the PURGED blocks —
    the full purge→ECBS composition via meta_block_prune(keep_all),
    so a regression that fed pre-purge counts into |B_i| or B would
    fail here (the oversized block below must not appear in either)."""
    import math

    import pytest

    from type_filtered_entity_linker_spark.operators.meta_blocking import (
        meta_block_prune,
    )

    entries = [
        (1, "b1"), (2, "b1"), (3, "b1"),
        (1, "b2"), (2, "b2"),
        (2, "b3"), (3, "b3"), (4, "b3"),
        (1, "b4"), (4, "b4"),
    ]
    oversized = [(i, "big") for i in (1, 2, 3, 4)]
    got = {
        (r.id_a, r.id_b): r.weight
        for r in meta_block_prune(
            _blocks_df(spark, entries + oversized),
            weight="ecbs",
            scheme="wep",
            max_block_size=3,
            keep_all=True,
        ).collect()
    }
    nb = {}
    for rid, _ in entries:
        nb[rid] = nb.get(rid, 0) + 1
    total = len({b for _, b in entries})
    cbs = {}
    by_block = {}
    for rid, b in entries:
        by_block.setdefault(b, []).append(rid)
    for ids in by_block.values():
        for i, a in enumerate(ids):
            for b2 in ids[i + 1:]:
                k = (min(a, b2), max(a, b2))
                cbs[k] = cbs.get(k, 0) + 1
    want = {
        (a, b): (c * math.log(total / nb[a])) * math.log(total / nb[b])
        for (a, b), c in cbs.items()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_global_rank_matches_single_window(spark):
    """The range-shuffle + offset-composition rank equals the naive
    single-task global window rank, including on duplicate sort keys
    (total order via the id tiebreaker)."""
    from pyspark.sql import Window

    from type_filtered_entity_linker_spark.operators.sorted_neighborhood import (
        global_rank,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "rec_id": list(range(200)),
                # every 9th key NULL: must rank LAST in both the
                # distributed rank and the DuckDB-convention window
                "k": [
                    None if i % 9 == 0 else f"key_{(i * 37) % 50:02d}"
                    for i in range(200)
                ],
            }
        )
    ).repartition(7)
    got = {
        r.rec_id: r.rank
        for r in global_rank(df, ["k", "rec_id"], num_partitions=5).collect()
    }
    w = Window.orderBy(F.col("k").asc_nulls_last(), "rec_id")
    want = {
        r.rec_id: r.rank
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == want


def test_sorted_neighborhood_pairs_window(spark):
    """Every pair within the rank window appears exactly once with the
    right distance; nothing beyond the window is generated."""
    from type_filtered_entity_linker_spark.operators.sorted_neighborhood import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"rec_id": [1, 2, 3, 4], "name": ["a", "b", "c", "d"]})
    )
    got = {
        (r.id_a, r.id_b): r.dist
        for r in sorted_neighborhood_pairs(df, ["name"], window=2).collect()
    }
    assert got == {
        (1, 2): 1, (2, 3): 1, (3, 4): 1, (1, 3): 2, (2, 4): 2,
    }
