"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ..., "pairs_scored_per_sec": ...}

Benches three things:
1. headline driver-table queries at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1) — dedup / similarity / text analysis /
   linkage-chain / relational;
2. the full domain linkage pipeline (synthetic seeded corpus,
   n_pages scaled) end-to-end with per-stage timings;
3. scorer throughput (pairs-scored/sec — the BASELINE.json metric).

Parallelism comes from $SPARK_GRAFT_CPUS (default 32). The scaling
study (local[8] vs local[32] per the north rule's two-cluster-size
criterion) is orchestrated by scripts/scaling_bench.py, which invokes
this file as a subprocess per parallelism level.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from type_filtered_entity_linker_spark.config import LinkerConfig
from type_filtered_entity_linker_spark.fixtures import make_fixtures
from type_filtered_entity_linker_spark.plans.driver_queries import QUERIES
from type_filtered_entity_linker_spark.plans.pipeline import run_pipeline
from type_filtered_entity_linker_spark.session import spark_session

HEADLINE = [
    "el_clusters",
    "dedup_exact",
    "dedup_minhash_lsh",
    # head-shingle stress: every doc shares a boilerplate footer; at
    # sf0.1 the DF-cut prunes those shingles — bounded runtime evidence
    "dedup_ngram_boilerplate",
    # exact prefix-filter similarity join (lossless AllPairs; compare
    # against dedup_ngram_*'s DF-cut numbers at the same sf)
    "dedup_allpairs",
    "dedup_simhash",
    "dedup_embedding",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "ann_topk_pq",
    "lang_id",
    "quality_score",
    "token_count",
    "doc_fingerprint",
    "media_features",
    "events_hourly_window",
    "events_asof_join",
    # streaming surfaces: AvailableNow drain of the staged file source
    # (windowed agg + cross-batch dedup state)
    "events_stream_window",
    "events_stream_dedup",
    "events_stream_join",
    "events_stream_sessions",
    "lineitem_agg",
    "top_orders_per_customer",
    # curation family: scan-speed narrow ops + the capped window
    "docs_split",
    "docs_stratified_sample",
    "docs_domain_cap",
    "docs_pii_redact",
    # O31 trainers: 5 (logistic) / 3 (softmax) full-batch epoch jobs
    "disamb_train_curve",
    "typerec_train_eval",
    # round-3 additions: streaming cluster maintenance (2 micro-batch
    # CC folds) and the WARC raw-crawl source round-trip
    "el_clusters_incremental",
    "warc_roundtrip",
    # round-3 webtext/ER additions: relational n-gram repetition
    # signals, rarest-token-blocked TF-IDF pair scoring, URL canon,
    # BM25 retrieval, the composed curation funnel, and the streaming
    # canonical-URL crawl dedup
    "doc_repetition",
    "er_tfidf_pairs",
    "url_canonicalize",
    "bm25_search",
    "docs_curation_funnel",
    "er_phonetic_blocks",
    "crawl_stream_url_dedup",
    # late round-3 additions: PQ-ADC ANN, eval-set 13-gram
    # decontamination, MassiveText-style paragraph dedup, and
    # Fellegi-Sunter probabilistic linkage + blocking-quality metrics
    "docs_decontaminate",
    "docs_paragraph_dedup",
    # skew stress: one paragraph repeated corpus-wide — bounded by the
    # partial-aggregated min-struct owner election
    "docs_paragraph_boilerplate",
    "er_fellegi_sunter",
    "er_blocking_quality",
    "er_em_weights",
    # keep-one dedup clustering (CC over minhash pairs), Lloyd's
    # k-means topic bucketing, and PageRank crawl centrality
    "dedup_cluster_keep",
    "embed_kmeans",
    "graph_pagerank",
    "docs_pack_sequences",
    "docs_token_budget_mix",
    "crawl_snapshot_diff",
    "docs_vocab_topk",
    # survivorship merge over the linkage clusters (reuses the warm
    # el-chain bases, so this times the merge itself)
    "el_golden_records",
    # key-level MERGE INTO shape (one full-outer join)
    "docs_merge_upsert",
    # ordered conversion funnel (3 same-key partial-agg shuffles)
    "events_funnel",
    # meta-blocking: purge -> CBS weight -> weighted-node pruning
    "er_meta_blocking",
    # Winkler TF-adjusted Fellegi-Sunter (per-value agreement weights)
    "er_tf_adjusted",
    # meta-blocking evaluation gate (edge reduction vs truth recall)
    "er_meta_blocking_quality",
    # sorted-neighborhood pairs over the distributed global rank
    "er_sorted_neighborhood",
    # CCNet-style bigram-LM perplexity tiers (two LM-count shuffles +
    # two scoring joins + exact distributed rank)
    "docs_lm_perplexity",
    # mergeable sketches: Count-Min heavy hitters, HLL distinct-per-
    # source, and the A-ES weighted sample (all single-shuffle)
    "docs_cms_heavy_hitters",
    "docs_hll_distinct",
    "docs_weighted_sample",
    # banded interval-overlap range join + shuffle-key skew report
    "events_interval_join",
    "events_key_skew",
    # streaming HLL maintenance (register state, duplicate-delivery)
    "events_stream_hll",
    # composite corpus construction: exact dedup -> LM tiers -> report
    "corpus_build_e2e",
    # FS threshold sweep (sets upper/lower by measurement)
    "er_pr_curve",
    # per-source token-distribution Shannon entropy
    "docs_token_entropy",
    # mergeable histogram quantile sketch with measured error
    "docs_hist_quantiles",
    # round-4 additions: shingle-containment dedup (excerpt shape),
    # SCD2 crawl-history intervals, LPA communities + degree-ordered
    # triangle counting, PMI collocations, positional phrase search
    "dedup_containment",
    "crawl_scd2",
    "crawl_scd2_incremental",
    "crawl_stream_scd2",
    "graph_label_prop",
    "graph_triangles",
    "docs_pmi_bigrams",
    "docs_phrase_search",
    # ExactSubstr-style repeated-span detection (Lee et al. 2022 shape)
    "docs_repeated_spans",
    # exact greedy 1-1 matching via iterated locally-dominant rounds
    "er_greedy_matching",
    # canopy pre-blocking: lex-first-MIS centers + rtime membership
    "er_canopy",
    # PassJoin lossless edit-distance self-join (segment pigeonhole)
    "er_edit_join",
    # accent-insensitive blocking keys (lower+translate, no UDF)
    "er_unicode_keys",
    # DSIR importance-resampling data selection (Xie et al. 2023)
    "docs_dsir_select",
    # Splink-style cumulative blocking-rule attribution chart
    "er_blocking_rules",
    # transitive-closure audit of review-threshold clusters
    "er_transitive_conflicts",
    # Rand/ARI/NMI partition agreement of the pipeline clusters
    "er_cluster_agreement",
    # SemDeDup: k-means cells -> within-cell cosine -> CC survivors
    "dedup_semantic",
    # Newman modularity of the LPA communities (detector + quality)
    "graph_modularity",
    # duplicate-leakage audit: naive vs group-aware split policies
    "docs_split_leakage",
    # incremental ER: attach a new batch to existing entities
    "er_incremental_attach",
    # FS score-band reliability table (calibration check)
    "er_calibration",
    # SoftTFIDF hybrid similarity (Cohen et al. 2003)
    "er_soft_tfidf",
    # parallel-pivot correlation clustering (KwikCluster rounds)
    "er_pivot_clustering",
    # privacy-preserving linkage: CLK Bloom encodings + Dice
    "er_pprl_bloom",
    # progressive-ER recall-per-budget curve
    "er_progressive",
    # iterative truth discovery (integer-exact trust fixpoint)
    "er_truth_discovery",
    # group linkage: BM similarity over member matching
    "er_group_linkage",
    # production ER ops (round-4 fifth slot): pre-blocking column
    # profiling, active-learning label queue, Chapman missed-dup
    # estimate, cannot-link steward audit, per-host corpus health
    "er_profile",
    "er_uncertainty_queue",
    "er_capture_recapture",
    "er_constraints",
    "crawl_host_stats",
    # steward feedback loop (round-4 sixth slot): must-link constrained
    # clustering, cannot-link cluster repair, residual-dup Chapman over
    # the two real near-dup detectors, host-level curation filter
    "er_must_link",
    "er_cluster_repair",
    "docs_residual_dups",
    "docs_host_filter",
    # the flagship ops composite: queue -> labels -> constrained CC ->
    # repair -> before/after pairwise metrics, one row out
    "er_steward_loop",
    # wave 7: spatial grid-cell blocking (integer-exact verify),
    # Splink-style per-pair weight waterfall, Deequ-style declarative
    # quality gate, one collective-ER relational-evidence round
    "er_spatial_block",
    "er_explain",
    "docs_quality_checks",
    "er_relational_evidence",
    # wave 8: temporal-decay linkage, PSI drift monitor, frontier plan
    "er_temporal_linkage",
    "er_score_drift",
    "crawl_frontier_schedule",
    # wave 9: winnowing local fingerprints, per-source TF-IDF labels,
    # streaming drift-histogram maintenance (6-row state forever)
    "docs_winnowing",
    "docs_source_keywords",
    "er_stream_score_drift",
    # wave 10: declarative rule matcher + R-Swoosh merge-based ER
    "er_match_rules",
    "er_swoosh",
    # wave 11: robots-policy frontier audit + contrastive pair mining
    "crawl_robots_filter",
    "docs_contrastive_pairs",
    # wave 12: adaptive blocking-scheme selection (coverage per cost)
    "er_blocking_learn",
    # wave 13: GMD edit-count metric, collective type-coherence EL,
    # k-core backbone peel, per-block average-linkage HAC
    "er_gmd",
    "el_collective",
    "graph_kcore",
    "er_hac",
    # wave 14: Zipf-exponent skew diagnostic, HAC merge trace,
    # HAC-vs-CC method disagreement, PAV isotonic calibration
    "er_zipf_alpha",
    "er_hac_dendrogram",
    "er_hac_vs_cc",
    "er_isotonic_calibration",
    # wave 15: one-pass quality scorecard, topic-purity validation,
    # two-round collective inference
    "er_scorecard",
    "docs_topic_purity",
    "el_collective_iterative",
    # wave 16: degree-prioritized star clustering, host link-graph
    # authority (href extraction + host PageRank), BPE merge-table
    # learning, streaming watermark drop audit
    "er_star_clustering",
    "crawl_hostgraph",
    "docs_bpe_learn",
    "events_stream_late_audit",
    # wave 17: FD (g3) key-quality profile, instance-based schema
    # matching, HITS hubs/authorities
    "er_fd_profile",
    "er_schema_match",
    "crawl_hits",
    # wave 18: Adamic-Adar missed-match suggester, inbound anchor text
    "er_link_prediction",
    "crawl_anchor_text",
    # wave 19: BPE tokenizer application, median/MAD anomaly monitor
    "docs_bpe_apply",
    "events_anomaly",
    # wave 20: mirror-host detection, Gale-Shapley stable matching
    "crawl_mirrors",
    "er_stable_matching",
    # wave 21: TrustRank seed-biased spam demotion
    "crawl_trustrank",
    # wave 22: incremental new-batch near-dup probe, cohort retention
    "dedup_incremental",
    "events_retention",
    # wave 23: event-transition matrix, RAG-style overlapping chunks
    "events_transitions",
    "docs_chunk_overlap",
    # wave 24: edge-embeddedness bridge audit, streaming registry ER
    "er_edge_support",
    "er_stream_attach",
    # wave 25: shingle novelty, per-host templates, crawl rank delta
    "docs_novelty",
    "docs_host_boilerplate",
    "crawl_rank_delta",
    # wave 26: new-batch novelty pre-filter
    "docs_batch_novelty",
    # wave 27: per-doc TF-IDF keywords
    "docs_keywords",
    # wave 28 (round 5): content-defined chunking shared passages,
    # Flesch readability projection, CUSUM drift detection
    "docs_cdc_chunks",
    "docs_readability",
    "events_cusum",
    "media_mime_sniff",
    "docs_bpe_fertility",
    "docs_cdc_incremental",
    "docs_stream_cdc_index",
    "docs_cdc_dedup_ratio",
]

BENCH_PAGES = int(os.environ.get("BENCH_PAGES", "2500"))
# 'cosine' | 'mlp' — the scorer's embedding-similarity head; 'mlp' has
# the reference neural scorer's compute profile (disamb/model.py:35-84)
BENCH_HEAD = os.environ.get("BENCH_SCORER_HEAD", "cosine")
BENCH_ENTITIES = int(os.environ.get("BENCH_ENTITIES", "1200"))
# ~1500 extra tokens/page ≈ 10KB body: weights per-page extract/detect
# compute like real web pages instead of fixture snippets
BENCH_FILLER = int(os.environ.get("BENCH_FILLER", "0"))


def _noop_write(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def _box_probe() -> dict:
    """Fixed single-thread work units reported alongside the timings:
    this box is co-tenant (measured 2.7x across-session throughput
    swings, /proc/stat steal time in the millions of jiffies), so
    cross-round bench comparisons need probe ratios to separate code
    deltas from box state. Two probes because the box has two
    distinct contention modes: ``gemm_secs`` (cache-resident 512³
    GEMM) tracks CPU steal, ``copy_gbps`` (256MB streaming copy)
    tracks DRAM bandwidth — the binding resource for Spark's
    memory-streaming stages (quiet baseline ~12.6 GB/s single-thread,
    BENCH/BASELINE.md; observed as low as ~5.7 under co-tenant load
    while the GEMM stayed fast). ~0.5s total."""
    import numpy as np

    g = np.ones((512, 512), dtype=np.float32)
    gemm = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        (g @ g).sum()
        gemm = min(gemm, time.perf_counter() - t0)
    a = np.ones(32 * 2**20)  # 256 MB
    cp = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        b = a.copy()
        cp = min(cp, time.perf_counter() - t0)
        del b
    return {
        "gemm_secs": round(gemm, 4),
        "copy_gbps": round(2 * a.nbytes / cp / 1e9, 2),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }


def _salt_evidence(spark, timings: dict) -> None:
    """Times the blocking join salted vs unsalted on a synthetic
    Zipf-head skew stress (see the call site for methodology)."""
    from pyspark.sql import functions as F

    from type_filtered_entity_linker_spark.operators.blocking import (
        generate_candidates,
    )

    n_head_m, n_tail, fanout = 5000, 50000, 2000
    skew_mentions = (
        spark.range(n_head_m + n_tail)
        .select(
            F.concat(F.lit("u"), F.col("id")).alias("url"),
            F.lit(0).cast("int").alias("mention_id"),
            F.when(F.col("id") < n_head_m, F.lit("head key"))
            .otherwise(F.concat(F.lit("sf"), F.col("id")))
            .alias("sf_norm"),
            F.lit("OTHER").alias("ner_type"),
        )
        .localCheckpoint(eager=True)
    )
    skew_dict = (
        spark.range(fanout)
        .select(
            F.lit("head key").alias("alias_norm"),
            F.concat(F.lit("Q"), F.col("id")).alias("item_id"),
        )
        .union(
            spark.range(n_tail).select(
                F.concat(F.lit("sf"), F.col("id")),
                F.concat(F.lit("Qt"), F.col("id")),
            )
        )
        .localCheckpoint(eager=True)
    )
    bcast_confs = {
        "spark.sql.autoBroadcastJoinThreshold": None,
        "spark.sql.adaptive.autoBroadcastJoinThreshold": None,
    }
    for c in bcast_confs:
        bcast_confs[c] = spark.conf.get(c, None)
        spark.conf.set(c, "-1")
    for tname, bcfg in (
        ("blocking_join_unsalted", LinkerConfig(salt_threshold=1 << 30)),
        ("blocking_join_salted", LinkerConfig()),
    ):
        # warm once (plan + shuffle shape), then time
        _noop_write(generate_candidates(skew_mentions, skew_dict, bcfg))
        t0 = time.perf_counter()
        _noop_write(generate_candidates(skew_mentions, skew_dict, bcfg))
        timings[tname] = round(time.perf_counter() - t0, 3)
    for c, v in bcast_confs.items():
        if v is None:
            spark.conf.unset(c)
        else:
            spark.conf.set(c, v)


def main() -> None:
    probe_start = _box_probe()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = spark_session(
        app_name=f"bench-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    warm_touch: list[str] = []
    warm_touch_secs = 0.0
    if os.environ.get("BENCH_PIPELINE_ONLY") != "1":
        # session warm-up (codegen + python workers + shared el-chain
        # base checkpoints) so the first headline query isn't charged
        # the JVM cold start
        _noop_write(QUERIES["token_count"](spark, sf_dir))
        _noop_write(QUERIES["el_mentions"](spark, sf_dir))
        _noop_write(QUERIES["el_entities"](spark, sf_dir))
        # the binary-payload Arrow path (media columns) is the one
        # worker/page-cache path the queries above don't touch: cold it
        # costs ~6s, warm ~0.9s (same-session A/B, scripts/ab_r3.py) —
        # the r2 "media_features regression" was exactly this cold cost
        # landing on the timed run
        _noop_write(QUERIES["media_features"](spark, sf_dir))
        # warm steady-state policy (VERDICT r04 item 7): the recurring
        # 5-10x bench-slot outliers are all FIRST-TOUCH artifacts of
        # one lineage family (crawl synthetic-pages extraction,
        # minhash-CC keep-one) — warm 1.9/2.2/5.5 s vs slot 15.3/
        # 10.0/9.8 s in r4. One untimed touch of each family
        # representative before the timed loop, recorded in the
        # output JSON, so the per-round file reflects the steady state
        # a long-running cluster job actually sees rather than the
        # cold-start artifact (the cold cost is still visible: it is
        # exactly the warm-touch pass's wall time, reported too).
        warm_touch[:] = ["crawl_hostgraph", "dedup_cluster_keep"]
        t0 = time.perf_counter()
        for name in warm_touch:
            _noop_write(QUERIES[name](spark, sf_dir))
        warm_touch_secs = round(time.perf_counter() - t0, 3)
        for name in HEADLINE:
            t0 = time.perf_counter()
            _noop_write(QUERIES[name](spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        # the dedup_simhash QUERY runs the md5-rekeyed hash so DuckDB
        # can replicate it exactly; time the PRODUCTION default
        # (xxhash64) too, so cross-round comparisons see both paths
        from type_filtered_entity_linker_spark.operators.dedup import (
            near_duplicates_simhash,
        )
        from type_filtered_entity_linker_spark.plans.driver_queries import (
            _neardup_corpus,
        )

        t0 = time.perf_counter()
        _noop_write(
            near_duplicates_simhash(
                _neardup_corpus(spark, sf_dir), max_hamming=6
            )
        )
        timings["dedup_simhash_xxhash64"] = round(time.perf_counter() - t0, 3)

        # production-hash sketch paths (md5 variants above are the
        # oracle-gated queries; same A/B convention as simhash)
        from type_filtered_entity_linker_spark.operators.sketches import (
            cms_heavy_hitters,
            hll_distinct,
        )

        docs_df = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t0 = time.perf_counter()
        _noop_write(cms_heavy_hitters(docs_df, k=20, hash_fn="xxhash64"))
        timings["docs_cms_heavy_hitters_xxhash64"] = round(
            time.perf_counter() - t0, 3
        )
        from pyspark.sql import functions as _F

        toks = docs_df.select(
            "source", _F.explode(_F.split("text", r"\s+")).alias("token")
        )
        t0 = time.perf_counter()
        _noop_write(hll_distinct(toks, "source", "token", hash_fn="xxhash64"))
        timings["docs_hll_distinct_xxhash64"] = round(
            time.perf_counter() - t0, 3
        )

    # full domain pipeline on the seeded synthetic corpus. Inputs are
    # staged to parquet once (untimed) and read back as file scans:
    # driver-side pandas→Arrow conversion would otherwise run
    # single-threaded INSIDE the timed region and poison the
    # parallelism-scaling measurement; reading files is also the
    # production shape (column pruning + pushdown at the scan).
    from type_filtered_entity_linker_spark.fixtures import INPUT_TABLES

    import hashlib

    import type_filtered_entity_linker_spark.fixtures as _fx_mod

    # cache key includes the fixture-generator SOURCE: editing
    # make_fixtures invalidates staged corpora instead of silently
    # benching stale data
    with open(_fx_mod.__file__, "rb") as f:
        fx_src_hash = hashlib.md5(f.read()).hexdigest()[:10]
    stage_dir = (
        f"/tmp/bench_fixtures_{BENCH_PAGES}_{BENCH_ENTITIES}_{BENCH_FILLER}"
        f"_{fx_src_hash}"
    )
    marker = os.path.join(stage_dir, "_STAGED")
    if not os.path.exists(marker):
        shutil.rmtree(stage_dir, ignore_errors=True)
        fx = make_fixtures(
            seed=42, n_pages=BENCH_PAGES, n_entities=BENCH_ENTITIES,
            head_alias_fanout=900, page_filler_tokens=BENCH_FILLER,
        )
        for k in INPUT_TABLES:
            df = spark.createDataFrame(fx[k])
            if k == "pages":
                # many small files → the scan parallelizes like a real
                # multi-file table (one ~100MB file = one task)
                df = df.repartition(128)
            df.write.mode("overwrite").parquet(os.path.join(stage_dir, k))
        with open(marker, "w") as f:
            f.write("ok")
    inputs = {
        k: spark.read.parquet(os.path.join(stage_dir, k))
        for k in INPUT_TABLES
    }
    # warm-up pass on a 200-page slice: compiles every stage's codegen
    # and spins up the Arrow python workers, so the timed run measures
    # steady-state throughput (cold-start costs are paid once per JVM
    # on a real cluster too, amortized over far more data)
    # checkpoints to tmpfs: the VM's single ext4 disk writes ~40MB/s
    # regardless of cores (a serial wall a real cluster doesn't have —
    # stage checkpoints land in HDFS/S3/Iceberg whose aggregate write
    # bandwidth scales with the cluster)
    wd = os.environ.get("BENCH_WD_BASE", "/dev/shm") + f"/bench_wd_{cpus}"
    shutil.rmtree(wd + "_warm", ignore_errors=True)
    warm_inputs = dict(inputs, pages=inputs["pages"].limit(200))
    run_pipeline(spark, warm_inputs, wd + "_warm", LinkerConfig(scorer_head=BENCH_HEAD), resume=False)
    shutil.rmtree(wd, ignore_errors=True)
    t0 = time.perf_counter()
    res = run_pipeline(spark, inputs, wd, LinkerConfig(scorer_head=BENCH_HEAD), resume=False)
    timings["linkage_pipeline_e2e"] = round(time.perf_counter() - t0, 3)

    # salt evidence (VERDICT r02 #8). Two facts, both measured:
    # (a) on the FIXTURE (900-fanout head alias, ≤25k rows through the
    #     head key) salted and unsalted time identically at any
    #     parallelism — the ~9k-row dictionary broadcasts, so no
    #     shuffle exists to skew; skew at that volume is immaterial.
    # (b) the plan whose skew behavior matters at web scale is the
    #     SHUFFLE join (a 10⁸-alias dictionary exceeds any broadcast
    #     threshold), on a key big enough to dominate a task. So the
    #     timed evidence is a synthetic Zipf-head stress: one blocking
    #     key fanning out to 10M candidate rows (5k mentions × 2k
    #     dictionary entries) over a 50k uniform tail, broadcast
    #     disabled, AQE skew-join ON for both variants (it is on at
    #     scale too). Salting spreads the head key across n_salt
    #     buckets; measured ~30% faster than unsalted even with AQE's
    #     own skew splitting active.
    # (pipeline-only scaling runs skip this stress — it times the salt
    # mechanism, not the pipeline under study)
    if os.environ.get("BENCH_PIPELINE_ONLY") != "1":
        _salt_evidence(spark, timings)

    stage = {m["stage"]: m for m in res.metrics}
    pairs_scored = stage["scored"]["rows"]
    scoring_secs = stage["scored"]["secs"]
    pairs_per_sec = round(pairs_scored / max(scoring_secs, 1e-9), 1)

    # scorer microbench: pure scoring throughput on materialized inputs
    # (no checkpoint write / manifest overhead) — the BASELINE.json
    # pairs-scored/sec headline
    from type_filtered_entity_linker_spark.operators.scoring import (
        entity_dim,
        score_candidates,
    )

    from pyspark.sql import functions as F

    min_pairs = int(os.environ.get("SCORER_MIN_PAIRS", "2000000"))
    base_pairs = res.candidates.count()
    repl = max(1, -(-min_pairs // max(base_pairs, 1)))  # ceil
    cand = (
        res.candidates.withColumn(
            "_r", F.explode(F.array(*[F.lit(i) for i in range(repl)]))
        )
        .drop("_r")
        .repartition(cpus * 3)
        .persist()
    )
    ment = res.mentions.persist()
    n_pairs = cand.count()
    ment.count()
    dim = entity_dim(inputs["entities"], inputs["entity_embeddings"])
    # warm-up: JVM codegen + Arrow/python-worker spin-up on a small
    # slice, so the timed run measures steady-state throughput.
    # sims_rows_hint: like the pipeline, the caller's lineage already
    # bounds the distinct pair count (replication doesn't add distinct
    # pairs) — no measuring job inside the timed region
    _noop_write(
        score_candidates(
            cand.limit(5000), ment, dim, head=BENCH_HEAD,
            sims_rows_hint=base_pairs,
        )
    )
    t0 = time.perf_counter()
    _noop_write(
        score_candidates(
            cand, ment, dim, head=BENCH_HEAD, sims_rows_hint=base_pairs
        )
    )
    scorer_secs = time.perf_counter() - t0
    scorer_pps = round(n_pairs / max(scorer_secs, 1e-9), 1)
    cand.unpersist()
    ment.unpersist()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "e2e_bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "pairs_scored": pairs_scored,
        "pairs_scored_per_sec": pairs_per_sec,
        "scorer_pairs": n_pairs,
        "scorer_secs": round(scorer_secs, 3),
        "scorer_pairs_per_sec": scorer_pps,
        "pipeline_stage_secs": {m["stage"]: m["secs"] for m in res.metrics},
        "bench_pages": BENCH_PAGES,
        "scorer_head": BENCH_HEAD,
        # co-tenant context (see _box_probe): compare probe ratios,
        # not raw seconds, across rounds on this shared box
        # warm steady-state policy (VERDICT r04 item 7): these
        # queries' shared lineage got one untimed touch costing
        # warm_touch_secs before the timed loop
        "warm_touch": warm_touch,
        "warm_touch_secs": warm_touch_secs,
        "box_probe_start": probe_start,
        "box_probe_end": _box_probe(),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
