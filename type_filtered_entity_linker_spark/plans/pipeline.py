"""End-to-end linkage pipeline orchestration (the reference's
``EntityLinker.process`` A2KB flow, ``el/entity_linker.py:23-33``:
detect → generate → filter → limit → disambiguate, plus the explicit
clustering stage the north rule adds).

Each stage checkpoints through ``sources.tableio`` with a fingerprint
chained from (stage name, config, upstream fingerprints) — a re-run
with unchanged inputs skips straight to the first dirty stage
(resumability gate, SURVEY.md §5.2 item 5). Per-stage row counts land
in a metrics table (the Spark form of the reference's
'Filtered to X/Y' logging, el/filter.py:94-98).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..config import LinkerConfig
from ..functions.ids import with_entity_urls
from ..operators.blocking import generate_candidates
from ..operators.clustering import cluster_mentions
from ..operators.mentions import (
    detect_mentions_df,
    ner_spans_df,
    prepare_premarked_mentions,
    with_extracted_text,
)
from ..operators.nil import nil_edges, nil_mentions
from ..operators.scoring import entity_dim, score_candidates
from ..operators.topk import argmax_links, cap_candidates
from ..operators.type_filter import entity_type_summary, filter_candidates
from ..sources.tableio import fingerprint, read_or_compute


def link_mentions_batch(
    mentions: DataFrame,
    inputs: dict[str, DataFrame],
    cfg: LinkerConfig = LinkerConfig(),
    spans: DataFrame | None = None,
) -> DataFrame:
    """Post-detection linkage chain (block → type-filter → top-K →
    score → argmax) over an already-materialized mentions table — the
    shared tail of the A2KB, D2KB and per-request (GERBIL) paths.

    The capped candidate table is persisted and counted once: the
    scorer's broadcast gate needs a distinct-pair bound, and without a
    hint it would re-execute the whole uncached upstream chain (detect,
    block, filter) a second time just to measure it. The cached blocks
    are released by Spark's ContextCleaner when the batch's DataFrames
    go unreferenced."""
    cand_u = generate_candidates(mentions, inputs["entity_aliases"], cfg)
    summary = entity_type_summary(inputs["entity_types"], inputs["type_closure"])
    cand_f = filter_candidates(
        cand_u, summary, cfg, mentions=mentions, spans=spans
    )
    cand_k = cap_candidates(cand_f, cfg).persist()
    cand_rows = cand_k.count()  # one materialization, reused below
    dim = entity_dim(inputs["entities"], inputs["entity_embeddings"])
    scored = score_candidates(
        cand_k,
        mentions,
        dim,
        head=cfg.scorer_head,
        sims_rows_hint=cand_rows,
        broadcast_max_rows=cfg.scorer_broadcast_max_rows,
    )
    return with_entity_urls(argmax_links(scored))


def link_pages_batch(
    pages: DataFrame,
    inputs: dict[str, DataFrame],
    cfg: LinkerConfig = LinkerConfig(),
    premarked: DataFrame | None = None,
) -> DataFrame:
    """The linkage chain (extract → detect → block → type-filter →
    top-K → score → argmax) over a pages batch — no checkpointing. Used
    per-micro-batch by ``streaming.incremental.incremental_link_pages``
    and per-request by ``sources.gerbil``; every stage is per-mention,
    so linking pages in arbitrary batch splits yields exactly the
    full-corpus links. ``premarked`` (url, start, end) switches
    detection to the D2KB span path, mirroring ``run_pipeline``."""
    pages_text = with_extracted_text(pages, cfg)
    mentions = (
        prepare_premarked_mentions(pages_text, premarked, cfg)
        if premarked is not None
        else detect_mentions_df(pages_text, inputs["gazetteer"], cfg)
    )
    spans = ner_spans_df(pages_text) if cfg.filter_mode == "span" else None
    return link_mentions_batch(mentions, inputs, cfg, spans=spans)


@dataclass
class PipelineResult:
    mentions: DataFrame
    candidates_unfiltered: DataFrame
    candidates: DataFrame
    links: DataFrame
    clusters: DataFrame
    metrics: list[dict]


def run_pipeline(
    spark: SparkSession,
    inputs: dict[str, DataFrame],
    workdir: str,
    cfg: LinkerConfig = LinkerConfig(),
    resume: bool = True,
    input_version: str = "v1",
    premarked: DataFrame | None = None,
) -> PipelineResult:
    """inputs: pages, gazetteer, entity_aliases, entity_types,
    type_closure, entity_embeddings, entities.

    ``premarked`` switches A2KB → D2KB (reference
    el/entity_linker.py:36-64): mentions come from the given (url,
    start, end) spans instead of detection; everything downstream is
    identical."""
    os.makedirs(workdir, exist_ok=True)
    metrics: list[dict] = []
    base_fp = fingerprint(repr(cfg), input_version)

    def stage(name: str, upstream_fp: str, compute) -> tuple[DataFrame, str]:
        fp = fingerprint(name, base_fp, upstream_fp)
        t0 = time.perf_counter()
        df, manifest, cached = read_or_compute(
            spark, os.path.join(workdir, name), fp, compute, force=not resume
        )
        metrics.append(
            {
                "stage": name,
                "rows": manifest["rows"],
                "partitions": len(manifest["partitions"]),
                "cached": cached,
                "fingerprint": fp,
                "secs": round(time.perf_counter() - t0, 3),
            }
        )
        return df, fp

    pages_text, fp1 = stage(
        "pages_text", "", lambda: with_extracted_text(inputs["pages"], cfg)
    )
    if premarked is not None:
        mentions, fp2 = stage(
            "mentions",
            fingerprint(fp1, "d2kb"),
            lambda: prepare_premarked_mentions(pages_text, premarked, cfg),
        )
    else:
        mentions, fp2 = stage(
            "mentions",
            fp1,
            lambda: detect_mentions_df(pages_text, inputs["gazetteer"], cfg),
        )
    cand_u, fp3 = stage(
        "candidates_unfiltered",
        fp2,
        lambda: generate_candidates(mentions, inputs["entity_aliases"], cfg),
    )
    summary = entity_type_summary(inputs["entity_types"], inputs["type_closure"])
    spans = ner_spans_df(pages_text) if cfg.filter_mode == "span" else None
    cand_f, fp4 = stage(
        "candidates_filtered",
        fp3,
        lambda: filter_candidates(
            cand_u, summary, cfg, mentions=mentions, spans=spans
        ),
    )
    cand_k, fp5 = stage(
        "candidates_topk", fp4, lambda: cap_candidates(cand_f, cfg)
    )
    # stage manifest rows = free upper bound on the distinct
    # (sf_norm, item_id) table — drives the scorer's broadcast gate
    # without an extra counting job
    cand_k_rows = metrics[-1]["rows"]
    dim = entity_dim(inputs["entities"], inputs["entity_embeddings"])
    scored, fp6 = stage(
        "scored",
        fp5,
        lambda: score_candidates(
            cand_k,
            mentions,
            dim,
            head=cfg.scorer_head,
            sims_rows_hint=cand_k_rows,
            broadcast_max_rows=cfg.scorer_broadcast_max_rows,
        ),
    )
    links, fp7 = stage(
        "links",
        fp6,
        # item_url projection on the final links (reference O25,
        # el/entity_disambiguator.py:62)
        lambda: with_entity_urls(argmax_links(scored)),
    )

    cc_stats: list[dict] = []

    def compute_clusters() -> DataFrame:
        nils = nil_mentions(mentions, cand_k)
        ne = nil_edges(nils, cfg)
        return cluster_mentions(links, ne, mentions, cc_stats=cc_stats)

    clusters, fp8 = stage("clusters", fp7, compute_clusters)
    if cc_stats:
        # stats are recorded per checksum (every check_every rounds);
        # the last entry's iteration is the true round count
        metrics[-1]["cc_iterations"] = cc_stats[-1]["iteration"]
        metrics[-1]["cc_convergence"] = cc_stats

    return PipelineResult(
        mentions=mentions,
        candidates_unfiltered=cand_u,
        candidates=cand_k,
        links=links,
        clusters=clusters,
        metrics=metrics,
    )
