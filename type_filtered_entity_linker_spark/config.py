"""Pipeline configuration — the "logical plan" knobs.

Mirrors the reference's ELConfig (reference ``config.py:53-84``):
``filter_mode`` toggles the type-filter stage
(el/entity_linker.py:27-28), ``candidates_limit`` the top-K stage
(el/entity_linker.py:30-31, default 500 per run.py:37), and the two
filter flags reproduce ``filter_default_type`` /
``filter_entities_without_type`` (config.py:65-76).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LinkerConfig:
    lang: str = "en"
    # 'rule' (NER→type map, reference spaCy path) | 'model' (TypeRec
    # classifier over mention embeddings, reference BERT path) | 'none'
    filter_mode: str = "rule"
    other_passes_all: bool = True  # OTHER mention type passes all (el/filter.py:43-47)
    keep_typeless: bool = True  # typeless candidate kept (el/filter.py:57-66)
    candidates_limit: int | None = 500  # top-K (el/entity_linker.py:94-108)
    context_window: int = 3  # tokens each side feeding the mention embedding
    nil_tau: float = 0.80  # NIL-mention dedup-edge cosine threshold
    # sorted-neighborhood width inside a NIL block: only mentions within
    # this many ranks (ordered by mention key) are compared — bounds a
    # pathological block at O(n·w) pairs instead of O(n²); blocks of
    # ≤ w+1 mentions are compared all-pairs exactly
    nil_neighborhood: int = 16
    # two-level NIL rank: a block's order is (md5(mk) % nil_rank_buckets,
    # mk), so its row_number sort runs as nil_rank_buckets parallel
    # sub-sorts — no single task ever sorts a viral block (verdict r03)
    nil_rank_buckets: int = 64
    n_salt: int = 8  # salt buckets for head blocking keys
    salt_threshold: int = 100  # keys with more candidates than this get salted
    # 'cosine' (embedding cosine) | 'mlp' (neural comparator head with
    # the reference scorer's dense-layer compute profile,
    # disamb/model.py:35-84; see functions.strings.mlp_similarity_batch)
    scorer_head: str = "cosine"
    # mention detector strategy: 'join' (candidate-window UDTF →
    # gazetteer LEFT SEMI join → resolve pass; the web-scale default —
    # the gazetteer never touches the driver) | 'collected' (driver-
    # collect + broadcast the alias set into ONE detection pass; no
    # window shuffle, fastest when the dictionary comfortably fits the
    # driver, unusable at 10⁷⁺ aliases)
    detector: str = "join"
    # join-detector Bloom pre-probe: bits per gazetteer alias (0 = off).
    # 10 bits + 6 hashes ≈ 0.8% false-positive rate; the filter is
    # built distributed (bitmap OR-fold, never raw strings on the
    # driver) and false positives are removed by the exact semi-join,
    # so results are identical at any setting — this knob only trades
    # broadcast size against wasted ctx-builds/shuffle for misses.
    bloom_bits_per_key: int = 10
    bloom_hashes: int = 6
    # skip the Bloom build entirely below this approx-distinct alias
    # count: for a degenerate dictionary the build's two plan-time
    # jobs cost more than the window ctx-builds the probe saves (the
    # size-gate analog of scorer_broadcast_max_rows; at ~9k aliases
    # the probe already wins 3x on emitted windows — BENCH/AB_R3.md —
    # so the cutoff sits well below that)
    bloom_min_aliases: int = 1024
    # broadcast the distinct string-sims table only below this row
    # count; above it the scorer falls back to a shuffle join (AQE
    # re-plans at runtime) — see operators.scoring.score_candidates
    scorer_broadcast_max_rows: int = 5_000_000
