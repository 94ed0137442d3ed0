"""Distributed Bloom filter over a DataFrame column.

Purpose: pre-filter candidate windows inside the detection UDTF
(operators.mentions) so that only PROBABLE gazetteer hits pay the
per-window context-string build and the window shuffle — while the
dictionary itself never touches the driver as raw strings. The build
is a distributed bitmap OR-fold: each Arrow batch emits only the
64-bit words its aliases actually set (grouped or-of-bits per word
index — task memory O(aliases-per-batch), never a full bitmap); a
``groupBy(word_index).agg(bit_or)`` folds batches and partitions, and
ONLY the driver materializes m/64 words (10 bits/key → ~1.25
bytes/alias: 10⁸ aliases = a 125 MB broadcast, three orders of
magnitude below the raw strings).

Exactness is preserved downstream: the Bloom filter has NO false
negatives by construction, and the existing gazetteer LEFT SEMI join
removes the ~1% false positives — the filter only changes how much
work reaches that join (reference parity therefore unaffected; the
oracle pairing for el_mentions stays exact).

The hash pair is an internal contract (build side and probe side are
both this module — nothing external must reproduce it): two FNV-1a
folds over the string's codepoints with distinct offset bases, an
avalanche finalizer, and Kirsch–Mitzenmacher double hashing
h_i = h1 + i·h2 for the k probe positions.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OFF1 = np.uint64(0xCBF29CE484222325)  # FNV-1a 64 offset basis
_OFF2 = np.uint64(0x84222325CBF29CE4)  # second stream: rotated basis
_PRIME = np.uint64(0x100000001B3)
# strings longer than this hash their first _CAP codepoints + length
# (identical on build and probe sides, so still no false negatives)
_CAP = 64


def _finalize(h: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche — FNV's low bits alone are too
    regular to drive power-of-two bit positions."""
    h = h.copy()
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def _hash2_batch(strs: "list[str]") -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per string, fully vectorized: one
    FNV step per char slot over the WHOLE batch (strings are blocking
    keys / aliases, so max length is small and capped at _CAP)."""
    n = len(strs)
    if n == 0:
        z = np.zeros(0, dtype=np.uint64)
        return z, z
    capped = [s[:_CAP] for s in strs]
    joined = "".join(capped)
    lens = np.array([len(s) for s in capped], dtype=np.int64)
    full_lens = np.array([len(s) for s in strs], dtype=np.uint64)
    h1 = np.full(n, _OFF1, dtype=np.uint64)
    h2 = np.full(n, _OFF2, dtype=np.uint64)
    if joined:
        codes = np.frombuffer(
            joined.encode("utf-32-le"), dtype=np.uint32
        ).astype(np.uint64)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        C = len(codes)
        for slot in range(int(lens.max())):
            cidx = np.minimum(starts + slot, C - 1)
            act = slot < lens
            x = codes[cidx]
            h1 = np.where(act, (h1 ^ x) * _PRIME, h1)
            h2 = np.where(act, (h2 ^ (x + np.uint64(1))) * _PRIME, h2)
    # mix the TRUE length so capped strings of equal prefix differ
    h1 = _finalize(h1 ^ (full_lens * _PRIME))
    h2 = _finalize(h2 + full_lens)
    # h2 must be odd so double-hash probes cycle the full ring
    return h1, h2 | np.uint64(1)


def bloom_positions(strs: "list[str]", m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing."""
    h1, h2 = _hash2_batch(strs)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits))


def bloom_probe(
    strs: "list[str]", words: np.ndarray, m_bits: int, k: int
) -> np.ndarray:
    """Membership mask (no false negatives)."""
    if not len(strs):
        return np.zeros(0, dtype=bool)
    pos = bloom_positions(strs, m_bits, k)
    w = words[(pos >> np.uint64(6)).astype(np.int64)]
    return (((w >> (pos & np.uint64(63))) & np.uint64(1)) == 1).all(axis=1)


def build_bloom(
    df: DataFrame,
    col: str,
    bits_per_key: int = 10,
    k: int = 6,
    min_keys: int = 0,
) -> "tuple[np.ndarray, int, int] | None":
    """Distributed build → (words uint64[m/64], m_bits, k), or None
    when the dictionary has fewer than ``min_keys`` distinct values
    (a tiny dictionary broadcasts through the exact semi-join anyway,
    and the build's full scan would cost more than the windows the
    filter saves — callers treat None as "probe disabled").

    Sizing uses ``approx_count_distinct`` (map-side partial agg, no
    shuffle of the strings); duplicate keys are harmless (bit-setting
    is idempotent) so the scan itself needs no distinct either. Task
    memory is O(aliases-per-batch × k), NOT O(m_bits): each Arrow
    batch emits its own sorted (word_index, or-of-bits) groups — never
    a full bitmap per task, which at 10⁸ aliases would be ~134 MB ×
    concurrent tasks (code-review r03) — and the ``bit_or`` groupBy
    folds batches/partitions; the driver alone materializes the m/64
    words."""
    n = df.agg(F.approx_count_distinct(col).alias("n")).collect()[0].n
    if n < min_keys:
        return None
    m_bits = 1 << max(10, int(np.ceil(np.log2(max(n, 1) * bits_per_key))))
    n_words = m_bits // 64

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = pdf[col].dropna().tolist()
            if not vals:
                continue
            pos = bloom_positions(vals, m_bits, k).ravel()
            widx = (pos >> np.uint64(6)).astype(np.int64)
            bits = np.uint64(1) << (pos & np.uint64(63))
            order = np.argsort(widx, kind="stable")
            widx, bits = widx[order], bits[order]
            uniq, first = np.unique(widx, return_index=True)
            yield pd.DataFrame(
                {
                    "idx": uniq,
                    "w": np.bitwise_or.reduceat(bits, first).view(np.int64),
                }
            )

    rows = (
        df.select(col)
        .mapInPandas(part, "idx long, w long")
        .groupBy("idx")
        .agg(F.bit_or("w").alias("w"))
        .collect()
    )
    words = np.zeros(n_words, dtype=np.int64)
    for r in rows:
        words[r.idx] = r.w
    return words.view(np.uint64), m_bits, k
