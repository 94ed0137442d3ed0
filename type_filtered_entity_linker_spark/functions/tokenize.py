"""Batch-vectorized candidate-window extraction — the numpy twin of
``textlib.candidate_windows`` for the detection UDTF's hot path.

``textlib``'s pure-Python tokenizer costs ~560 ns/token (regex
finditer + tuple building); on 10 KB pages that regex IS the mentions
stage at low parallelism. This kernel finds token boundaries and
capitalized runs for a WHOLE Arrow batch in numpy (boundary masks over
the concatenated codepoint array) and materializes Python strings only
for tokens near capitalized runs — on filler-heavy web text ~95% of
tokens never become Python objects.

Parity contract: output is tuple-identical to
``textlib.candidate_windows`` per text (hypothesis property test,
including exotic unicode whitespace). The whitespace set is derived
from ``re`` itself, so the \\S tokenization can never drift from the
reference module.
"""

from __future__ import annotations

import re

import numpy as np

from ..textlib import MAX_WINDOW, normalize_sf

_WS_RE = re.compile(r"\s")


def _ws_codes() -> np.ndarray:
    """Every codepoint Python's re treats as \\s (the exact complement
    of \\S tokenization) — computed once from re itself."""
    return np.array(
        [c for c in range(0x3001) if _WS_RE.match(chr(c))]
        + [c for c in (0xFEFF,) if _WS_RE.match(chr(c))],
        dtype=np.uint32,
    )


_WS_CODES = _ws_codes()


def candidate_windows_batch(
    texts: "list[str]", ctx_window: int = 3
) -> "list[list[tuple]]":
    """Per text: [(run_id, i, j, start, end, sf, sf_norm, ctx)] —
    tuple-identical to ``textlib.candidate_windows(text, ctx_window)``."""
    n = len(texts)
    if n == 0:
        return []
    joined = "\n".join(texts)
    if not joined:
        return [[] for _ in range(n)]
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    text_offs = np.zeros(n, dtype=np.int64)
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=text_offs[1:])  # +1 for the separator

    ws = np.isin(codes, _WS_CODES)
    not_ws = ~ws
    starts_mask = not_ws.copy()
    starts_mask[1:] &= ws[:-1]
    ends_mask = not_ws.copy()
    ends_mask[:-1] &= ws[1:]
    tok_start = np.nonzero(starts_mask)[0]
    tok_end = np.nonzero(ends_mask)[0] + 1
    T = len(tok_start)
    out: list[list[tuple]] = [[] for _ in range(n)]
    if T == 0:
        return out
    tok_text = np.searchsorted(text_offs, tok_start, side="right") - 1

    first_c = codes[tok_start]
    cap = ((first_c >= 65) & (first_c <= 90)) | (
        (first_c >= 48) & (first_c <= 57)
    )

    # capitalized runs: a run starts at a capitalized token whose
    # predecessor is non-capitalized or belongs to another text
    prev_cap = np.concatenate(([False], cap[:-1]))
    prev_same = np.concatenate(([False], tok_text[1:] == tok_text[:-1]))
    run_start = cap & ~(prev_cap & prev_same)
    if not cap.any():
        return out
    # per-token run head index (global token idx of the run's first tok)
    run_head = np.where(run_start, np.arange(T), 0)
    np.maximum.accumulate(run_head, out=run_head)
    # per-text run_id: rank of the run among the text's runs
    run_seq = np.cumsum(run_start)  # 1-based global run number
    head_positions = np.nonzero(run_start)[0]
    head_text = tok_text[head_positions]
    # runs before text t = count of run heads in earlier texts
    runs_before_text = np.searchsorted(head_text, np.arange(n), side="left")

    cap_idx = np.nonzero(cap)[0]  # member tokens, global order
    # position within run and run length
    pos_in_run = cap_idx - run_head[cap_idx]
    # run length per member: members of a run are contiguous in cap_idx
    heads = run_head[cap_idx]
    # count members per head
    uniq_heads, inv, counts = np.unique(
        heads, return_inverse=True, return_counts=True
    )
    run_len = counts[inv]

    # windows per member: j = i+1 .. min(L, i+MAX_WINDOW)
    w_cnt = np.minimum(run_len - pos_in_run, MAX_WINDOW)
    W = int(w_cnt.sum())
    if W == 0:
        return out
    mem_rep = np.repeat(np.arange(len(cap_idx)), w_cnt)
    within = np.arange(W) - np.repeat(
        np.concatenate(([0], np.cumsum(w_cnt)[:-1])), w_cnt
    )
    w_i = pos_in_run[mem_rep]
    w_j = w_i + within + 1
    w_head = heads[mem_rep]  # global token idx of run head
    w_tid = tok_text[w_head]
    w_rid = (run_seq[w_head] - 1) - runs_before_text[w_tid]
    g_a = w_head + w_i  # first token (global idx) of the window
    g_b = w_head + w_j - 1  # last token
    w_start = tok_start[g_a]
    w_end = tok_end[g_b]

    # token-string memo: only tokens inside/near runs materialize
    tok_str: dict[int, str] = {}

    def tok(k: int) -> str:
        s = tok_str.get(k)
        if s is None:
            s = joined[tok_start[k] : tok_end[k]]
            tok_str[k] = s
        return s

    # per-text first/last token (for ctx bounds)
    text_first_tok = np.searchsorted(tok_text, np.arange(n), side="left")
    text_last_tok = np.searchsorted(tok_text, np.arange(n), side="right")

    offs = text_offs
    for w in range(W):
        tid = int(w_tid[w])
        ga, gb1 = int(g_a[w]), int(g_b[w]) + 1
        lo = max(int(text_first_tok[tid]), ga - ctx_window)
        hi = min(int(text_last_tok[tid]), gb1 + ctx_window)
        ctx = normalize_sf(
            " ".join(
                [tok(k) for k in range(lo, ga)]
                + [tok(k) for k in range(gb1, hi)]
            )
        )
        s = int(w_start[w]) - int(offs[tid])
        e = int(w_end[w]) - int(offs[tid])
        sf = joined[int(w_start[w]) : int(w_end[w])]
        out[tid].append(
            (int(w_rid[w]), int(w_i[w]), int(w_j[w]), s, e, sf,
             normalize_sf(sf), ctx)
        )
    return out
