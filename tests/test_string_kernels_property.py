"""Property-based tests (hypothesis): the batch-vectorized string
kernels agree with straightforward per-pair reference implementations
on arbitrary inputs. No Spark session needed — these pin down the
numpy kernels the UDFs and the oracle share."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from type_filtered_entity_linker_spark.functions.strings import (
    jaro_winkler_batch,
    levenshtein_batch,
)

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    max_size=24,
)


def ref_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(cur[j - 1] + 1, prev[j] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


def ref_jaro(a: str, b: str) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    window = max(max(len(a), len(b)) // 2 - 1, 0)
    ma = [False] * len(a)
    mb = [False] * len(b)
    m = 0
    for i, ca in enumerate(a):
        lo, hi = max(0, i - window), min(len(b), i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and b[j] == ca:
                ma[i] = mb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len(a)):
        if ma[i]:
            while not mb[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (m / len(a) + m / len(b) + (m - t) / m) / 3


def ref_jaro_winkler(a: str, b: str, p: float = 0.1, max_l: int = 4) -> float:
    j = ref_jaro(a, b)
    l = 0
    for ca, cb in zip(a[:max_l], b[:max_l]):
        if ca != cb:
            break
        l += 1
    return j + l * p * (1 - j)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=8))
def test_levenshtein_matches_reference(pairs):
    a = [x for x, _ in pairs]
    b = [y for _, y in pairs]
    got = levenshtein_batch(a, b)
    want = np.array([ref_levenshtein(x, y) for x, y in pairs])
    assert (got == want).all()


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=8))
def test_jaro_winkler_matches_reference(pairs):
    a = [x for x, _ in pairs]
    b = [y for _, y in pairs]
    got = jaro_winkler_batch(a, b)
    want = np.array([ref_jaro_winkler(x, y) for x, y in pairs])
    assert np.abs(got - want).max() < 1e-12


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_similarity_identities(s):
    assert levenshtein_batch([s], [s])[0] == 0
    assert abs(jaro_winkler_batch([s], [s])[0] - (1.0 if s else 1.0)) < 1e-12
    # symmetry
    t = s[::-1]
    assert levenshtein_batch([s], [t])[0] == levenshtein_batch([t], [s])[0]


# --- batch text embedding parity -------------------------------------------

# excludes surrogates (category Cs): not encodable in UTF-8 — the
# scalar reference raises on them too, and Arrow columns never carry them
WIDE_TEXT = st.text(
    alphabet=st.characters(
        min_codepoint=1, max_codepoint=0x10FFF, exclude_categories=("Cs",)
    ),
    max_size=48,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(WIDE_TEXT, max_size=12))
def test_embed_texts_matches_scalar_reference(strs):
    """The vectorized batch FNV/char-3-gram kernel is bit-identical to
    the scalar reference per row, across the full unicode range
    (1-4 byte UTF-8 chars exercise every fast/slow path)."""
    from type_filtered_entity_linker_spark.functions.strings import (
        _embed_text_scalar,
        embed_texts,
    )

    mat = embed_texts(strs)
    assert mat.shape == (len(strs), 192)
    for i, s in enumerate(strs):
        assert mat[i].tobytes() == _embed_text_scalar(s).tobytes()


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                min_codepoint=1, max_codepoint=0x3100, exclude_categories=("Cs",)
            ),
            max_size=60,
        ),
        max_size=8,
    )
)
def test_candidate_windows_batch_matches_textlib(texts):
    """The vectorized tokenizer/window extractor is tuple-identical to
    the pure-Python reference per text — the detection-parity invariant
    (covers unicode whitespace up to U+3000, run/window edges)."""
    from type_filtered_entity_linker_spark.functions.tokenize import (
        candidate_windows_batch,
    )
    from type_filtered_entity_linker_spark.textlib import candidate_windows

    got = candidate_windows_batch(texts)
    assert len(got) == len(texts)
    for t, g in zip(texts, got):
        assert g == candidate_windows(t)


# --- extract_text: the UDF's literal-split path == the oracle regex ---

import re

_MAIN_RE = re.compile(r"<main><p>(.*?)</p></main>", re.DOTALL)

# text freely containing marker FRAGMENTS so openers/closers appear in
# arbitrary broken/nested/multiple configurations
MARKY = st.lists(
    st.sampled_from(
        ["<main><p>", "</p></main>", "<p>", "</p>", "x", "\n", "&amp;", " a "]
    ),
    max_size=12,
).map("".join)


@given(MARKY)
@settings(max_examples=300)
def test_split_extraction_equals_lazy_regex(raw):
    import pandas as pd

    m = _MAIN_RE.search(raw)
    want = m.group(1) if m else ""
    s = pd.Series([raw])
    tail = s.str.split("<main><p>", n=1, regex=False).str[1].fillna("")
    parts = tail.str.split("</p></main>", n=1, regex=False)
    got = parts.str[0].where(parts.str.len() > 1, "").fillna("").iloc[0]
    assert got == want
