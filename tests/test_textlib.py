"""Pure-Python core: byte identity, normalization, detection, kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from type_filtered_entity_linker_spark.functions.strings import (
    embed_text,
    jaro_winkler_batch,
    levenshtein_batch,
)
from type_filtered_entity_linker_spark.textlib import (
    context_window,
    detect_mentions,
    extract_text,
    make_html,
    normalize_sf,
)


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_byte_identity_roundtrip(t):
    """North-rule invariant: extract_text(make_html(t)) == t byte-for-byte."""
    assert extract_text(make_html(t)) == t


def test_extract_text_no_main():
    assert extract_text(b"<html><body>nope</body></html>") == ""


def test_normalize_sf():
    assert normalize_sf("  Acme,  Corp. ") == "acme corp"
    assert normalize_sf("Ángel-X") == "ángelx"
    assert normalize_sf("") == ""


def test_detect_mentions_greedy_longest():
    gaz = {"acme corp", "acme", "beta"}
    ms = detect_mentions("we met Acme Corp and Beta today", gaz)
    assert [(m[3]) for m in ms] == ["acme corp", "beta"]
    # offsets slice back to the surface form
    text = "we met Acme Corp and Beta today"
    for s, e, sf, *_ in ms:
        assert text[s:e] == sf


def test_detect_mentions_lowercase_not_detected():
    assert detect_mentions("plain acme corp here", {"acme corp"}) == []


def test_context_window_excludes_mention():
    text = "aa bb cc Dd ee ff gg"
    s, e = text.index("Dd"), text.index("Dd") + 2
    assert context_window(text, s, e, window=2) == "bb cc ee ff"


def test_jaro_winkler_known_values():
    got = jaro_winkler_batch(["MARTHA", "DIXON"], ["MARHTA", "DICKSONX"])
    assert abs(got[0] - 0.961111) < 1e-5
    assert abs(got[1] - 0.813333) < 1e-5


@given(st.text(max_size=20), st.text(max_size=20))
@settings(max_examples=100, deadline=None)
def test_levenshtein_properties(a, b):
    d = int(levenshtein_batch([a], [b])[0])
    assert d == int(levenshtein_batch([b], [a])[0])  # symmetric
    assert (d == 0) == (a == b)
    assert d <= max(len(a), len(b))


def test_embed_deterministic_unit_norm():
    v1, v2 = embed_text("acme corp"), embed_text("acme corp")
    assert np.array_equal(v1, v2)
    assert abs(float(np.linalg.norm(v1)) - 1.0) < 1e-6
