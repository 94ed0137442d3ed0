"""Intra-corpus repeated-substring detection at k-token-window
granularity (operators/dedup.py repeated_spans — the distributed shape
of Lee et al. 2022's ExactSubstr dedup), checked against hand cases and
a pure-Python reference under hypothesis, across all three window-hash
families (raw string / md5_60 / xxhash64)."""

import re
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from type_filtered_entity_linker_spark.operators.dedup import (
    repeated_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ref_spans(rows, k, min_occ):
    """Pure-Python reference: count every k-token window corpus-wide,
    mark windows with >= min_occ total occurrences, merge overlapping
    or exactly-adjacent marked windows per doc into maximal spans."""
    cnt = Counter()
    per = defaultdict(list)
    for d, txt in rows:
        ts = [t for t in re.split(r"\s+", txt) if t]
        for p in range(len(ts) - k + 1):
            w = " ".join(ts[p : p + k])
            cnt[w] += 1
            per[d].append((p, w))
    out = set()
    for d, lst in per.items():
        hits = sorted(p for p, w in lst if cnt[w] >= min_occ)
        spans = []
        for p in hits:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + k)
                spans[-1][2] += 1
            else:
                spans.append([p, p + k, 1])
        for s, e, n in spans:
            out.add((d, s, e, e - s, n))
    return out


def _collect(df):
    return {
        (
            r["doc_id"],
            r["span_start"],
            r["span_end"],
            r["span_tokens"],
            r["n_windows"],
        )
        for r in df.collect()
    }


def test_cross_doc_shared_run_found_in_both_docs(spark):
    # a 6-token run shared by two otherwise-disjoint docs, k=4:
    # windows at pos 1,2,3 in doc 1 and pos 0,1,2 in doc 2 merge into
    # one 6-token span per doc — while whole-doc similarity is low.
    corpus = _docs(
        spark,
        [
            (1, "alpha q w e r t y beta gamma delta"),
            (2, "q w e r t y zeta eta theta iota kappa"),
            (3, "one two three four five six seven eight"),
        ],
    )
    got = _collect(repeated_spans(corpus, k=4, min_occurrences=2))
    assert got == {(1, 1, 7, 6, 3), (2, 0, 6, 6, 3)}


def test_gap_between_repeats_yields_two_spans(spark):
    # doc 1 repeats doc 2's run at its head AND tail with a unique
    # middle: the two marked regions must NOT merge across the gap.
    corpus = _docs(
        spark,
        [
            (1, "q w e r only middle words here q w e r"),
            (2, "q w e r"),
        ],
    )
    got = _collect(repeated_spans(corpus, k=4, min_occurrences=2))
    assert got == {(1, 0, 4, 4, 1), (1, 8, 12, 4, 1), (2, 0, 4, 4, 1)}


def test_same_doc_repetition_counts_toward_occurrences(spark):
    # the window occurs twice INSIDE one doc and nowhere else — Lee et
    # al. count any repeat, not just cross-doc ones.
    corpus = _docs(
        spark,
        [
            (1, "a b c d x y z a b c d"),
            (2, "p q r s t u v w"),
        ],
    )
    got = _collect(repeated_spans(corpus, k=4, min_occurrences=2))
    assert got == {(1, 0, 4, 4, 1), (1, 7, 11, 4, 1)}


def test_short_docs_and_unique_corpus_emit_nothing(spark):
    corpus = _docs(
        spark,
        [
            (1, "too short"),  # < k tokens: no windows at all
            (2, "all of these tokens appear exactly once here"),
            (3, "and this doc shares nothing with that one above"),
        ],
    )
    assert repeated_spans(corpus, k=4, min_occurrences=2).count() == 0


def test_adjacent_windows_merge_into_one_contiguous_span(spark):
    # doc 1 = doc 2's run immediately followed by doc 3's run: the two
    # 4-token marked regions abut at token 4 and merge into ONE
    # 8-token span (the cut region is contiguous text).
    corpus = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "a b c d"),
            (3, "e f g h"),
        ],
    )
    got = _collect(repeated_spans(corpus, k=4, min_occurrences=2))
    assert got == {(1, 0, 8, 8, 2), (2, 0, 4, 4, 1), (3, 0, 4, 4, 1)}


DOC_TEXTS = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12
    ).map(" ".join),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(DOC_TEXTS)
def test_matches_reference_and_hash_families_agree(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    corpus = _docs(spark, rows)
    want = _ref_spans(rows, k=3, min_occ=2)
    by_hash = {
        hf: _collect(
            repeated_spans(corpus, k=3, min_occurrences=2, hash_fn=hf)
        )
        for hf in (None, "md5_60", "xxhash64")
    }
    assert by_hash[None] == want
    # 64-bit signatures are collision-free at these sizes: all three
    # hash families must produce the identical span set.
    assert by_hash["md5_60"] == want
    assert by_hash["xxhash64"] == want
