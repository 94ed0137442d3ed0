"""DSIR importance-resampling selection (operators/dsir.py) vs a
pure-Python reference of the same recipe (hashed unigram+bigram
buckets, Laplace-smoothed target/source models, Gumbel top-k on the
deterministic content-hash uniform)."""

import hashlib
import math
import re

import pytest

from type_filtered_entity_linker_spark.operators.dsir import dsir_select

B = 64
ALPHA = 1.0


def _fold(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text):
    toks = [t for t in re.split(r"\s+", text) if t]
    return toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]


def _ref(source, target, k):
    def bcounts(rows):
        per, tot = {}, {}
        for i, t in rows:
            for g in _grams(t):
                b = _fold(g) % B
                per.setdefault(i, {}).setdefault(b, 0)
                per[i][b] += 1
        return per

    def model(per):
        cnt = {}
        for bs in per.values():
            for b, n in bs.items():
                cnt[b] = cnt.get(b, 0) + n
        total = sum(cnt.values())
        return [
            math.log((cnt.get(b, 0) + ALPHA) / (total + ALPHA * B))
            for b in range(B)
        ]

    psrc, ptgt = bcounts(source), bcounts(target)
    lsrc, ltgt = model(psrc), model(ptgt)
    out = []
    for i, bs in psrc.items():
        logw = sum(n * (ltgt[b] - lsrc[b]) for b, n in bs.items())
        u = (_fold(f"dsir:{i}") + 1) / float(1 << 60)
        out.append((i, logw, logw + -math.log(-math.log(u))))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:k]


SOURCE = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the slow green turtle walks under the busy bridge"),
    (3, "der schnelle braune fuchs springt ueber den faulen hund"),
    (4, "die langsame gruene schildkroete geht unter der bruecke"),
    (5, "the quick green fox walks over the busy dog"),
    (6, "ein kleiner brauner hund schlaeft unter dem alten baum"),
]
TARGET = [r for r in SOURCE if r[0] in (1, 2, 5)]  # the English half


def test_dsir_matches_reference_selection_and_weights(spark):
    src = spark.createDataFrame(SOURCE, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    got = (
        dsir_select(src, tgt, k=4, n_buckets=B, hash_fn="md5_60")
        .orderBy("doc_id")
        .collect()
    )
    want = sorted(_ref(SOURCE, TARGET, 4))
    assert [r.doc_id for r in got] == [w[0] for w in want]
    for r, w in zip(got, want):
        assert r.logw == pytest.approx(w[1], abs=1e-5)
        assert r.sample_key == pytest.approx(w[2], abs=1e-5)


def test_dsir_prefers_target_like_docs(spark):
    # with k = all, English docs must carry higher logw than German
    src = spark.createDataFrame(SOURCE, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    rows = dsir_select(
        src, tgt, k=len(SOURCE), n_buckets=B, hash_fn="md5_60"
    ).collect()
    logw = {r.doc_id: r.logw for r in rows}
    assert min(logw[1], logw[2], logw[5]) > max(logw[3], logw[4], logw[6])


def test_dsir_production_hash_path_runs(spark):
    src = spark.createDataFrame(SOURCE, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    out = dsir_select(src, tgt, k=3, n_buckets=B, hash_fn="xxhash64")
    rows = out.collect()
    assert len(rows) == 3
    assert out.columns == ["doc_id", "logw", "sample_key"]
