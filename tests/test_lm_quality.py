"""Bigram-LM perplexity quality filter (operators/lm_quality.py):
smoothed probabilities, unseen-bigram handling, and CCNet-style
head/middle/tail tiering — each checked against a small
hand-computable pure-Python reference of the same semantics."""

import math
from collections import Counter

from type_filtered_entity_linker_spark.operators.lm_quality import (
    doc_bigrams,
    lm_perplexity,
    lm_quality,
    train_bigram_lm,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_ppl(train_texts, score_text, k=0.5):
    """Pure-Python reference: add-k bigram cross-entropy/perplexity."""
    bg = Counter()
    c1 = Counter()
    vocab = set()
    for t in train_texts:
        toks = t.split()
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
            c1[a] += 1
    toks = score_text.split()
    nll = [
        -math.log((bg[(a, b)] + k) / (c1[a] + k * len(vocab)))
        for a, b in zip(toks, toks[1:])
    ]
    h = sum(nll) / len(nll)
    return round(h, 6), round(math.exp(h), 6)


def test_doc_bigrams_shapes(spark):
    rows = [(1, "a b c"), (2, "solo"), (3, "x y")]
    got = sorted(
        (r["doc_id"], r["w1"], r["w2"])
        for r in doc_bigrams(_docs(spark, rows)).collect()
    )
    # single-token doc emits nothing
    assert got == [(1, "a", "b"), (1, "b", "c"), (3, "x", "y")]


def test_lm_perplexity_matches_pure_python(spark):
    train_rows = [(0, "the cat sat on the mat"), (2, "the cat ran")]
    score_rows = train_rows + [(1, "the dog sat")]  # unseen bigrams
    d = _docs(spark, score_rows)
    bgc, c1c, v = train_bigram_lm(_docs(spark, train_rows))
    out = {
        r["doc_id"]: r for r in lm_perplexity(d, bgc, c1c, v).collect()
    }
    train_texts = [t for _, t in train_rows]
    for doc_id, text in score_rows:
        h, ppl = _py_ppl(train_texts, text)
        assert out[doc_id]["cross_entropy"] == h, doc_id
        assert out[doc_id]["ppl"] == ppl, doc_id
        assert out[doc_id]["n_bigrams"] == len(text.split()) - 1
    # seen text must be more fluent (lower ppl) than the unseen-bigram doc
    assert out[0]["ppl"] < out[1]["ppl"]


def test_lm_quality_tiers_partition_thirds(spark):
    # 9 docs, even ids train the LM; tiers must split 3/3/3 with
    # head holding the lowest perplexities.
    rows = [(i, f"tok{i % 3} tok{(i + 1) % 3} tok{(i + 2) % 3} end") for i in range(9)]
    out = lm_quality(_docs(spark, rows)).collect()
    assert len(out) == 9
    tiers = Counter(r["tier"] for r in out)
    assert tiers == {"head": 3, "middle": 3, "tail": 3}
    by_rank = sorted(out, key=lambda r: r["ppl_rank"])
    ppls = [r["ppl"] for r in by_rank]
    assert ppls == sorted(ppls)
    assert [r["tier"] for r in by_rank] == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    # ranks are the exact 1..N permutation (global_rank contract)
    assert sorted(r["ppl_rank"] for r in out) == list(range(1, 10))


def test_corpus_build_e2e_stage_composition(spark):
    """Integration shape of the composite corpus-build: duplicates
    collapse to the lowest doc_id BEFORE the LM sees them, exactly
    one third of survivors is dropped as 'tail', and the per-lang
    report covers every kept doc."""
    from pyspark.sql import functions as F

    from type_filtered_entity_linker_spark.operators.lm_quality import (
        lm_quality,
    )

    base = [
        (i, f"d{i} " + " ".join(f"w{(i * j) % 5}" for j in range(1, 8)), "en")
        for i in range(9)
    ]
    dups = [(100 + i, base[i][1], "de") for i in range(3)]  # exact dups
    docs = spark.createDataFrame(
        base + dups, "doc_id long, text string, lang string"
    )
    keep = (
        docs.select("doc_id", F.md5("text").alias("th"))
        .groupBy("th")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    survivors = docs.join(keep.select("doc_id"), "doc_id")
    # duplicates lose to the lower original ids
    assert sorted(r["doc_id"] for r in survivors.collect()) == list(range(9))
    tiers = lm_quality(survivors.select("doc_id", "text"))
    out = tiers.collect()
    assert len(out) == 9
    assert sum(1 for r in out if r["tier"] == "tail") == 3
