"""CCNet-style n-gram language-model perplexity quality filtering.

The standard web-corpus curation step the reference lacks but any
100 TB training-data pipeline needs (Wenzek et al., "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data", LREC 2020):
train a small LM on trusted text, score every crawled document's
perplexity under it, and keep/bucket documents by perplexity tier
(CCNet's head/middle/tail thirds). CCNet uses a KenLM 5-gram model;
the distributed re-expression here is an add-k-smoothed BIGRAM model
whose training *is* a pair of hash aggregations — the semantics
(cross-entropy under a count-based smoothed n-gram LM, tiering by
corpus-relative perplexity rank) are the same, and every step is an
exact, oracle-reproducible DataFrame computation with no UDFs.

Scale design (100 TB corpus, ~10^10 docs):
- LM training = ONE shuffle for bigram counts + ONE for context
  counts, both with map-side partial aggregation (hash-groupBy on
  Zipf-distributed keys: partials collapse the head tokens per
  partition before the exchange, so the shuffle carries ~|vocab|
  rows per partition, not ~|tokens|).
- Scoring = explode doc bigrams (narrow) + two shuffle joins against
  the LM tables keyed by (w1, w2) / (w1). The LM side is one row per
  key, so head-token skew is probe-side fanout only — AQE handles the
  reducer imbalance; no single key concentrates the build side.
- Tiering uses :func:`sorted_neighborhood.global_rank` — the exact
  distributed rank (range partition + offset compose), NOT a
  single-task global window.
- Unseen bigrams/contexts (LM trained on a different slice than it
  scores — here the even-doc_id half) hit the add-k smoothing floor
  via LEFT joins + coalesce(0), exactly like KenLM backoff handles
  open-vocabulary scoring.

Float determinism: probabilities are ratios of exact integer counts,
identical in both engines; the per-doc sum of -ln(p) terms and the
final exp() are the only float ops, and the house round(…, 6) on the
emitted columns absorbs summation-order / libm last-ulp divergence
(same convention as the TF-IDF and embedding-cosine oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sorted_neighborhood import global_rank
from .textstats import tokens_col


def doc_bigrams(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token pair, in-document
    order irrelevant downstream. Built by zipping the token array with
    itself shifted by one (pure codegen: split/slice/zip/explode — no
    shuffle, no UDF). Docs with < 2 tokens emit nothing."""
    toks = tokens_col(text_col)
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w2"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def train_bigram_lm(
    train_docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Count tables of an add-k bigram LM: (bigram_counts(w1, w2, c12),
    context_counts(w1, c1), vocab_size). Two hash aggregations with
    map-side partials; vocab_size is ONE scalar action (the only
    driver-side value — a count, not a collect of rows)."""
    bg = doc_bigrams(train_docs, text_col=text_col)
    bigram_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    context_counts = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab_size = (
        train_docs.select(F.explode(tokens_col(text_col)).alias("t"))
        .agg(F.countDistinct("t"))
        .first()[0]
    )
    return bigram_counts, context_counts, int(vocab_size)


def lm_perplexity(
    docs: DataFrame,
    bigram_counts: DataFrame,
    context_counts: DataFrame,
    vocab_size: int,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram cross-entropy + perplexity under the add-k
    LM: P(w2|w1) = (c12 + k) / (c1 + k·V), H = avg(-ln P) over the
    doc's bigrams, ppl = e^H. Unseen pairs/contexts coalesce to count
    0 (the smoothing floor). Returns (doc_id, n_bigrams,
    cross_entropy, ppl); docs with no bigrams are dropped (nothing to
    score — CCNet likewise skips empty lines)."""
    bg = doc_bigrams(docs, id_col=id_col, text_col=text_col)
    scored = (
        bg.join(bigram_counts, ["w1", "w2"], "left")
        .join(context_counts, ["w1"], "left")
        .select(
            "doc_id",
            (
                -F.log(
                    (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(k))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k * vocab_size))
                )
            ).alias("nll"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg("nll").alias("_h"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(F.col("_h"), 6).alias("cross_entropy"),
            F.round(F.exp(F.col("_h")), 6).alias("ppl"),
        )
    )


def perplexity_tiers(ppl_df: DataFrame, n_docs: int) -> DataFrame:
    """CCNet head/middle/tail thirds by exact perplexity rank
    (lower ppl = more fluent = head). Integer tier arithmetic
    (rank·3 vs N, 2N) so both engines partition identically; the rank
    itself is the exact distributed :func:`global_rank` over the total
    order (ppl, doc_id) — no single-task global sort."""
    ranked = global_rank(ppl_df, ["ppl", "doc_id"], rank_col="ppl_rank")
    tier = (
        F.when(F.col("ppl_rank") * 3 <= n_docs, F.lit("head"))
        .when(F.col("ppl_rank") * 3 <= 2 * n_docs, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ranked.withColumn("tier", tier)


def lm_quality(
    docs: DataFrame, train_pred=None, k: float = 0.5
) -> DataFrame:
    """End-to-end: train the bigram LM on the ``train_pred`` slice
    (default: even doc_ids — a held-in "trusted" half, so the odd half
    genuinely exercises the unseen-bigram smoothing path), score ALL
    docs, tier by exact perplexity thirds. Returns
    (doc_id, n_bigrams, cross_entropy, ppl, ppl_rank, tier)."""
    if train_pred is None:
        train_pred = F.col("doc_id") % 2 == 0
    train = docs.where(train_pred)
    bigram_counts, context_counts, vocab = train_bigram_lm(train)
    ppl = lm_perplexity(docs, bigram_counts, context_counts, vocab, k=k)
    # the count() action and global_rank both consume ppl; checkpoint
    # once so the LM build + scoring joins run a single time (house
    # pattern from el_clusters' shared-base memo)
    ppl = ppl.localCheckpoint()
    n_docs = ppl.count()
    return perplexity_tiers(ppl, n_docs).select(
        "doc_id", "n_bigrams", "cross_entropy", "ppl", "ppl_rank", "tier"
    )
