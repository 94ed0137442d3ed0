"""DSIR — Data Selection with Importance Resampling (Xie et al.,
NeurIPS 2023): pick the k source documents whose hashed-n-gram
distribution looks most like a TARGET corpus, the standard recipe for
"select web text that resembles Wikipedia/books" at pretraining scale.

Recipe, faithfully distributed:
1. featurize every document as word unigrams + bigrams, hashed into
   ``n_buckets`` (the paper's hashed generative model);
2. fit two Laplace-smoothed bucket distributions — target vs source —
   each ONE partial-aggregated groupBy over n_buckets keys (the model
   is n_buckets doubles: broadcast-sized by construction);
3. per source doc, log importance weight
   logw = sum_g [ln p_tgt(bucket(g)) - ln p_src(bucket(g))];
4. Gumbel top-k: sampling without replacement proportional to the
   importance weights == taking the top k of logw + Gumbel(0,1) noise
   (Gumbel-max trick); the noise is the module's deterministic
   content-hash uniform (same construction as curation.weighted_sample),
   so the selection is a pure function of the rows — stable under
   repartitioning, replayable by the SQL oracle.

Scale: two bucket-count shuffles (map-side combined, n_buckets result
rows each), one bucket-keyed join of the per-doc gram stream against
the 2*n_buckets-row model (broadcast), one per-doc sum, and a
TakeOrdered top-k — no global sort, no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_hash


def _grams(text_col: str) -> F.Column:
    """Word unigrams + bigrams (Java \\s+ tokens, empties dropped)."""
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != ""
    )
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def _bucketed(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    hash_fn: str,
) -> DataFrame:
    """(id, bucket, n) — per-doc bucket occurrence counts."""
    g = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_grams(text_col)).alias("gram"),
    )
    b = F.pmod(shingle_hash("gram", hash_fn), F.lit(n_buckets)).alias(
        "bucket"
    )
    return g.select("id", b).groupBy("id", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


def _bucket_logprobs(
    per_doc: DataFrame, n_buckets: int, alpha: float, out: str
) -> DataFrame:
    """(bucket, <out>) — ln of the Laplace-smoothed bucket probability
    for EVERY bucket id (missing buckets get the smoothing floor)."""
    spark = per_doc.sparkSession
    counts = per_doc.groupBy("bucket").agg(F.sum("n").alias("cnt"))
    all_b = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    total = per_doc.agg(F.sum("n").alias("total"))
    return (
        all_b.join(counts, "bucket", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
                / (F.col("total") + F.lit(alpha * n_buckets))
            ).alias(out),
        )
    )


def dsir_select(
    source_docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
    salt: str = "dsir",
) -> DataFrame:
    """Top-k source docs under Gumbel-perturbed importance weights.
    Returns (doc_id, logw, sample_key), both floats rounded to 6.
    ``hash_fn='md5_60'`` is the cross-engine oracle path; xxhash64 is
    production (identical selection absent 64-bit collisions)."""
    src = _bucketed(source_docs, id_col, text_col, n_buckets, hash_fn)
    tgt = _bucketed(target_docs, id_col, text_col, n_buckets, hash_fn)
    # an empty (or all-whitespace) corpus would make its model's total
    # NULL, silently NULLing every weight and turning the top-k into
    # an arbitrary doc_id slice — a mis-filtered target (wrong lang
    # value, say) must fail loudly instead
    for name, side in (("target", tgt), ("source", src)):
        if side.limit(1).count() == 0:
            raise ValueError(
                f"dsir_select: {name} corpus has no tokens — "
                "check the corpus filter"
            )
    model = _bucket_logprobs(tgt, n_buckets, alpha, "lp_tgt").join(
        _bucket_logprobs(src, n_buckets, alpha, "lp_src"), "bucket"
    )
    logw = (
        src.join(F.broadcast(model), "bucket")
        .groupBy("id")
        .agg(
            F.sum(
                F.col("n") * (F.col("lp_tgt") - F.col("lp_src"))
            ).alias("logw")
        )
    )
    h = shingle_hash(
        F.concat(F.lit(salt + ":"), F.col("id").cast("string")), "md5_60"
    )
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    gumbel = -F.log(-F.log(u))
    return (
        logw.withColumn("_key", F.col("logw") + gumbel)
        .orderBy(F.desc("_key"), F.asc("id"))
        .limit(k)
        .select(
            F.col("id").alias(id_col),
            F.round("logw", 6).alias("logw"),
            F.round("_key", 6).alias("sample_key"),
        )
    )
