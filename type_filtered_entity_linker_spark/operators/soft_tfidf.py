"""SoftTFIDF hybrid string similarity (Cohen, Ravikumar & Fienberg,
IIWeb/KDD workshop 2003 — the SecondString comparator that won their
cross-comparator evaluation for name matching).

Monge–Elkan (operators/matching.py) treats every token as equally
important; whole-record TF-IDF cosine (er_tfidf_pairs) requires EXACT
token agreement. SoftTFIDF is the hybrid the record-linkage literature
converged on: a TF-IDF-weighted cosine where tokens count as shared
when they are merely CLOSE under a secondary similarity (Jaro-Winkler
above a threshold), so "Smith Hammond Corp" still matches
"Smith-Hammond Corporatin" — rare informative tokens dominate the
score AND typos inside those tokens don't zero it out.

Definition used here (the SecondString convention, stated precisely so
the oracle is a spec, not a guess):

- weights: V'(w, r) = ln(tf + 1) * ln(N / df), L2-normalized per
  record; df counts RECORDS containing w, N = record count.
- CLOSE(a, b) = distinct tokens w of a whose best Jaro-Winkler match
  v* among b's tokens has jw(w, v*) >= theta (default 0.9; JW uses
  the strcmp95 0.7 boost threshold — bit-identical to DuckDB's
  jaro_winkler_similarity on non-empty tokens).
- score(a, b) = sum over CLOSE of V(w, a) * V(v*, b) * jw(w, v*),
  where among equal-jw ties v* takes the LARGEST weight V(v, b) —
  a deterministic tie-break both engines express as max(struct).

Scale shape (10^12 records): the token/df/weight tables are three hash
aggregates over the tokenized corpus (shuffled by token — Zipf heads
collapse map-side in the partial counts). The pair stream comes from
upstream blocking, so the token-pair join fans out |toks_a|*|toks_b|
per CANDIDATE PAIR only — names and addresses are a handful of tokens,
a constant factor, never corpus-quadratic. JW runs as ONE Arrow-batched
numpy kernel over the token-pair stream (no per-row Python); the
argmax-with-tiebreak is a partial-aggregating max(struct), not a
window sort, so a viral token list still collapses map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tfidf_token_weights(
    records: DataFrame, field: str, id_col: str = "rec_id"
) -> DataFrame:
    """L2-normalized ln(tf+1)*ln(N/df) token weights, one row per
    (record, distinct token): (id_col, tok, v). Three hash aggregates
    plus a single-row count broadcast — no window, no UDF."""
    toks = records.select(
        F.col(id_col),
        F.explode(F.split(F.col(field), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = records.agg(F.count("*").alias("n"))
    w = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "tok",
            (
                F.log(F.col("tf") + 1)
                * F.log(F.col("n").cast("double") / F.col("df"))
            ).alias("w"),
        )
    )
    nrm = w.groupBy(id_col).agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
    return w.join(nrm, id_col).select(
        id_col, "tok", (F.col("w") / F.col("norm")).alias("v")
    )


def soft_tfidf_scores(
    records: DataFrame,
    pairs: DataFrame,
    field: str,
    id_col: str = "rec_id",
    theta: float = 0.9,
    round_to: int = 6,
) -> DataFrame:
    """SoftTFIDF score for each candidate pair (see module docstring).

    Returns one row per input pair: (id_a, id_b, n_close, soft_tfidf)
    — pairs with NO close token still emit (0, 0.0) via the left join,
    so a downstream threshold sees every candidate it was given.
    """
    from ..functions.strings import jw_pandas_udf

    jw = jw_pandas_udf()
    v = tfidf_token_weights(records, field, id_col)
    p = pairs.select("id_a", "id_b")
    va = v.select(
        F.col(id_col).alias("id_a"), F.col("tok").alias("tok_a"), F.col("v").alias("va")
    )
    vb = v.select(
        F.col(id_col).alias("id_b"), F.col("tok").alias("tok_b"), F.col("v").alias("vb")
    )
    cross = (
        p.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("s", jw(F.col("tok_a"), F.col("tok_b")))
    )
    # best match per LEFT token: max(struct(s, vb)) maximizes jw first,
    # then takes the largest right-weight among equal-jw ties — the
    # deterministic v* election, as a partial aggregate (no window)
    best = cross.groupBy("id_a", "id_b", "tok_a").agg(
        F.max("va").alias("va"),
        F.max(F.struct(F.col("s").alias("s"), F.col("vb").alias("vb"))).alias("m"),
    )
    agg = (
        best.where(F.col("m.s") >= theta)
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("n_close"),
            F.sum(F.col("va") * F.col("m.vb") * F.col("m.s")).alias("raw"),
        )
    )
    return p.join(agg, ["id_a", "id_b"], "left").select(
        "id_a",
        "id_b",
        F.coalesce(F.col("n_close"), F.lit(0)).cast("long").alias("n_close"),
        F.round(F.coalesce(F.col("raw"), F.lit(0.0)), round_to).alias("soft_tfidf"),
    )
