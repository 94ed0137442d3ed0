"""Distributed Lloyd's k-means over an embedding column — the topic
bucketing / data-mixing primitive a training-corpus pipeline runs over
document embeddings (cluster → inspect → up/down-sample per cluster).

Design (pure DataFrame ops, no Python in the loop):

- **Deterministic seeding**: the k lowest-id vectors are the initial
  centroids (reproducibility contract over random init — same rationale
  as ``similarity.ivf_topk``; k-means++ would converge faster but makes
  the result depend on an RNG stream the oracle can't replay).
- **Assignment**: corpus ⋈ broadcast(centroids) cross join (k rows —
  always broadcastable by definition of k-means), squared-L2 in double
  via ``zip_with``+``aggregate`` (whole-stage codegen), argmin with
  deterministic ties (lowest centroid id).
- **Update**: ``posexplode`` → partial-aggregated ``avg`` per
  (cluster, dim) → re-assemble the centroid array. Per-iteration
  shuffle volume is |corpus|·dim narrow rows with map-side combine —
  at 10^12 docs the combine collapses each partition to ≤ k·dim rows
  before the exchange.
- **Determinism across engines**: centroid components are rounded to
  1e-6 after every update. Float avg is summation-order-dependent in
  the last bits; rounding re-synchronizes the engine and the oracle at
  each iteration so drift can't compound (same convention as the
  suite's other avg-carrying oracles).
- Centroids are ``localCheckpoint``-ed per iteration: k·dim values,
  truncates the growing lineage without driver round-trips.

Empty clusters drop out (both the engine and the oracle recompute
centroids only from assigned rows), matching textbook Lloyd's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sq_l2(a: F.Column, b: F.Column) -> F.Column:
    """Squared L2 distance between two float/double arrays, computed in
    double, sequentially over dims (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign(
    corpus: DataFrame, cents: DataFrame, id_col: str, emb_col: str
) -> DataFrame:
    """Nearest-centroid assignment: (id, emb, cid, d2), ties → lowest
    cid. cents: (cid, c_emb).

    argmin as a PARTIAL-AGGREGATED ``min(struct(d2, cid, emb))`` hash
    aggregate, not a row_number window: the crossJoin output is
    co-partitioned with the corpus (broadcast join), so map-side
    combine collapses the k rows per vector to ONE before any
    exchange — a window would shuffle and sort all k·n rows. Struct
    ordering compares (d2, cid) first, which is unique per group, so
    the carried emb never participates in the comparison."""
    j = corpus.crossJoin(F.broadcast(cents)).select(
        id_col,
        F.struct(
            _sq_l2(F.col(emb_col), F.col("c_emb")).alias("d2"),
            F.col("cid"),
            F.col(emb_col).alias("emb"),
        ).alias("cand"),
    )
    best = j.groupBy(id_col).agg(F.min("cand").alias("m"))
    return best.select(
        id_col,
        F.col("m.emb").alias(emb_col),
        F.col("m.cid").alias("cid"),
        F.col("m.d2").alias("d2"),
    )


def kmeans_topics(
    corpus: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means: ``n_iter`` assign→update rounds from the
    deterministic seeds, then a final assignment against the last
    centroids. Returns (id, cluster_id, dist2 rounded to 1e-6)."""
    corpus = corpus.select(id_col, emb_col)
    # seeds: TakeOrdered (parallel partial top-K) — never a global sort
    seeds = corpus.orderBy(id_col).limit(k)
    w_seed = Window.orderBy(id_col)
    cents = seeds.select(
        (F.row_number().over(w_seed) - 1).alias("cid"),
        F.col(emb_col).alias("c_emb"),
    ).localCheckpoint(eager=True)
    for _ in range(n_iter):
        a = _assign(corpus, cents, id_col, emb_col)
        dims = a.select(
            "cid", F.posexplode(emb_col).alias("pos", "v")
        )
        cents = (
            dims.groupBy("cid", "pos")
            .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("c_emb")
            )
            .localCheckpoint(eager=True)
        )
    final = _assign(corpus, cents, id_col, emb_col)
    return final.select(
        F.col(id_col),
        F.col("cid").alias("cluster_id"),
        F.round(F.col("d2"), 6).alias("dist2"),
    )


def kmeans_cluster_stats(assigned: DataFrame) -> DataFrame:
    """Per-cluster observability row: size + mean distance — the
    balance/inertia report an operator watches when tuning k."""
    return assigned.groupBy("cluster_id").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg("dist2"), 6).alias("mean_dist2"),
    )
