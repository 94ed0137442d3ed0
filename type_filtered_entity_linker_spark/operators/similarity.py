"""Similarity search over embedding columns (array<float>).

- ``cosine`` / ``dot``: pure JVM column expressions (zip_with +
  aggregate in double precision — whole-stage codegen, no Python).
- ``brute_force_topk``: exact top-k neighbors per query vector —
  the correctness baseline. Query side is small and broadcast; the
  corpus side streams, so the plan is a broadcast nested-loop that
  scales linearly in corpus size.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane (sign) LSH
  buckets computed JVM-side from deterministic literal hyperplanes;
  only intra-bucket pairs are scored. Approximate: recall depends on
  bucket bits.
- ``embedding_near_duplicates``: pairs with cosine ≥ τ (embedding-based
  near-dup detection for training corpora).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_q: str = "query_id",
    id_c: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k of each query over the corpus (self excluded).
    queries: (query_id, q_emb); corpus: (vec_id, embedding)."""
    # precompute norms once per side: each pair then costs ONE dot
    q = queries.withColumn("qn", norm(F.col("q_emb")))
    c = corpus.withColumn("cn", norm(F.col("embedding")))
    j = F.broadcast(q).crossJoin(c).where(F.col(id_q) != F.col(id_c))
    scored = j.select(
        id_q,
        id_c,
        F.round(
            dot(F.col("q_emb"), F.col("embedding")) / (F.col("qn") * F.col("cn")),
            6,
        ).alias("cos"),
    )
    w = Window.partitionBy(id_q).orderBy(F.desc("cos"), F.col(id_c).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_q, id_c, "cos", "rank")
    )


def hyperplanes(dim: int, bits: int = 12, seed: int = 11) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim).astype(float).tolist()


def lsh_bucket(emb: F.Column, planes: list[list[float]]) -> F.Column:
    """Sign-LSH bucket id: bit b = sign(emb · plane_b). JVM-only."""
    bucket = F.lit(0).cast("long")
    for b, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(
            dot(emb, plane) > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def _infer_dim(df: DataFrame, emb_col: str) -> int:
    """Embedding dimension from the data (one 1-row job). A wrong
    literal dim would make every hyperplane dot null (zip_with pads
    with null) → all vectors in bucket 0 → silent O(n²) degeneration."""
    row = df.select(F.size(F.col(emb_col)).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError(f"cannot infer embedding dim from column {emb_col!r}")
    return int(row["d"])


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    bits: int = 8,
    n_tables: int = 1,
    dim: int | None = None,
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k: only corpus vectors sharing an LSH bucket with
    the query (in ANY of ``n_tables`` independent hash tables) are
    scored. One table shrinks the candidate set ~2^bits-fold but its
    recall is (1-θ/π)^bits per neighbor — poor on weakly-correlated
    corpora; OR-amplification across tables (the standard multi-table
    LSH construction, recall → 1-(1-p)^L) trades candidate volume back
    for recall. Each table's planes are seeded seed+t; the per-side
    bucket array explodes to (tbl, bucket) so ALL tables ride ONE
    equi-join, and candidate pairs are deduped before scoring (a pair
    is scored once no matter how many tables it collides in)."""
    d = dim or _infer_dim(corpus, "embedding")
    plane_sets = [hyperplanes(d, bits, seed + t) for t in range(n_tables)]

    def with_tables(df: DataFrame, emb: str) -> DataFrame:
        buckets = F.array(*[lsh_bucket(F.col(emb), p) for p in plane_sets])
        return df.select(
            "*", F.posexplode(buckets).alias("tbl", "bucket")
        )

    qb = with_tables(queries, "q_emb")
    cb = with_tables(corpus, "embedding")
    j = (
        qb.join(cb, ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("vec_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = j.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style ANN: partition the corpus into cells around coarse
    centroids, probe only the n_probe nearest cells per query.

    Centroids are deterministic — the n_cells lowest-id corpus vectors
    act as seeds (a k-means refinement would improve cell balance but
    adds nondeterminism; seeds keep results reproducible, and the cell
    assignment is still nearest-centroid). With n_probe == n_cells the
    result equals brute force exactly.

    Scale: assignment is a broadcast nested-loop vs n_cells rows
    (linear scans, JVM-side); the probe join shuffles on cell id, so
    per-query work drops by ~n_cells/n_probe.
    """
    # seed selection via orderBy+limit (TakeOrdered — parallel partial
    # top-K, no global sort); the cell-id window then runs over only
    # n_cells rows. A bare Window.orderBy over the corpus would funnel
    # every row through one partition.
    seeds = corpus.orderBy("vec_id").limit(n_cells)
    w_seed = Window.orderBy("vec_id")
    cents = seeds.select(
        (F.row_number().over(w_seed) - 1).alias("cell"),
        F.col("embedding").alias("c_emb"),
    )
    # nearest-centroid assignment (argmax cosine, deterministic ties)
    def assign(df, id_col, emb_col, top):
        j = df.crossJoin(F.broadcast(cents)).select(
            "*", cosine(F.col(emb_col), F.col("c_emb")).alias("c_cos")
        )
        ww = Window.partitionBy(id_col).orderBy(
            F.desc("c_cos"), F.col("cell").asc()
        )
        return (
            j.withColumn("crn", F.row_number().over(ww))
            .where(F.col("crn") <= top)
            .drop("c_emb", "c_cos", "crn")
        )

    cb = assign(corpus, "vec_id", "embedding", 1)
    qb = assign(queries, "query_id", "q_emb", n_probe)
    j = qb.join(cb, "cell").where(F.col("query_id") != F.col("vec_id"))
    scored = j.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("q_emb"), F.col("embedding")), 6).alias("cos"),
    ).dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def _sq_sub_dist(a: F.Column, b: F.Column) -> F.Column:
    """Squared euclidean distance between two (sub)vectors as a strict
    left-to-right fold — the SAME operand order as the DuckDB oracle's
    list_reduce, so both engines produce bit-identical doubles and the
    downstream argmin picks the same centroid."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroid_ids: tuple[int, int] = (100, 115),
    k: int = 5,
    m_sub: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (ADC) — the memory-compression scale path of the ANN family
    (brute = exact baseline, LSH/IVF = candidate pruning, PQ = corpus
    stored as M small codes instead of the full vector):

    - codebook: the corpus vectors with vec_id in ``centroid_ids``
      (inclusive range) become the K centroids of EVERY subspace —
      a deterministic sampling init (k-means iterations would improve
      it but need no different plumbing), so the whole operator stays
      exactly replayable in SQL;
    - encode: each corpus vector's m-th subvector maps to its nearest
      centroid subvector (argmin of squared distance, ties to the
      lowest centroid id) — corpus × (M·K) narrow work, one hash agg;
    - query: an M×K lookup table of query-subvector↔centroid distances
      (tiny, broadcast);
    - ADC distance = sum over m of LUT[m][code(x, m)] — the PQ point:
      M lookups per pair instead of a dim-length dot product; top-k per
      query by (distance, vec_id).

    All relational: slices + folds + joins + window; no UDF. At scale
    the codes table (M small ints per vector) is ~2% of the float
    corpus — the representation that actually fits 10^12 vectors.
    """
    d = dim or _infer_dim(corpus, "embedding")
    sub = d // m_sub

    cents = (
        corpus.where(F.col("vec_id").between(*centroid_ids))
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb"))
        .withColumn(
            # codebook is K rows by construction — the unpartitioned
            # window is a single trivial task, never a scale concern
            "c",
            F.row_number().over(Window.orderBy("cid")) - 1,
        )
    )

    def sub_rows(df: DataFrame, id_col: str, emb_col: str, out: str) -> DataFrame:
        subs = F.array(
            *[
                F.struct(
                    F.lit(m).alias("m"),
                    F.slice(F.col(emb_col), m * sub + 1, sub).alias(out),
                )
                for m in range(m_sub)
            ]
        )
        return df.select(id_col, F.explode(subs).alias("s")).select(
            id_col, "s.m", f"s.{out}"
        )

    cent_sub = sub_rows(cents, "c", "cemb", "cv")
    corp_sub = sub_rows(corpus, "vec_id", "embedding", "sv")
    codes = (
        corp_sub.join(F.broadcast(cent_sub), "m")
        .select(
            "vec_id",
            "m",
            F.struct(_sq_sub_dist(F.col("sv"), F.col("cv")).alias("d2"), F.col("c")).alias("dc"),
        )
        .groupBy("vec_id", "m")
        .agg(F.min("dc").alias("b"))
        .select("vec_id", "m", F.col("b.c").alias("code"))
    )
    q_sub = sub_rows(queries, "query_id", "q_emb", "qv")
    lut = q_sub.join(F.broadcast(cent_sub), "m").select(
        "query_id", "m", "c", _sq_sub_dist(F.col("qv"), F.col("cv")).alias("lutd")
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes.m == lut.m) & (codes.code == lut.c),
        )
        .where(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("lutd"), 6).alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc_dist", "rank")
    )


def embedding_near_duplicates(
    vectors: DataFrame, tau: float = 0.99, id_col: str = "vec_id",
    emb_col: str = "embedding", lsh_bits: int | None = None,
    dim: int | None = None, seed: int = 11,
) -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine ≥ tau.

    With ``lsh_bits`` set: sign-LSH bucket blocking, then exact cosine
    verify within buckets (candidates-then-verify). For the near-dup
    regime (tau → 1) identical/near-identical vectors hash to the same
    bucket with probability → 1, so the blocked result equals the
    brute-force result while scoring ~2^bits fewer pairs. Without it:
    exhaustive self-join (the small-corpus / oracle baseline)."""
    if lsh_bits:
        planes = hyperplanes(
            dim or _infer_dim(vectors, emb_col), lsh_bits, seed
        )
        b = vectors.select(
            F.col(id_col).alias("vid"),
            F.col(emb_col).alias("e"),
            norm(F.col(emb_col)).alias("n"),
            lsh_bucket(F.col(emb_col), planes).alias("bucket"),
        )
        a_side = b.select(
            F.col("vid").alias("id_a"), F.col("e").alias("ea"),
            F.col("n").alias("na"), "bucket",
        )
        b_side = b.select(
            F.col("vid").alias("id_b"), F.col("e").alias("eb"),
            F.col("n").alias("nb"), "bucket",
        )
        return (
            a_side.join(b_side, "bucket")
            .where(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b",
                F.round(
                    dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")),
                    6,
                ).alias("cos"),
            )
            .where(F.col("cos") >= tau)
            .dropDuplicates(["id_a", "id_b"])
        )
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(emb_col).alias("e"),
        norm(F.col(emb_col)).alias("n"),
    )
    a = v.select(
        F.col("vid").alias("id_a"), F.col("e").alias("ea"), F.col("n").alias("na")
    )
    b = v.select(
        F.col("vid").alias("id_b"), F.col("e").alias("eb"), F.col("n").alias("nb")
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(
                dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cos"),
        )
        .where(F.col("cos") >= tau)
    )
