"""Hierarchical agglomerative clustering (average linkage) within
blocks — the classic ER alternative to transitive closure.

Connected components (operators/clustering.py) is the scale workhorse
but it over-merges by construction: ONE spurious edge chains two true
entities together (the failure er_transitive_conflicts audits).
Average-linkage HAC is the standard remedy in production ER systems
(Dedupe's clustering stage, Google's Sibyl-era ER, the Splink
cluster-refinement literature): merge the two clusters whose MEAN
pairwise similarity is highest, stop when no pair of clusters clears
the threshold — so a single stray edge can no longer glue two dense
groups whose cross-pair average is low.

Classic HAC is a sequential heap algorithm over a full similarity
matrix — driver-side and quadratic, a non-starter at corpus scale.
This operator distributes it with two observations:

1. ER similarity graphs are BLOCKED: merges only ever happen inside a
   block (no cross-block pairs exist), so every block's dendrogram is
   independent and all blocks proceed in parallel.
2. Within a block, sequential HAC = "merge the single best pair, then
   recompute" — which is exactly one relational round: re-derive
   cluster-pair average similarities from the (static) record-pair
   table and the current assignment, pick each block's argmax above
   the threshold, apply the merge. Iterating rounds until no block
   merges reproduces per-block sequential average-linkage HAC
   EXACTLY, because rounds of different blocks never interact.

Each round is therefore: one join of the pair table against the
assignment (twice, on the two endpoints), one partial-aggregated
groupBy (block, cluster-pair) computing sum(sim)/count, one
per-block row_number argmax, and one left join applying the merges —
no driver-side state, no UDF. Round count ≤ max merges per block
≤ max block size − 1, the same bounded-block precondition every
blocking-based stage in this repo already carries (cf. the purge
threshold in meta_blocking.py). Determinism: similarities are
ratios of two exact integers (one IEEE division — bit-identical in
any engine), ties broken by (smaller cluster id, larger cluster id),
so the full dendrogram is a pure function of the input — the SQL
oracle unrolls the rounds and matches hash-exactly.

Average linkage expects the COMPLETE within-block pair set (UPGMA's
mean is over all n1·n2 cross pairs); feed it all within-block pairs,
not a pruned candidate set, or absent pairs silently count as
"missing" rather than 0 and the linkage becomes a biased mean over
observed pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hac_clusters(
    nodes: DataFrame,
    pairs: DataFrame,
    threshold: float,
    max_rounds: int = 8,
    strict: bool = True,
) -> DataFrame:
    """Per-block average-linkage HAC with a similarity threshold stop.

    ``nodes``: (block_key, rec_id) — every record, singletons
    included (they come back self-clustered). ``pairs``: (block_key,
    id_a, id_b, sim) with INTEGER sim and id_a < id_b, complete
    within each block. Returns (block_key, rec_id, cluster_id);
    cluster_id = the smallest rec_id merged into the cluster.
    """
    asn, _ = _hac_rounds(nodes, pairs, threshold, max_rounds, strict)
    return asn


def hac_dendrogram(
    nodes: DataFrame,
    pairs: DataFrame,
    threshold: float,
    max_rounds: int = 8,
    strict: bool = True,
) -> DataFrame:
    """The MERGE TRACE of ``hac_clusters`` — one row per accepted
    merge: (block_key, step, cluster_a, cluster_b, avg_sim), where
    step is the block's dendrogram height at which cluster_b folded
    into cluster_a and avg_sim the average linkage that justified it.
    This is the explanation artifact a steward reviews ("WHY are
    these three records one entity, and how confident was each
    join?") and the input to a threshold-sensitivity plot: cutting
    the dendrogram at any τ' ≥ τ is a FILTER on this table, no
    re-clustering needed. Same loop, same determinism contract as
    hac_clusters; cost identical (the trace rows were computed
    anyway, this just keeps them)."""
    _, trace = _hac_rounds(nodes, pairs, threshold, max_rounds, strict)
    return trace


def _hac_rounds(
    nodes: DataFrame,
    pairs: DataFrame,
    threshold: float,
    max_rounds: int,
    strict: bool = True,
) -> "tuple[DataFrame, DataFrame]":
    spark = nodes.sparkSession
    asn = nodes.select(
        "block_key", "rec_id", F.col("rec_id").alias("cluster_id")
    ).localCheckpoint(eager=True)
    merge_log: list[DataFrame] = []
    step = 0
    # one extra iteration beyond max_rounds: it performs NO merge,
    # only verifies the fixpoint was reached — a block needing more
    # than max_rounds merges raises instead of returning a silently
    # truncated dendrogram (code-review w15; same contract as
    # greedy_matching/swoosh/kcore). strict=False keeps the old
    # truncating behavior for deliberate cap studies.
    for round_i in range(max_rounds + 1):
        step += 1
        ca = F.least("a1.cluster_id", "a2.cluster_id")
        cb = F.greatest("a1.cluster_id", "a2.cluster_id")
        cp = (
            pairs.alias("p")
            .join(
                asn.alias("a1"),
                (F.col("p.block_key") == F.col("a1.block_key"))
                & (F.col("p.id_a") == F.col("a1.rec_id")),
            )
            .join(
                asn.alias("a2"),
                (F.col("p.block_key") == F.col("a2.block_key"))
                & (F.col("p.id_b") == F.col("a2.rec_id")),
            )
            .where(F.col("a1.cluster_id") != F.col("a2.cluster_id"))
            .groupBy(
                F.col("p.block_key").alias("block_key"),
                ca.alias("ca"),
                cb.alias("cb"),
            )
            .agg(
                (F.sum("p.sim") / F.count("*")).alias("avg_sim")
            )
        )
        w = Window.partitionBy("block_key").orderBy(
            F.col("avg_sim").desc(), F.col("ca").asc(), F.col("cb").asc()
        )
        best = (
            cp.where(F.col("avg_sim") >= threshold)
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("block_key", "ca", "cb", "avg_sim")
            .localCheckpoint(eager=True)
        )
        if best.count() == 0:
            break
        if round_i == max_rounds:
            if strict:
                raise RuntimeError(
                    f"hac did not reach the merge fixpoint in "
                    f"{max_rounds} rounds (some block still has a "
                    f"mergeable cluster pair above {threshold}); "
                    f"raise max_rounds or pass strict=False"
                )
            break
        merge_log.append(
            best.select(
                "block_key",
                F.lit(step).cast("long").alias("step"),
                F.col("ca").alias("cluster_a"),
                F.col("cb").alias("cluster_b"),
                F.round("avg_sim", 6).alias("avg_sim"),
            )
        )
        asn = (
            asn.alias("a")
            .join(
                best.alias("b"),
                (F.col("a.block_key") == F.col("b.block_key"))
                & (F.col("a.cluster_id") == F.col("b.cb")),
                "left",
            )
            .select(
                F.col("a.block_key").alias("block_key"),
                F.col("a.rec_id").alias("rec_id"),
                F.coalesce("b.ca", "a.cluster_id").alias("cluster_id"),
            )
            .localCheckpoint(eager=True)
        )
    if merge_log:
        trace = merge_log[0]
        for part in merge_log[1:]:
            trace = trace.unionByName(part)
    else:
        trace = spark.createDataFrame(
            [],
            "block_key string, step long, cluster_a long, "
            "cluster_b long, avg_sim double",
        )
    return asn, trace
