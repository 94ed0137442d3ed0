"""Canopy clustering (McCallum, Nigam & Ungar, KDD'00) — the classic
cheap-metric pre-blocking stage: overlapping "canopies" built from an
inexpensive similarity so that an expensive scorer only ever compares
records sharing a canopy.

The textbook algorithm is sequential (pick a point, form its canopy
from the points within the loose threshold, remove the points within
the tight threshold from the candidate pool, repeat). This module
computes the EXACT same output as that sequential pass under the
deterministic pick order "lowest remaining id first", distributively:

- Centers. Picking the minimum remaining id each time elects exactly
  the lexicographically-first maximal independent set of the tight
  (s2) threshold graph. That MIS is computable in parallel rounds
  (Blelloch, Fineman & Shun, SPAA'12): every remaining node whose id
  is smaller than ALL its remaining tight-neighbors elects itself,
  elected balls leave the pool, repeat — O(log n) expected rounds,
  each one shuffle-bounded aggregation, no global order materialized.
- Membership. In the sequential pass a node joins canopy(c) iff it is
  loose-similar to c AND still in the pool when c is elected. Because
  centers are elected in ascending id order, "still in the pool" is
  exactly `c <= rtime(x)` where rtime(x) = min over tight-similar
  centers of x (and x itself when x is a center) — one groupBy(min)
  plus one join, no sequential state.

Canopies OVERLAP by design (a node can be loose-similar to several
centers); every node lands in at least one canopy (whatever removed it
from the pool is tight- and therefore loose-similar to it, or it was
itself elected).

Scale: edge tables are the cheap-similarity pair stream (already
blocked/bounded upstream); each MIS round is a semi-join plus a
min-aggregation keyed by node id; the pool shrinks by whole
tight-balls per round.
localCheckpoint keeps the loop's lineage flat, and the convergence
check doubles as the round's row count (one job per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Symmetrize an a<b pair table into directed (u, v) edges."""
    return pairs.select(
        F.col(a).alias("u"), F.col(b).alias("v")
    ).unionByName(pairs.select(F.col(b).alias("u"), F.col(a).alias("v")))


def canopy_clusters(
    nodes: DataFrame,
    pairs: DataFrame,
    s1: float,
    s2: float,
    id_col: str = "doc_id",
    left_col: str = "doc_a",
    right_col: str = "doc_b",
    sim_col: str = "jaccard",
    max_rounds: int = 25,
    stats: "list | None" = None,
) -> DataFrame:
    """(center, member) canopy assignments over ``nodes`` given the
    cheap-similarity pair stream ``pairs`` (one row per unordered pair
    with ``left_col < right_col``; pairs below the loose threshold s1
    may be absent entirely). ``s1`` = loose membership threshold,
    ``s2`` = tight pool-removal threshold, s2 >= s1. Equals the
    sequential lowest-id-first canopy pass exactly — see module
    docstring. Raises RuntimeError if the MIS loop fails to drain the
    pool within ``max_rounds`` (so a truncated center set can never
    silently masquerade as the fixpoint; the driver oracle unrolls the
    same bound). ``stats`` collects {round, centers, remaining}.
    """
    if s2 < s1:
        raise ValueError(f"tight threshold s2={s2} < loose s1={s1}")
    # the cheap-similarity pair stream is usually itself a join (e.g.
    # a shingle posting-list self-join); every MIS round semi-joins
    # e2, so without a barrier that upstream join re-executes per
    # round. The pair table is the SMALLEST table in the job — the
    # barrier is cheap here and a reliable-storage checkpoint at
    # cluster scale (same rationale as the LSH signature barrier in
    # operators/dedup.py, BENCH/R4_NOTES.md).
    pairs = pairs.select(left_col, right_col, sim_col).localCheckpoint(
        eager=True
    )
    e2 = _sym(pairs.where(F.col(sim_col) >= s2), left_col, right_col)
    e1 = _sym(pairs.where(F.col(sim_col) >= s1), left_col, right_col)
    remaining = nodes.select(F.col(id_col).alias("id")).localCheckpoint(
        eager=True
    )
    centers: "DataFrame | None" = None
    n_centers = 0
    n_remaining = remaining.count()
    for r in range(1, max_rounds + 1):
        if n_remaining == 0:
            break
        rem_e = e2.join(
            remaining.withColumnRenamed("id", "u"), "u", "left_semi"
        ).join(remaining.withColumnRenamed("id", "v"), "v", "left_semi")
        min_nb = rem_e.groupBy("u").agg(F.min("v").alias("mn"))
        elected = (
            remaining.join(
                min_nb, remaining["id"] == min_nb["u"], "left"
            )
            .where(F.col("mn").isNull() | (F.col("id") < F.col("mn")))
            .select("id")
            .localCheckpoint(eager=True)
        )
        centers = elected if centers is None else centers.unionByName(
            elected
        )
        ball = rem_e.join(
            elected.withColumnRenamed("id", "u"), "u", "left_semi"
        ).select(F.col("v").alias("id"))
        removed = elected.unionByName(ball).distinct()
        remaining = remaining.join(removed, "id", "left_anti").localCheckpoint(
            eager=True
        )
        n_remaining = remaining.count()
        if stats is not None:
            # count this round's (checkpointed) elections, keep a
            # running total — recounting the accumulated union would
            # rescan every earlier round's frame each time
            n_centers += elected.count()
            stats.append(
                {
                    "round": r,
                    "centers": n_centers,
                    "remaining": n_remaining,
                }
            )
    if n_remaining > 0:
        raise RuntimeError(
            f"canopy_clusters did not drain the pool in {max_rounds} "
            f"rounds ({n_remaining} nodes remain); raise max_rounds"
        )
    if centers is None:
        # derive the empty schema from the input's id type (a
        # hardcoded long would break unions over per-batch outputs
        # with string ids exactly and only on the empty batch)
        return nodes.select(
            F.col(id_col).alias("center"), F.col(id_col).alias("member")
        ).limit(0)
    centers = centers.localCheckpoint(eager=True)
    # rtime(x) = the id of the center whose election removed x from
    # the pool: min over tight-similar centers, and x itself when x is
    # a center (elected == removed). Membership in canopy(c) requires
    # x to still be pooled at c's election: c <= rtime(x).
    rt = (
        e2.join(centers.withColumnRenamed("id", "u"), "u", "left_semi")
        .select(F.col("v").alias("id"), F.col("u").alias("c"))
        .unionByName(centers.select("id", F.col("id").alias("c")))
        .groupBy("id")
        .agg(F.min("c").alias("rtime"))
    )
    memb = (
        e1.join(centers.withColumnRenamed("id", "u"), "u", "left_semi")
        .join(rt, e1["v"] == rt["id"], "inner")
        .where(F.col("u") <= F.col("rtime"))
        .select(F.col("u").alias("center"), F.col("v").alias("member"))
    )
    return memb.unionByName(
        centers.select(
            F.col("id").alias("center"), F.col("id").alias("member")
        )
    )
