"""Meta-blocking: weight-and-prune the comparison graph a redundant
blocking scheme implies (Papadakis et al., "Meta-Blocking: Taking
Entity Resolution to the Next Level", IEEE TKDE 2014).

Redundancy-positive blocking (each record keyed into SEVERAL blocks —
phone prefix + phone suffix + city + ...) boosts recall but explodes
the candidate-pair count. Meta-blocking recovers the precision: two
records' co-occurrence ACROSS blocks is evidence they match, so weight
each candidate edge by it and prune the weak edges before any
pair-scoring runs. This slots between the blocking operators
(``blocking.py``, ``fellegi_sunter.blocking_quality``) and the scorer
(``scoring.py`` / ``fellegi_sunter.fellegi_sunter_scores``) — the
reference pipeline has no analog (its blocking is a single exact
alias-match join, el/candidate_generator.py:14-21); this is the
standard published upgrade its users need at web scale.

Weights:
- ``cbs``  — Common Blocks Scheme: |blocks shared by the pair|.
  Integer arithmetic end-to-end → exact cross-engine (DuckDB) parity.
- ``ecbs`` — Entity-centric CBS: ``cbs · ln(B/|B_a|) · ln(B/|B_b|)``
  (B = total blocks; |B_i| = blocks containing record i) — an
  IDF-style correction that discounts records appearing in many
  blocks. Multiplication order is fixed (left-to-right) so a SQL
  replica with the same order is bit-identical.

Pruning:
- ``wep`` — Weighted Edge Pruning: keep edges with weight ≥ the global
  mean edge weight.
- ``wnp`` — Weighted Node Pruning (the redefined/undirected variant):
  keep an edge if its weight ≥ the mean incident-edge weight of EITHER
  endpoint — each record retains its locally-strong neighbors even
  when the global distribution is skewed.

Scale shape (10^12 records): block purging FIRST caps every block at
``max_block_size``, so pair generation is ≤ max_block_size · Σ|block|
rows — linear in the block-entry count, never quadratic in a viral
block (a viral key is boilerplate evidence, not match evidence, which
is why the paper purges it outright). The self-join shuffles block
entries on block_key once; the weight aggregation is one
partial-aggregated shuffle on (id_a, id_b); node averages are one
small aggregate over edges (two rows per edge) re-joined on the ids.
The two scalar aggregates (total block count, global mean) join back
via broadcast of a 1-row frame — no collect, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def block_purge(
    blocks: DataFrame,
    block_col: str = "block_key",
    max_block_size: int = 50,
) -> DataFrame:
    """Drop every block larger than ``max_block_size`` (oversized
    blocks are stop-word-like: huge pair cost, no match signal).
    Input/output: (id, block_key) entries."""
    sizes = (
        blocks.groupBy(block_col)
        .agg(F.count("*").alias("_bs"))
        .where(F.col("_bs") <= max_block_size)
        .drop("_bs")
    )
    return blocks.join(sizes, block_col)


def pair_weights(
    blocks: DataFrame,
    id_col: str = "rec_id",
    block_col: str = "block_key",
    weight: str = "cbs",
) -> DataFrame:
    """Candidate edges (id_a < id_b) with the chosen co-occurrence
    weight. ``blocks``: (id_col, block_col) entries, already purged."""
    if weight not in ("cbs", "ecbs"):
        raise ValueError(f"unknown weight scheme {weight!r}")
    a = blocks.select(F.col(id_col).alias("id_a"), block_col)
    b = blocks.select(F.col(id_col).alias("id_b"), block_col)
    edges = (
        a.join(b, block_col)
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("cbs"))
    )
    if weight == "cbs":
        return edges.withColumn("weight", F.col("cbs").cast("double"))
    ent = blocks.groupBy(id_col).agg(F.countDistinct(block_col).alias("_nb"))
    tot = blocks.agg(
        F.countDistinct(block_col).cast("double").alias("_nblocks")
    )
    ln = lambda n: F.log(F.col("_nblocks") / F.col(n).cast("double"))  # noqa: E731
    return (
        edges.join(
            ent.select(F.col(id_col).alias("id_a"), F.col("_nb").alias("_nb_a")),
            "id_a",
        )
        .join(
            ent.select(F.col(id_col).alias("id_b"), F.col("_nb").alias("_nb_b")),
            "id_b",
        )
        .crossJoin(F.broadcast(tot))
        # fixed order (cbs · ln_a) · ln_b — SQL replicas must match it
        .withColumn(
            "weight", (F.col("cbs") * ln("_nb_a")) * ln("_nb_b")
        )
        .select("id_a", "id_b", "cbs", "weight")
    )


def meta_block_prune(
    blocks: DataFrame,
    id_col: str = "rec_id",
    block_col: str = "block_key",
    weight: str = "cbs",
    scheme: str = "wnp",
    max_block_size: int = 50,
    keep_all: bool = False,
) -> DataFrame:
    """Purge → weight → prune. Returns the retained candidate edges
    (id_a, id_b, cbs, weight) — the pair table a downstream scorer
    (Fellegi–Sunter / embedding cosine) consumes instead of the full
    Σ|block|² comparison set.

    The weighted-edge frame is ``localCheckpoint``-ed: both pruning
    schemes consume it 2–3 times (threshold aggregate + final filter),
    and Spark does not reuse the block self-join exchange across those
    consumers (verified: 0 ReusedExchange in the executed plan), so
    without it the most expensive stage runs once per consumer.

    ``keep_all=True`` returns EVERY candidate edge with a boolean
    ``kept`` column instead of filtering — the evaluation shape
    (measure pair reduction vs truth recall) at the same cost."""
    purged = block_purge(blocks, block_col, max_block_size)
    w = pair_weights(purged, id_col, block_col, weight).localCheckpoint(
        eager=False
    )
    if scheme == "wep":
        mean = w.agg(F.avg("weight").alias("_mean"))
        flagged = w.crossJoin(F.broadcast(mean)).select(
            "id_a",
            "id_b",
            "cbs",
            "weight",
            (F.col("weight") >= F.col("_mean")).alias("kept"),
        )
    elif scheme == "wnp":
        incid = w.select(F.col("id_a").alias("_node"), "weight").unionAll(
            w.select(F.col("id_b").alias("_node"), "weight")
        )
        node_avg = incid.groupBy("_node").agg(F.avg("weight").alias("_avg"))
        flagged = (
            w.join(
                node_avg.select(
                    F.col("_node").alias("id_a"), F.col("_avg").alias("_avg_a")
                ),
                "id_a",
            )
            .join(
                node_avg.select(
                    F.col("_node").alias("id_b"), F.col("_avg").alias("_avg_b")
                ),
                "id_b",
            )
            .select(
                "id_a",
                "id_b",
                "cbs",
                "weight",
                (
                    (F.col("weight") >= F.col("_avg_a"))
                    | (F.col("weight") >= F.col("_avg_b"))
                ).alias("kept"),
            )
        )
    else:
        raise ValueError(f"unknown pruning scheme {scheme!r}")
    if keep_all:
        return flagged
    return flagged.where("kept").drop("kept")
