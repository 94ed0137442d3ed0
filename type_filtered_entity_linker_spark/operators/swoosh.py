"""Merge-based entity resolution — R-Swoosh (Benjelloun, Garcia-Molina,
Menestrina, Su, Whang & Widom, "Swoosh: a generic approach to entity
resolution", VLDB Journal 2009), distributed as rounds of
match -> cluster -> MERGE where the merged record's field values feed
the NEXT round's matching. This is the capability cluster-then-
survivor pipelines lack: a merge can ENABLE a match neither parent
made alone (A contributes the name, B the phone; only their merge
matches C on name AND phone). With a match rule satisfying the ICAR
properties the fixpoint is unique; this implementation additionally
pins determinism by construction — min-member entity ids,
longest-then-lexicographically-largest field survivors.

Blocking: every rule arm must contain at least one EXACT predicate;
candidates are the union of equality self-join blocks on each arm's
FIRST exact field, which is lossless for the rule set by construction
(an arm can only fire where its exact field agrees). Block
selectivity is the caller's responsibility — a coarse exact field
(e.g. city) costs block^2 pairs, the standard Swoosh trade.

Scale shape per round: |arms| equality self-joins, one rule
evaluation over blocked pairs, one CC loop over match edges, one
cluster-keyed merge aggregate; the round loop is driver-coordinated
with localCheckpoint barriers exactly like the CC operator itself."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import connected_components
from .rules import rule_based_matches


def _survivor(col):
    """Longest-then-lexicographically-largest non-null value — the
    deterministic merge the oracle replays as
    max(struct(length(v), v))."""
    return F.max(
        F.when(
            col.isNotNull(),
            F.struct(F.length(col).alias("l"), col.alias("v")),
        )
    )["v"]


def swoosh_er(
    records: DataFrame,
    rules: "list[list[dict]]",
    fields: "list[str]",
    max_rounds: int = 4,
    id_col: str = "rec_id",
) -> DataFrame:
    """Run merge-based ER to its fixpoint: returns (``id_col``,
    entity_id) mapping every ORIGINAL record to its final merged
    entity (min member id across all merge generations). Raises
    RuntimeError if matches remain after ``max_rounds`` — an unrolled
    oracle can therefore never silently under-iterate (the
    greedy_matching convention)."""
    block_fields = []
    for arm in rules:
        exact = [p["field"] for p in arm if p["op"] == "exact"]
        if not exact:
            raise ValueError(
                "every Swoosh rule arm needs an exact predicate "
                "(lossless equality blocking depends on it)"
            )
        block_fields.append(exact[0])

    membership = records.select(
        F.col(id_col).alias("orig"), F.col(id_col).alias("cur")
    )
    current = records.select(F.col(id_col), *fields).localCheckpoint()

    for _ in range(max_rounds):
        blocks = None
        for bf in sorted(set(block_fields)):
            side = current.select(F.col(id_col), F.col(bf)).where(
                F.col(bf).isNotNull()
            )
            p = (
                side.alias("a")
                .join(side.alias("b"), bf)
                .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
                .select(
                    F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                )
            )
            blocks = p if blocks is None else blocks.unionByName(p)
        pairs = blocks.distinct()
        edges = (
            rule_based_matches(current, pairs, rules, id_col=id_col)
            .where(F.col("matched") == 1)
            .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
            .localCheckpoint()
        )
        if edges.limit(1).count() == 0:
            return membership.select(
                F.col("orig").alias(id_col),
                F.col("cur").cast("long").alias("entity_id"),
            )
        assign = connected_components(edges).withColumnRenamed(
            "node", id_col
        )
        # fold the round's clusters into the original-record mapping
        membership = (
            membership.join(
                assign.select(
                    F.col(id_col).alias("cur"),
                    F.col("cluster_id").alias("nxt"),
                ),
                "cur",
                "left",
            )
            .select(
                "orig", F.coalesce("nxt", F.col("cur")).alias("cur")
            )
            .localCheckpoint()
        )
        merged = (
            current.join(
                assign.select(
                    F.col(id_col), F.col("cluster_id").alias("ent")
                ),
                id_col,
            )
            .groupBy("ent")
            .agg(*[_survivor(F.col(f)).alias(f) for f in fields])
            .select(F.col("ent").alias(id_col), *fields)
        )
        untouched = current.join(assign, id_col, "left_anti")
        current = merged.unionByName(untouched).localCheckpoint()

    raise RuntimeError(
        f"swoosh_er did not converge within {max_rounds} rounds"
    )
