"""Truth discovery / conflict resolution with iterative source
reliability: when several sources assert conflicting attribute values
for the same real-world object, resolve by weighted voting where the
weights (source trust) are themselves learned from agreement — the
fixpoint family of TruthFinder (Yin, Han & Yu, KDD'07) and the
Sums/Average·Log estimators of Pasternack & Roth (COLING'10);
survivorship (operators/survivorship.py) is the degenerate single-rule
case of this.

Iteration (the Average variant):

    conf(obj, v)  =  sum of trust(s) over sources asserting (obj, v),
                     normalized over obj's candidate values
    trust(s)      =  mean of conf(obj, v_s) over s's claims

EXACT ARITHMETIC BY CONSTRUCTION: trust and confidence are carried as
integer MICRO-units (1e-6), every division is integer floor division,
and all sums are over longs — so the fixpoint is bit-reproducible
regardless of partitioning, aggregation order, or engine float
behavior. The 1e-6 floor quantization per step is part of the
algorithm spec (the oracle replays it with `//`), not an approximation
bolted on afterwards: it sidesteps the whole Spark-vs-DuckDB
double-rounding midpoint class (BENCH/PLANS.md round(6) policy)
instead of guarding it.

Range precondition (documented, not checked): the confidence step
computes raw * 1e6 where raw <= the summed trust mass asserting one
(obj, value) — this stays under 2^63 while fewer than ~9.2 million
sources assert the same value of the same object (trust <= 1e6 micro
each). Truth-discovery "sources" are data PROVIDERS (registries,
crawls, feeds), not documents, so real source counts are orders of
magnitude below that; past it, widen both engines' micro-unit state
to DECIMAL(38,0) — floor division semantics carry over unchanged
(same trade as selfjoin_pairs' bigint widening, ADVICE r3).

Scale shape: each round is two hash aggregates (per-claim-value trust
sum with map-side partial collapse; per-object total) plus one join
back to claims and one per-source aggregate — all keyed by object or
source, no windows, no driver-side state beyond the loop counter.
Per-round localCheckpoint keeps lineage flat (the r4 iterative-loop
rule)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def source_trust_iterations(
    claims: DataFrame,
    rounds: int = 3,
    init_trust_micro: int = 800_000,
) -> DataFrame:
    """Run ``rounds`` trust/confidence iterations over ``claims``
    (source, obj, value). Returns the per-round trust trajectory:
    (round, source, trust_micro, trust) — ``rounds`` rows per source,
    trust = trust_micro / 1e6 for human consumption, trust_micro the
    exact state."""
    trust = (
        claims.select("source")
        .distinct()
        .withColumn("tm", F.lit(init_trust_micro).cast("long"))
        .localCheckpoint(eager=True)
    )
    out: "DataFrame | None" = None
    for r in range(1, rounds + 1):
        raw = (
            claims.join(trust, "source")
            .groupBy("obj", "value")
            .agg(F.sum("tm").cast("long").alias("raw"))
        )
        tot = raw.groupBy("obj").agg(F.sum("raw").cast("long").alias("tot"))
        conf = raw.join(tot, "obj").select(
            "obj",
            "value",
            F.expr(f"(raw * {MICRO}) div tot").cast("long").alias("cm"),
        )
        trust = (
            claims.join(conf, ["obj", "value"])
            .groupBy("source")
            .agg(
                F.expr("sum(cm) div count(*)").cast("long").alias("tm")
            )
            .localCheckpoint(eager=True)
        )
        step = trust.select(
            F.lit(r).cast("long").alias("round"),
            "source",
            F.col("tm").alias("trust_micro"),
            (F.col("tm") / MICRO).alias("trust"),
        )
        out = step if out is None else out.unionByName(step)
    assert out is not None
    return out


def resolve_values(claims: DataFrame, trust: DataFrame) -> DataFrame:
    """Final conflict resolution under a given trust table (source,
    tm): each object takes its max-total-trust value, ties broken by
    the LEXICOGRAPHICALLY SMALLEST value. Plan: two hash aggregates
    (per-value vote sum, per-object max vote) plus a join back on
    (obj, max-vote) feeding a min(value) aggregate — three shuffles,
    all object-keyed, no window sort (max(struct) alone cannot express
    a MIN-string tie-break under a MAX vote, hence the join-back).
    Returns (obj, resolved_value, vote_micro)."""
    raw = (
        claims.join(trust, "source")
        .groupBy("obj", "value")
        .agg(F.sum("tm").cast("long").alias("raw"))
    )
    best = raw.groupBy("obj").agg(F.max("raw").alias("raw"))
    return (
        raw.join(best, ["obj", "raw"])
        .groupBy("obj")
        .agg(
            F.min("value").alias("resolved_value"),
            F.max("raw").alias("vote_micro"),
        )
    )
