"""Declarative rule-based matching — the Magellan / dedupe.io school
of record linkage, complementing the probabilistic Fellegi-Sunter
family: a match decision is a DISJUNCTION of rule arms, each arm a
CONJUNCTION of per-field predicates (exact equality or a Levenshtein
bound). Deterministic, auditable (each arm's fire flag is a column),
and the shape production teams actually deploy when labeled data is
scarce.

Rule spec: ``rules`` is a list of arms; an arm is a list of predicate
dicts {"field": f, "op": "exact" | "lev", "t": max-distance (lev
only)}. A predicate on a NULL value is FALSE (never a wildcard) — an
arm only fires on evidence that exists.

Scale shape: two id-keyed record joins + pure column expressions per
pair — identical to fellegi_sunter_scores; candidate generation is the
caller's blocking (see swoosh_er's lossless-blocking note: every arm
should contain at least one exact predicate so equality blocks on
those fields are lossless for the rule set)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pred_expr(p: dict):
    a, b = F.col(f"a_{p['field']}"), F.col(f"b_{p['field']}")
    nn = a.isNotNull() & b.isNotNull()
    if p["op"] == "exact":
        return nn & (a == b)
    if p["op"] == "lev":
        return nn & (F.levenshtein(a, b) <= int(p["t"]))
    raise ValueError(f"unknown rule op {p['op']!r}")


def arm_expr(arm: "list[dict]"):
    """Conjunction of one rule arm's predicates over a_/b_-prefixed
    pair columns."""
    e = F.lit(True)
    for p in arm:
        e = e & _pred_expr(p)
    return e


def rule_based_matches(
    records: DataFrame,
    pairs: DataFrame,
    rules: "list[list[dict]]",
    id_col: str = "rec_id",
) -> DataFrame:
    """Evaluate the rule set on candidate ``pairs``: one row per pair
    with rule_<i> int flags (one per arm, audit columns) and
    ``matched`` = any arm fired. Fields referenced by the rules must
    exist on ``records``."""
    if not rules:
        raise ValueError("rule_based_matches requires at least one arm")
    fields = sorted({p["field"] for arm in rules for p in arm})
    a = records.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f).alias(f"a_{f}") for f in fields],
    )
    b = records.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f).alias(f"b_{f}") for f in fields],
    )
    j = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    flags = [
        arm_expr(arm).cast("int").alias(f"rule_{i}")
        for i, arm in enumerate(rules)
    ]
    j = j.select("id_a", "id_b", *flags)
    matched = F.lit(0)
    for i in range(len(rules)):
        matched = F.greatest(matched, F.col(f"rule_{i}"))
    return j.withColumn("matched", matched)
