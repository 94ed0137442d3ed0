"""Adaptive blocking-scheme selection — learning WHICH blocking rules
earn their candidate-pair budget (Bilenko/Kamath/Mooney ICDM'06
adaptive blocking; Michelson & Knoblock AAAI'06 BSL), simplified to
the standalone-utility ranking those learners use as their first
pass: each rule is scored by covered-truth-pairs per candidate-pair
cost, rules are ranked by that ratio, and the report shows the
CUMULATIVE truth coverage of every ranked prefix — the chart a team
reads to decide where the blocking budget stops paying (contrast
er_blocking_rules, which attributes a FIXED, hand-chosen order).

Fully relational — no driver-side greedy, no collect: per-rule
aggregates rank on a |rules|-row table; each truth pair finds its
MIN covering rank; prefix coverage is a running sum over |rules|
rows. The ratio order key is a double computed from exact integer
counts — both engines divide the same integers, so the ranking is
engine-stable without rounding."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_blocking_rules(
    flags: DataFrame, costs: DataFrame, n_rules: int
) -> DataFrame:
    """``flags``: one row per labeled TRUE pair with f_0..f_{n-1} int
    columns (1 = that rule's blocks contain the pair). ``costs``: one
    row per rule (rule_idx int, rule string, cost_pairs long — the
    rule's total candidate-pair count, sum f*(f-1)/2 over its block
    sizes). Returns one row per rank step: (step, rule, covered_alone,
    cost_pairs, ratio, cum_covered, n_truth, cum_pc) — ratio =
    covered_alone / cost_pairs (the utility key, DESC; ties -> lower
    rule_idx), cum_pc rounded to 6."""
    per_rule = None
    for i in range(n_rules):
        r = flags.agg(
            F.coalesce(F.sum(f"f_{i}"), F.lit(0))
            .cast("long")
            .alias("covered_alone")
        ).select(F.lit(i).alias("rule_idx"), "covered_alone")
        per_rule = r if per_rule is None else per_rule.unionByName(r)
    ranked = (
        per_rule.join(costs, "rule_idx")
        .withColumn(
            "ratio", F.col("covered_alone") / F.col("cost_pairs")
        )
        .withColumn(
            "step",
            F.row_number().over(
                Window.orderBy(
                    F.col("ratio").desc(), F.col("rule_idx").asc()
                )
            ),
        )
    )
    # each truth pair's first covering rank
    exploded = flags.select(
        "id_a",
        "id_b",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("rule_idx"),
                        F.col(f"f_{i}").alias("f"),
                    )
                    for i in range(n_rules)
                ]
            )
        ).alias("e"),
    ).select("id_a", "id_b", "e.rule_idx", "e.f")
    first = (
        exploded.where(F.col("f") == 1)
        .join(ranked.select("rule_idx", "step"), "rule_idx")
        .groupBy("id_a", "id_b")
        .agg(F.min("step").alias("first_step"))
    )
    n_truth = flags.agg(F.count("*").cast("long").alias("n_truth"))
    by_step = first.groupBy("first_step").agg(
        F.count("*").cast("long").alias("newly")
    )
    w = Window.orderBy("step").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ranked.join(
            by_step, ranked["step"] == by_step["first_step"], "left"
        )
        .crossJoin(n_truth)
        .select(
            "step",
            "rule",
            "covered_alone",
            "cost_pairs",
            F.round("ratio", 6).alias("ratio"),
            F.sum(F.coalesce("newly", F.lit(0)))
            .over(w)
            .cast("long")
            .alias("cum_covered"),
            "n_truth",
        )
        .withColumn(
            "cum_pc",
            F.round(F.col("cum_covered") / F.col("n_truth"), 6),
        )
    )
