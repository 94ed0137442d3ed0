"""Physical-plan assertions for the loop-barrier rule.

Round 4 found the same scale bug twice by probe — an iterative or
self-joining composite whose re-referenced input was NOT barriered, so
both consumers recomputed the expensive derivation (MinHash 224 s →
43.7 s, canopy 2×). The written rule (operator docstrings, memory):
any DataFrame a loop or self-join re-references gets ONE eager
localCheckpoint up front if its lineage contains a join/aggregate.

This module automates the tripwire (VERDICT r04 item 3): walk the
final ``executedPlan`` string and assert the barrier actually took —
the expensive subtree appears ZERO times downstream of the checkpoint
(its attributes survive only as `Scan ExistingRDD` outputs), and the
checkpoint scan itself is present. A plan that silently regressed to
the both-sides-recompute shape fails these assertions before a 10×
probe — or a 1000-executor cluster — has to find it.

Used by tests/test_plan_asserts.py for: linkage e2e, MinHash LSH,
SimHash, canopy, pivot/star, swoosh, steward, blocking-rules.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "extended") -> str:
    """The query-execution plan set as one string (parsed/analyzed/
    optimized/physical for ``extended``; physical-only for
    ``simple``). Rendered without executing the DataFrame."""
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    em = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jqe.explainString(em)


def physical_plan(df: DataFrame) -> str:
    return plan_string(df, "simple")


def count_in_plan(df: DataFrame, pattern: str) -> int:
    """Occurrences of ``pattern`` (regex) in the physical plan."""
    return len(re.findall(pattern, physical_plan(df)))


def assert_barriered(
    df: DataFrame,
    derivation_pattern: str,
    max_occurrences: int = 0,
    min_existing_rdd: int = 1,
) -> None:
    """Assert the both-sides-recompute shape is absent:
    ``derivation_pattern`` (a regex matching a node only the expensive
    upstream derivation produces — an aggregate function call, a
    generator, a join condition) occurs at most ``max_occurrences``
    times in the physical plan, and at least ``min_existing_rdd``
    `Scan ExistingRDD` nodes (the checkpoint barrier) are present."""
    plan = physical_plan(df)
    n_deriv = len(re.findall(derivation_pattern, plan))
    n_rdd = len(re.findall(r"Scan ExistingRDD", plan))
    if n_deriv > max_occurrences or n_rdd < min_existing_rdd:
        raise AssertionError(
            f"loop-barrier regression: derivation pattern "
            f"{derivation_pattern!r} occurs {n_deriv}x "
            f"(allowed {max_occurrences}), Scan ExistingRDD {n_rdd}x "
            f"(need >= {min_existing_rdd}) — a re-referenced input is "
            f"being recomputed instead of read from its checkpoint "
            f"barrier. Plan:\n{plan[:4000]}"
        )
