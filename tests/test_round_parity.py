"""Cross-engine rounding semantics, characterized and pinned
(verdict r03 item 3).

Three round(x, n) implementations exist in this repo's gates:

- Spark ``F.round``: BigDecimal.valueOf(double) → HALF_UP on the
  double's SHORTEST decimal repr (== ``Decimal(repr(x)).quantize``).
- DuckDB native ``round`` on DOUBLE: scaled multiply — lands just
  below ~0.3% of exact decimal midpoints and rounds them DOWN.
- DuckDB ``round(x::VARCHAR::DECIMAL(38,25), n)`` ("the hop",
  ``plans/driver_queries._spark_round``): VARCHAR forces shortest-repr
  digits, DECIMAL round is HALF_UP on those digits — Spark-exact.

Policy (the oracle convention): plain ``round(x, 6)`` stays the house
idiom wherever the rounded double is a RAW accumulation (sums, avgs,
ratios of counts) — such a value lands on a shortest-repr midpoint with
probability ~0. The hop is REQUIRED wherever upstream math is itself
decimal-quantized (pagerank's per-iteration 1e-9 re-round, k-means'
1e-6-quantized centroids), because quantized inputs make exact
midpoints reachable — the round-3 pytest falsifying graph produced
exactly 0.3959375 after three pagerank iterations.
"""

import random
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pandas as pd
from pyspark.sql import functions as F


def spark_model(x: float, places: int) -> float:
    q = Decimal(1).scaleb(-places)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _adversarial_values(n_per_class: int = 4000) -> list[float]:
    rng = random.Random(20260819)
    vals = [rng.uniform(-10, 10) for _ in range(n_per_class)]
    # pagerank class: 1e-9 pre-quantized doubles
    vals += [round(rng.uniform(0, 1), 9) for _ in range(n_per_class)]
    # exact decimal midpoints at the 7th place (round-6 boundary)
    vals += [
        (rng.randrange(10**7) * 10 + 5) / 10**8 for _ in range(n_per_class)
    ]
    # exact half-ulp-of-1e-6 midpoints
    vals += [(rng.randrange(10**6) + 0.5) / 10**6 for _ in range(n_per_class)]
    # just-below-midpoint '…4999…' tails whose repr carries 16-17
    # significant digits: a DECIMAL hop narrower than the full repr
    # rounds the tail UP before the final round and diverges from
    # Spark (code-review r04 — scale 15 diverged on ~47% of this
    # class; scale 25 is exact). Spread across magnitudes so leading
    # zeros count against the scale too.
    for _ in range(n_per_class):
        base = rng.randrange(10**6)
        x = (base + 0.5) / 10**6
        x = float(x) - rng.choice([1, 2, 3]) * 2.0**-53 * x
        vals.append(x * 10.0 ** rng.randrange(-9, 4))
    # the round-3 falsifying value and sign/scale variants
    vals += [0.3959375, -0.3959375, 0.0000005, 0.9999995, 123.4567895,
             0.12345649999999997]
    return vals


def test_spark_round_is_shortest_repr_half_up(spark):
    """F.round(x, n) == HALF_UP on repr(x) for every adversarial value
    at both house scales (6 and 9) — the model round_half_up in
    test_iterative_property.py relies on."""
    vals = _adversarial_values()
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.select(
        "x", F.round("x", 6).alias("r6"), F.round("x", 9).alias("r9")
    ).collect()
    assert len(got) == len(vals)
    for r in got:
        assert r["r6"] == spark_model(r["x"], 6), r["x"]
        assert r["r9"] == spark_model(r["x"], 9), r["x"]


def test_duckdb_hop_matches_spark_and_native_diverges():
    """The hop idiom is Spark-exact on every adversarial value; the
    native double round provably diverges on the midpoint classes
    (so the hop is load-bearing, not decorative)."""
    vals = _adversarial_values()
    con = duckdb.connect()
    con.register("vals", pd.DataFrame({"x": vals}))
    rows = con.execute(
        """
        SELECT x,
               round(x, 6) AS native6,
               round(x::VARCHAR::DECIMAL(38,25), 6)::DOUBLE AS hop6,
               round(x::VARCHAR::DECIMAL(38,25), 9)::DOUBLE AS hop9
        FROM vals
        """
    ).fetchall()
    native_div = 0
    for x, native6, hop6, hop9 in rows:
        assert hop6 == spark_model(x, 6), x
        assert hop9 == spark_model(x, 9), x
        if native6 != spark_model(x, 6):
            native_div += 1
            # characterize: native divergence is confined to exact
            # midpoints and is exactly one quantum low
            assert abs(native6 - spark_model(x, 6)) <= 1.0000001e-6, x
    assert native_div > 0  # the class is real on this DuckDB build
