"""Privacy-preserving record linkage (PPRL) via Bloom-filter
encodings: Schnell, Bachteler & Reiher, "Privacy-preserving record
linkage using Bloom filters" (BMC Medical Informatics 2009) — the
standard when two parties must link person records WITHOUT exchanging
cleartext identifiers. Each party hashes its names' padded q-grams
into a fixed-size Bloom bitset (a "cryptographic long-term key", CLK)
with k independent hash functions; the linkage unit then compares only
bitsets — Dice similarity over set bits approximates q-gram Dice over
the original strings, so typo'd duplicates still score high while the
cleartext never leaves its source.

Representation choice: the CLK is modeled RELATIONALLY as distinct
(rec_id, pos) rows rather than a packed bitmask — set semantics is the
Bloom filter's own semantics (a bit is set or not), every engine can
compute it (the DuckDB oracle replays the exact md5-derived positions),
and the Dice intersection becomes an ordinary pair-key equi-join. At
10^12-row scale the same pipeline would pack positions into 1-2 longs
per record (bitwise AND + popcount via F.bit_count) to cut the shuffle
width — the hash layer below is unchanged; only the final aggregation
shape differs, and m=64 fits one long exactly.

Hash construction (deterministic, engine-portable): position i of
q-gram g under hash function h (1..k) is the first 15 md5 hex chars of
'clk{h}:{g}' taken as an integer, mod m — the double-hashing-free
variant; independence across h comes from the salt prefix, the same
trick as the CMS sketch rows (operators/sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clk_positions(
    records: DataFrame,
    field: str,
    id_col: str = "rec_id",
    m: int = 64,
    k: int = 2,
    q: int = 2,
) -> DataFrame:
    """Distinct CLK bit positions per record: (id_col, pos). The field
    is lowercased and padded with '_' on both ends (the Schnell et al.
    convention — boundary q-grams carry prefix/suffix signal), split
    into overlapping q-grams, each hashed k ways mod m.

    All map-side until the final distinct (one shuffle keyed by
    record): explode q-grams via sequence+substring (pure JVM), k
    hash columns per gram via md5 — no UDF anywhere."""
    padded = F.concat(F.lit("_"), F.lower(F.col(field)), F.lit("_"))
    grams = (
        records.withColumn("_p", padded)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(_p)-{q - 1}),"
                    f" i -> substring(_p, i, {q}))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    pos_cols = [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"clk{h}:"), F.col("g"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % m
        ).alias(f"p{h}")
        for h in range(1, k + 1)
    ]
    return (
        grams.select(id_col, F.explode(F.array(*pos_cols)).alias("pos"))
        .distinct()
    )


def dice_link(
    records: DataFrame,
    pairs: DataFrame,
    field: str,
    id_col: str = "rec_id",
    m: int = 64,
    k: int = 2,
    q: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Dice similarity between candidate pairs' CLK encodings:
    2*|A ∩ B| / (|A| + |B|) over set bit positions. Returns one row
    per pair whose BOTH ids exist in ``records`` (ids blocking never
    saw are a caller error and are dropped by the membership joins):
    (id_a, id_b, card_a, card_b, n_common, dice). Pairs whose filters
    share no bit still emit (n_common=0, dice=0), and a record with a
    NULL/empty field gets card 0 — its pairs emit dice 0.0 rather
    than disappearing (two empty filters define Dice as 0, the
    conservative non-match).

    Plan: cardinalities are one hash aggregate over the position
    table; the intersection is a pair-key equi-join on (pair, pos)
    feeding a count — per-pair cost bounded by m, and the pair stream
    comes from upstream blocking, so the whole comparison is linear in
    candidate pairs at any corpus size."""
    clk = clk_positions(records, field, id_col, m=m, k=k, q=q)
    # card per RECORD (not per record-with-positions): a NULL/empty
    # field yields zero grams — left join so such records keep card 0
    # instead of silently deleting their pairs downstream
    card = (
        records.select(id_col)
        .join(
            clk.groupBy(id_col).agg(
                F.count("*").cast("long").alias("_c")
            ),
            id_col,
            "left",
        )
        .select(id_col, F.coalesce("_c", F.lit(0)).cast("long").alias("card"))
    )
    p = pairs.select("id_a", "id_b")
    pa = clk.select(F.col(id_col).alias("id_a"), "pos")
    pb = clk.select(F.col(id_col).alias("id_b"), "pos")
    inter = (
        p.join(pa, "id_a")
        .join(pb, ["id_b", "pos"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return (
        p.join(card.withColumnRenamed(id_col, "id_a"), "id_a")
        .withColumnRenamed("card", "card_a")
        .join(card.withColumnRenamed(id_col, "id_b"), "id_b")
        .withColumnRenamed("card", "card_b")
        .join(inter, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            "card_a",
            "card_b",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.when(F.col("card_a") + F.col("card_b") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    2.0
                    * F.coalesce("n_common", F.lit(0))
                    / (F.col("card_a") + F.col("card_b")),
                    round_to,
                )
            )
            .alias("dice"),
        )
    )
