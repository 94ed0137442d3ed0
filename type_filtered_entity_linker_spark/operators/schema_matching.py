"""Instance-based schema matching — aligning the columns of two
heterogeneous sources BEFORE record linkage can even be configured
(Rahm & Bernstein, VLDB J. 2001, the instance-level family: two
sources rarely share column names, but a phone column's VALUES look
like the other side's tel column's values). This is the step upstream
of blocking-key choice: fd_violations says which columns can key,
schema_match says which columns line up at all.

Method: distinct-value-set overlap per column pair — Jaccard plus
directional containment (containment catches the subset case where
one source covers a region of the other). Values are compared as
trimmed strings; each column contributes its DISTINCT value set, so
row multiplicity does not bias the score.

Scale shape: one map-side unpivot per source (explode over
(col, value) structs — rows × |cols|, no shuffle), a distinct per
(col, value), then ONE value-keyed equi-join. Per-value join fanout
is (#left cols containing the value) × (#right cols containing it) —
bounded by the column counts, never by row counts, so a viral value
('unknown', '0') costs |A|·|B| rows, not corpus². Column sizes ride
two broadcast-size aggregates; the final ranking window partitions by
left column (at most |A| partitions of |B| rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _unpivot(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col, val) with one row per DISTINCT non-null trimmed string
    value per column."""
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.trim(F.col(c).cast("string")).alias("val"),
            )
            for c in cols
        ]
    )
    e = df.select(F.explode(structs).alias("x")).select("x.col", "x.val")
    return e.where(
        F.col("val").isNotNull() & (F.col("val") != "")
    ).distinct()


def schema_match(
    dfa: DataFrame,
    dfb: DataFrame,
    cols_a: list[str],
    cols_b: list[str],
) -> DataFrame:
    """All column pairs with any value overlap, scored and ranked.
    Returns (col_a, col_b, n_a, n_b, n_common, jaccard,
    containment_a, containment_b, rank) where rank orders col_b
    candidates per col_a by (jaccard DESC, col_b ASC); pairs with
    zero overlap are omitted (their score is 0 by definition — at web
    scale emitting the full |A|x|B| zero matrix is noise)."""
    ua = _unpivot(dfa, cols_a).withColumnRenamed("col", "col_a")
    ub = _unpivot(dfb, cols_b).withColumnRenamed("col", "col_b")
    na = ua.groupBy("col_a").agg(F.count("*").cast("long").alias("n_a"))
    nb = ub.groupBy("col_b").agg(F.count("*").cast("long").alias("n_b"))
    inter = (
        ua.join(ub, "val")
        .groupBy("col_a", "col_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    scored = (
        inter.join(F.broadcast(na), "col_a")
        .join(F.broadcast(nb), "col_b")
        .select(
            "col_a",
            "col_b",
            "n_a",
            "n_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
            F.round(F.col("n_common") / F.col("n_a"), 6).alias(
                "containment_a"
            ),
            F.round(F.col("n_common") / F.col("n_b"), 6).alias(
                "containment_b"
            ),
        )
    )
    w = Window.partitionBy("col_a").orderBy(
        F.col("jaccard").desc(), F.col("col_b").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    )
