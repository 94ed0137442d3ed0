"""Edit-distance similarity self-join — PassJoin (Li, Deng & Feng,
ICDE'11): find every record pair whose chosen string field is within
Levenshtein distance d, WITHOUT the quadratic all-pairs scan and
WITHOUT a lossy filter.

Pigeonhole guarantee: split the indexed string into d+1 contiguous
segments; d edit operations can corrupt at most d of them, so if
ed(a, b) <= d then at least one segment of a appears in b VERBATIM,
and (alignment-shift bound) it appears at a start position within +-d
of its position in a. Candidate generation is therefore an EQUI-join:
the index side emits its d+1 (length, segment_idx, segment) keys; the
probe side emits, for every plausible partner length l2 in
[l-d, l+d] and every segment slot, the substrings of itself at the
O(d) permitted start positions. At most (2d+1)*(d+1)*(2d+1) keys per
record (75 worst-case at d=2; the +-d start window is clipped to the
string's bounds, so typical strings emit fewer) — constant fanout, no
Zipf head by construction when the
field has real entropy (a templated shared prefix degrades segment 0
to a hot bucket, the documented failure mode of all segment blocking;
salt or pre-hash such fields upstream).

Verification is Spark's built-in levenshtein (JVM codegen) on the
deduplicated candidate pairs, so the output EQUALS the brute-force
cross join filtered to ed <= d — the oracle replays exactly that.

Strings shorter than d+1 characters would produce empty segments
(an empty equi-key matches everything); they are routed through an
explicit short-string block instead: shorts cross-pair with every
record of length <= 2d (length filter keeps this sound), a set whose
size is bounded by the token-length distribution, then verify as
usual.

Scale: one shuffle for the candidate equi-join (keyed by the segment
key), one for the pair dedup, verification map-side. Probe fanout is
a constant <=75x row multiplier at d=2 — the same order as MinHash's
k=64
signature explode — and candidate counts track true near-pair counts,
not corpus^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seg_len(l2: F.Column, i: F.Column, d: int) -> F.Column:
    """Length of segment i when a string of length l2 is split into
    d+1 parts: the last (l2 % (d+1)) parts get the extra char."""
    base = F.floor(l2 / (d + 1)).cast("int")
    k = (l2 % (d + 1)).cast("int")
    return base + F.when(i >= (d + 1) - k, 1).otherwise(0)


def _seg_start(l2: F.Column, i: F.Column, d: int) -> F.Column:
    """0-based start of segment i under the same split."""
    base = F.floor(l2 / (d + 1)).cast("int")
    k = (l2 % (d + 1)).cast("int")
    return (i * base + F.greatest(F.lit(0), i - ((d + 1) - k))).cast("int")


def edit_distance_join(
    records: DataFrame,
    field: str,
    d: int = 2,
    id_col: str = "rec_id",
) -> DataFrame:
    """All unordered record pairs (id_a < id_b) with
    levenshtein(field_a, field_b) <= d. Returns
    (id_a, id_b, edist). Exact — equals the brute-force cross join."""
    if d < 1:
        raise ValueError(f"edit distance bound d={d} must be >= 1")
    recs = records.select(
        F.col(id_col).alias("rid"),
        F.col(field).alias("s"),
        F.length(field).alias("l"),
    )
    long_recs = recs.where(F.col("l") >= d + 1)

    # index side: the d+1 segments of each (long-enough) string
    idx_i = F.sequence(F.lit(0), F.lit(d))
    index = long_recs.select(
        "rid",
        F.explode(
            F.transform(
                idx_i,
                lambda i: F.struct(
                    F.col("l").alias("kl"),
                    i.cast("int").alias("ki"),
                    F.substring(
                        F.col("s"),
                        _seg_start(F.col("l"), i, d) + 1,
                        _seg_len(F.col("l"), i, d),
                    ).alias("kseg"),
                ),
            )
        ).alias("k"),
    ).select("rid", "k.kl", "k.ki", "k.kseg")

    # probe side: for each partner length l2 and slot i, my substrings
    # at the +-d window around the partner's segment start. An
    # inverted sequence(a, b) with a > b would count DOWN in Spark, so
    # an empty window must be guarded to an empty array, not emitted.
    def probe_window(l2, i):
        lo = F.greatest(_seg_start(l2, i, d) - d, F.lit(0))
        hi = F.least(
            _seg_start(l2, i, d) + d,
            F.col("l") - _seg_len(l2, i, d),
        )
        return F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
            F.array().cast("array<int>")
        )

    probe = recs.select(
        "rid",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(
                        F.greatest(
                            F.col("l") - d, F.lit(d + 1)
                        ).cast("int"),
                        (F.col("l") + d).cast("int"),
                    ),
                    lambda l2: F.flatten(
                        F.transform(
                            F.sequence(F.lit(0), F.lit(d)),
                            lambda i: F.transform(
                                probe_window(l2, i),
                                lambda st: F.struct(
                                    l2.cast("int").alias("kl"),
                                    i.cast("int").alias("ki"),
                                    F.substring(
                                        F.col("s"),
                                        st + 1,
                                        _seg_len(l2, i, d),
                                    ).alias("kseg"),
                                ),
                            ),
                        )
                    ),
                )
            )
        ).alias("k"),
    ).select("rid", "k.kl", "k.ki", "k.kseg")

    cand = (
        index.alias("a")
        .join(
            probe.alias("b"),
            on=[
                F.col("a.kl") == F.col("b.kl"),
                F.col("a.ki") == F.col("b.ki"),
                F.col("a.kseg") == F.col("b.kseg"),
                F.col("a.rid") != F.col("b.rid"),
            ],
        )
        .select(
            F.least("a.rid", "b.rid").alias("id_a"),
            F.greatest("a.rid", "b.rid").alias("id_b"),
        )
        .distinct()
    )

    # short strings (l <= d): explicit block against everything their
    # length filter allows (partner length <= l + d <= 2d)
    shorts = recs.where(F.col("l") <= d)
    short_cand = (
        shorts.alias("a")
        .join(
            recs.where(F.col("l") <= 2 * d).alias("b"),
            on=[
                F.col("a.rid") != F.col("b.rid"),
                F.abs(F.col("a.l") - F.col("b.l")) <= d,
            ],
        )
        .select(
            F.least("a.rid", "b.rid").alias("id_a"),
            F.greatest("a.rid", "b.rid").alias("id_b"),
        )
        .distinct()
    )

    pairs = cand.unionByName(short_cand).distinct()
    named = recs.select("rid", "s")
    return (
        pairs.join(
            named.select(
                F.col("rid").alias("id_a"), F.col("s").alias("sa")
            ),
            "id_a",
        )
        .join(
            named.select(
                F.col("rid").alias("id_b"), F.col("s").alias("sb")
            ),
            "id_b",
        )
        .withColumn("edist", F.levenshtein("sa", "sb"))
        .where(F.col("edist") <= d)
        .select("id_a", "id_b", "edist")
    )
