"""Banded interval-overlap join (operators/temporal.py): exactly-once
emission across bucket spans, closed-interval boundary semantics, and
parity with a brute-force O(n*m) reference."""

from datetime import datetime

from type_filtered_entity_linker_spark.operators.temporal import (
    interval_overlap_join,
)


def _t(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_interval_overlap_exactly_once_and_boundaries(spark):
    left = _mk(
        spark,
        [
            (1, _t(0, 30), _t(5, 30)),   # spans 6 hour-buckets
            (2, _t(10, 0), _t(10, 5)),   # short
            (3, _t(20, 0), _t(20, 30)),  # overlaps nothing
        ],
        "lid long, ls timestamp, le timestamp",
    )
    right = _mk(
        spark,
        [
            (100, _t(2, 0), _t(3, 0)),    # inside left-1
            (200, _t(5, 30), _t(6, 0)),   # touches left-1 end exactly
            (300, _t(9, 0), _t(10, 0)),   # touches left-2 start exactly
            (400, _t(12, 0), _t(13, 0)),  # overlaps nothing
        ],
        "rid long, rs timestamp, re timestamp",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re"
        ).collect()
    )
    # closed intervals: boundary-touching pairs are matches; every
    # pair appears exactly once despite multi-bucket spans
    assert got == [(1, 100), (1, 200), (2, 300)]


def test_interval_overlap_matches_bruteforce(spark):
    import itertools

    lrows = [
        (i, _t(i % 12, (i * 7) % 60), _t((i % 12) + 2, (i * 13) % 60))
        for i in range(20)
    ]
    rrows = [
        (j, _t(j % 14, (j * 11) % 60), _t((j % 14) + 1, (j * 17) % 60))
        for j in range(15)
    ]
    expect = sorted(
        (l[0], r[0])
        for l, r in itertools.product(lrows, rrows)
        if l[1] <= r[2] and r[1] <= l[2]
    )
    left = _mk(spark, lrows, "lid long, ls timestamp, le timestamp")
    right = _mk(spark, rrows, "rid long, rs timestamp, re timestamp")
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re"
        ).collect()
    )
    assert got == expect
