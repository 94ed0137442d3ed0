"""The distributed leftmost-merge PAV must equal the classic stack
PAV: the isotonic fit is the unique fixpoint of adjacent-violator
merging, so the two schedules converge to the same pools."""

import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

from type_filtered_entity_linker_spark.operators.isotonic import (
    isotonic_calibrate,
)


def ref_pav(rows):
    """Classic stack PAV over (idx, n, t) ascending; returns
    {idx: (pool_lo, calibrated_rate)}."""
    stack = []  # (lo_idx, members, sn, st)
    for idx, n, t in rows:
        stack.append((idx, [idx], n, t))
        while len(stack) >= 2:
            lo2, m2, n2, t2 = stack[-1]
            lo1, m1, n1, t1 = stack[-2]
            if t1 / n1 > t2 / n2:
                stack[-2:] = [(lo1, m1 + m2, n1 + n2, t1 + t2)]
            else:
                break
    out = {}
    for lo, members, sn, st_ in stack:
        for idx in members:
            out[idx] = (lo, round(st_ / sn, 6))
    return out


BANDS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=50),   # n_pairs
        st.integers(min_value=0, max_value=50),   # n_true raw
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(BANDS)
def test_pav_matches_stack_reference(spark, raw):
    rows = [(i, n, min(t, n)) for i, (n, t) in enumerate(raw)]
    df = spark.createDataFrame(
        rows, "band_idx long, n_pairs long, n_true long"
    )
    got = {
        r.band_idx: (r.pool, r.calibrated_rate)
        for r in isotonic_calibrate(df).collect()
    }
    assert got == ref_pav(rows)


def test_pav_hand_example_backmerge(spark):
    # rates 0.2, 0.8, 0.4, 0.5: the (0.8, 0.4) violation pools to 0.6,
    # which then violates against... nothing on the left (0.2 < 0.6)
    # but 0.6 > 0.5 on the right -> pools again to ~0.566 — exercises
    # the cascade a single merge pass would miss
    rows = [(0, 10, 2), (1, 10, 8), (2, 10, 4), (3, 10, 5)]
    df = spark.createDataFrame(
        rows, "band_idx long, n_pairs long, n_true long"
    )
    out = {r.band_idx: r for r in isotonic_calibrate(df).collect()}
    assert out[0].calibrated_rate == 0.2
    assert (
        out[1].calibrated_rate
        == out[2].calibrated_rate
        == out[3].calibrated_rate
        == round(17 / 30, 6)
    )
    assert out[1].pool == out[2].pool == out[3].pool == 1
    # monotone by construction
    rates = [out[i].calibrated_rate for i in range(4)]
    assert rates == sorted(rates)


def test_pav_raises_on_round_exhaustion(spark):
    # strictly decreasing rates need n-1 merges; max_rounds=1 must
    # raise rather than return a still-decreasing "calibrated" curve
    import pytest

    rows = [(0, 10, 9), (1, 10, 6), (2, 10, 3), (3, 10, 0)]
    df = spark.createDataFrame(
        rows, "band_idx long, n_pairs long, n_true long"
    )
    with pytest.raises(RuntimeError, match="PAV fixpoint"):
        isotonic_calibrate(df, max_rounds=1)
    out = {r.band_idx: r.calibrated_rate for r in isotonic_calibrate(df).collect()}
    assert out == {i: 0.45 for i in range(4)}
