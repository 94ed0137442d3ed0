"""Property-based pins for the wave-7/9 exactness claims:
spatial_block_join equals the brute-force distance join on arbitrary
integer point sets (the grid probe's exact-recall guarantee), and
winnowing's shared-run guarantee holds for generated token runs."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from type_filtered_entity_linker_spark.operators.dedup import (
    winnowing_fingerprints,
)
from type_filtered_entity_linker_spark.operators.spatial import (
    spatial_block_join,
)

POINTS = st.lists(
    st.tuples(
        st.integers(min_value=-20, max_value=20),
        st.integers(min_value=-20, max_value=20),
    ),
    min_size=2,
    max_size=12,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(POINTS, st.integers(min_value=1, max_value=7))
def test_spatial_block_join_equals_brute_force(spark, pts, radius):
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "rec_id long, x long, y long")
    got = {
        (r["id_a"], r["id_b"]): r["dist_sq"]
        for r in spatial_block_join(df, radius).collect()
    }
    want = {}
    for i, (xa, ya) in enumerate(pts):
        for j, (xb, yb) in enumerate(pts):
            if i < j:
                d2 = (xa - xb) ** 2 + (ya - yb) ** 2
                if d2 <= radius * radius:
                    want[(i, j)] = d2
    assert got == want


WORDS = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg"]),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(WORDS, WORDS, WORDS)
def test_winnowing_guarantee_property(spark, head, tail, other):
    # the guarantee: a shared run of >= window + k - 1 = 6 tokens
    # always yields a shared fingerprint between the two docs
    shared = ["s1", "s2", "s3", "s4", "s5", "s6"]
    d1 = " ".join(head + shared + tail)
    d2 = " ".join(other + shared)
    docs = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id long, text string"
    )
    fps = winnowing_fingerprints(docs).collect()
    s1 = {r["fp"] for r in fps if r["doc_id"] == 1}
    s2 = {r["fp"] for r in fps if r["doc_id"] == 2}
    assert s1 & s2
