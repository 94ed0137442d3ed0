"""Replicates the driver's correctness gate locally: every queries()
entry vs its oracle_sql() in DuckDB on /root/testdata/sf0.001
(row count + column set + order-insensitive values)."""

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"mention_key", "cluster_id"}


def test_every_query_has_callable_and_an_oracle():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) >= 20
    assert set(os_) <= set(qs)
    # round 2: EVERY query is exactly oracle-checked — SimHash via the
    # md5-rekeyed SQL replica, LSH-ANN via literal-hyperplane SQL
    assert set(qs) - set(os_) == set()


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_parity(spark, duck, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF).toPandas()
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(sdf) >= 0  # rows-only: runs and has a stable schema
        return
    odf = duck.sql(oracle).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)}"
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            # NULL-aware: a legitimately NULL metric (e.g. robust_z at
            # MAD 0) must align on BOTH sides; NaN-blind subtraction
            # would turn agreeing NULLs into a failing NaN <= 1e-9
            av, bv = a[c].astype(float), b[c].astype(float)
            assert (av.isna() == bv.isna()).all(), f"{name}.{c} nulls"
            mask = ~av.isna()
            if mask.any():
                assert (
                    av[mask] - bv[mask]
                ).abs().max() <= 1e-9, f"{name}.{c}"
        else:
            assert a[c].astype(str).eq(b[c].astype(str)).all(), f"{name}.{c}"
