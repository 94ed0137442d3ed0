"""Simulate the driver's correctness gate: run every __spark_entry__
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count, column names, and a value hash (columns sorted by
name, rows sorted, floats rounded)."""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entry
from type_filtered_entity_linker_spark.session import spark_session

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: json.dumps(v, default=str, sort_keys=True)
                if isinstance(v, (list, dict, tuple)) or hasattr(v, "tolist")
                else v
            )
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def main():
    only = sys.argv[1:] or None
    spark = spark_session(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, osql = entry.queries(), entry.oracle_sql()
    results = {}
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            results[name] = f"SPARK FAIL: {ex}"
            continue
        if name not in osql:
            results[name] = f"rows-only ({len(sdf)} rows)"
            continue
        try:
            ddf = con.execute(osql[name]).df()
        except Exception as ex:
            results[name] = f"ORACLE FAIL: {ex}"
            continue
        rc = len(sdf) == len(ddf)
        sc = sorted(map(str.lower, sdf.columns)) == sorted(map(str.lower, ddf.columns))
        sdf.columns = [c.lower() for c in sdf.columns]
        ddf.columns = [c.lower() for c in ddf.columns]
        vh = canon(sdf) == canon(ddf) if (rc and sc) else False
        results[name] = (
            "OK"
            if (rc and sc and vh)
            else f"rows={rc}({len(sdf)}/{len(ddf)}) schema={sc} hash={vh} "
            f"cols spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
        )
    for k, v in results.items():
        print(f"{k:28s} {v}")
    bad = [k for k, v in results.items() if v not in ("OK",) and not v.startswith("rows-only")]
    print(f"\n{len(results) - len(bad)}/{len(results)} ok; bad: {bad}")
    spark.stop()


if __name__ == "__main__":
    main()
