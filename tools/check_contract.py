#!/usr/bin/env python
"""Driver-gate simulator: run every __spark_entry__.queries() entry on
Spark AND its oracle_sql() on DuckDB at sf0.01; compare row count,
column names, and a canonical value hash (columns sorted by name, rows
sorted, floats rounded to 6 significant-ish decimals as strings).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        df[c] = df[c].astype(str)
    rows = sorted(map(tuple, df.itertuples(index=False, name=None)))
    h = hashlib.md5(repr(rows).encode()).hexdigest()[:16]
    return len(rows), cols, h


def main() -> int:
    import __spark_entry__ as entry
    from search_engine_spark.runtime import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only check, {len(sdf)} rows")
            if len(sdf) == 0:
                failures.append(name)
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        sn, sc, sh = canon(sdf)
        on_, oc, oh = canon(odf)
        status = "ok  " if (sn, sc, sh) == (on_, oc, oh) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{status} {name}: spark({sn},{sh}) duck({on_},{oh}) cols "
              f"{'==' if sc == oc else f'{sc} vs {oc}'}")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
