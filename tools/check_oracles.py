"""Local emulation of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and an order-insensitive value hash (doubles rounded to 9
significant-ish decimals the same way on both sides).

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from surya_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        s = df[c]
        if s.dtype == "float64" or s.dtype == "float32":
            df[c] = s.astype("float64").round(9)
        elif str(s.dtype).startswith("datetime"):
            df[c] = s.astype(str)
        elif s.dtype == object:
            df[c] = s.astype(str)
    rows = sorted(
        df.itertuples(index=False, name=None),
        key=lambda r: tuple(str(x) for x in r),
    )
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return len(rows), cols, h


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app="oracle_check", cores=8, shuffle_partitions=8,
                      driver_memory="8g")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only check) "
                  f"[{time.time()-t0:.1f}s]")
            if len(sdf) == 0:
                failures.append(name)
                print(f"WARN  {name}: zero rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {str(e)[:300]}")
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        ok = (sn, sc, sh) == (on, oc, oh)
        status = "OK   " if ok else "FAIL "
        print(f"{status}{name}: spark {sn} rows, oracle {on} rows, "
              f"cols {'=' if sc == oc else f'{sc} vs {oc}'}, "
              f"hash {'=' if sh == oh else 'MISMATCH'} [{time.time()-t0:.1f}s]")
        if not ok:
            failures.append(name)
            if sc == oc and sn and on:
                merged = sdf[sorted(sdf.columns)].round(6).merge(
                    odf[sorted(odf.columns)].round(6), how="outer",
                    indicator=True)
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(6).to_string())
    print("\nSUMMARY:", "ALL OK" if not failures else f"failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
