"""Run every __spark_entry__ query against its DuckDB oracle (driver twin).

Replicates the per-round driver gate locally: for each ``queries()`` entry
with an ``oracle_sql()`` twin, run both at the given scale factor, sort
columns by name, sort rows, and compare row counts, schemas (column-name
sets), and values. Queries without an oracle get a rows-only check.

Usage: python scripts/check_driver_contract.py [sf_dir] [cores] [query ...]
  defaults: /root/testdata/sf0.01, 8 cores, all queries
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    only = set(sys.argv[3:])

    import duckdb

    import __spark_entry__ as entry
    from record_matcher_spark.session import get_spark

    spark = get_spark(
        app_name="driver-contract-check",
        master=f"local[{cores}]",
        shuffle_partitions=16,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in osql:
            ok = len(sdf) >= 0
            print(f"rows-only {name}: {len(sdf)} rows "
                  f"({time.perf_counter() - t0:.1f}s)")
            continue
        odf = con.execute(osql[name]).df()
        cols = sorted(sdf.columns)
        if cols != sorted(odf.columns):
            failures.append(name)
            print(f"FAIL {name}: schema {cols} != {sorted(odf.columns)}")
            continue
        s = sdf[cols].astype(str).sort_values(cols).reset_index(drop=True)
        o = odf[cols].astype(str).sort_values(cols).reset_index(drop=True)
        if len(s) != len(o):
            failures.append(name)
            print(f"FAIL {name}: rows {len(s)} != {len(o)}")
            continue
        if not s.equals(o):
            failures.append(name)
            diff = (s != o).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())} differing rows; first:")
            print(s[diff].head(2))
            print(o[diff].head(2))
            continue
        print(f"ok   {name}: {len(s)} rows "
              f"({time.perf_counter() - t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
