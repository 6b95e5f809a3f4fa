"""Replicates the driver's correctness gate locally: run each
__spark_entry__ query on Spark AND its oracle SQL on DuckDB over the same
parquet tables; compare row count, column names, and values exactly
(sorted columns + order-insensitive rows, like the driver's value hash)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("RM_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = entry_mod.TABLES


def _duck_con():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _normalize(rows, columns):
    """Sort columns by name, then rows — mirrors an order-insensitive
    value comparison."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append(tuple(row[i] for i in order))
    return sorted(
        out,
        key=lambda r: tuple(
            (v is None, str(type(v)), str(v)) for v in r
        ),
    )


def _values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        return (
            math.isclose(float(a), float(b), rel_tol=0, abs_tol=0)
            or a == b
        )
    return str(a) == str(b)


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # rows-only contract (non-SQL-expressible op): runs and yields rows
        assert q(spark, SF_DIR).count() > 0
        return

    sdf = q(spark, SF_DIR)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _duck_con()
    res = con.execute(sql)
    d_cols = [d[0].lower() for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (s_cols, d_cols)
    assert len(s_rows) == len(d_rows), f"{name}: {len(s_rows)} vs {len(d_rows)}"

    sn = _normalize(s_rows, s_cols)
    dn = _normalize(d_rows, d_cols)
    mismatches = []
    for i, (sr, dr) in enumerate(zip(sn, dn)):
        for sv, dv in zip(sr, dr):
            if not _values_equal(sv, dv):
                mismatches.append((i, sr, dr))
                break
        if len(mismatches) > 4:
            break
    assert not mismatches, f"{name}: first mismatches: {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n >= 0
    assert "match_status" in df.columns
