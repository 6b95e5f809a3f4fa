"""Standalone record utilities (reference O1, O4-standalone, O5).

The reference ships three helpers outside the matcher loop
(/root/reference/record_matcher/records.py); here they are as DataFrame
transformations.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from record_matcher_spark.functions.scorers import blank_coalesce


def column_names(df: DataFrame) -> set[str]:
    """O1 (records.py:33-46): free in Spark — the schema is fixed at ingest."""
    return set(df.columns)


def group_by_values(df: DataFrame, column_values: Mapping[str, object]) -> DataFrame:
    """O4 standalone (records.py:106-132): rows where every mapped column
    string-equals the given value (missing ≡ '')."""
    out = df
    for column, value in column_values.items():
        out = out.where(blank_coalesce(F.col(column)) == F.lit("" if value is None else str(value)))
    return out


def duplicated_by_column(df: DataFrame, column: str) -> DataFrame:
    """O5 (records.py:135-153): rows whose non-blank value in ``column``
    occurs more than once.

    groupBy + left-semi join instead of a value-partitioned window: the
    aggregate combines map-side (a hot value arrives at its reducer as a
    handful of partial counts, not all its rows), and the join back is a
    plain equi-join AQE can broadcast or skew-split — no single task ever
    holds a hot value's full row set. (The reference's own test calls a
    stale name ``records.duplicated``, tests/test_records.py:57 — renamed
    at records.py:135.)
    """
    s = blank_coalesce(F.col(column))
    dup_vals = (
        df.select(s.alias("__rm_dup_v"))
        .where(F.col("__rm_dup_v") != "")
        .groupBy("__rm_dup_v")
        .agg(F.count(F.lit(1)).alias("__rm_dup_n"))
        .where(F.col("__rm_dup_n") > 1)
        .select("__rm_dup_v")
    )
    return (
        df.join(dup_vals, s == F.col("__rm_dup_v"), "left_semi")
    )
