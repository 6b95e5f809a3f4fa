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

    Window count over the value — one shuffle on the column; at scale a hot
    value lands in one partition, acceptable because the downstream is a
    filter, not a fat aggregation. (The reference's own test calls a stale
    name ``records.duplicated``, tests/test_records.py:57 — renamed at
    records.py:135.)
    """
    s = blank_coalesce(F.col(column))
    w = Window.partitionBy(s)
    return (
        df.withColumn("__rm_dup_n", F.when(s != "", F.count(F.lit(1)).over(w)))
        .where(F.col("__rm_dup_n") > 1)
        .drop("__rm_dup_n")
    )
