"""Converters between the oracle's dict-of-dicts records and DataFrames."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

Records = dict[int, dict[str, Any]]

ID = "row_id"


def records_to_df(spark: SparkSession, records: Records) -> DataFrame:
    """dict-of-dicts → DataFrame with a ``row_id`` long column.

    All values are string-cast (the reference's everything-is-str model,
    matcher.py:78-81); missing keys become NULL.
    """
    columns = sorted({c for r in records.values() for c in r})
    schema = StructType(
        [StructField(ID, LongType(), False)]
        + [StructField(c, StringType(), True) for c in columns]
    )
    rows = [
        tuple(
            [int(i)]
            + [str(r[c]) if (c in r and r[c] is not None) else None for c in columns]
        )
        for i, r in records.items()
    ]
    return spark.createDataFrame(rows, schema)


def df_to_records(df: DataFrame, id_col: str = ID) -> Records:
    out: Records = {}
    for row in df.collect():
        d = row.asDict()
        i = d.pop(id_col)
        out[i] = d
    return out


def stringify_records(records: Records) -> Records:
    """Mirror records_to_df's string coercion for the oracle side."""
    return {
        i: {c: (None if v is None else str(v)) for c, v in r.items()}
        for i, r in records.items()
    }
