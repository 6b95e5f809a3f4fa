#!/usr/bin/env python
"""spark-submit smoke job: prove the library runs from a --py-files zip.

No sys.path manipulation — ``record_matcher_spark`` must be importable
solely from the archive spark-submit ships to driver and executors
(executors hit it through the pandas-UDF scorer: the jaro_winkler kernel
deserializes by module reference inside Python workers).

    spark-submit --master 'local[4]' \
        --py-files dist/record_matcher_spark.zip scripts/submit_smoke.py \
        [sf_dir]

Prints one JSON line {"rows": N, "statuses": {...}} on success.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.appName("rm-spark-submit-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from record_matcher_spark.config import ColumnRule, MatchConfig
    from record_matcher_spark.operators.resolve import resolve_matches
    from record_matcher_spark.operators.scoring import score_pairs

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    y = cust.select(
        F.col("c_custkey").alias("row_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nk"),
    )
    x = y.select(
        "row_id",
        F.when(
            F.col("row_id") % 5 == 0,
            F.concat(F.substring("name", 1, 12), F.lit("~x")),
        ).otherwise(F.col("name")).alias("name"),
        "nk",
    )
    cfg = MatchConfig(
        rules=(
            ColumnRule("name", ("name",), scorer="jaro_winkler",
                       threshold=90.0),
        ),
        columns_to_group={"nk": "nk"},
    )
    res = resolve_matches(x, y, score_pairs(x, y, cfg), cfg)
    counts = {
        r["match_status"]: r["n"]
        for r in res.groupBy("match_status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(json.dumps({"rows": sum(counts.values()), "statuses": counts}))
    spark.stop()


if __name__ == "__main__":
    main()
