"""Cluster-shaped entry point: run the flagship extraction via
``spark-submit --py-files dist/icdar_2019_rrc_sroie_spark.zip`` (north
rule). The engine package is imported from the shipped zip, NOT from
the repo working directory — this script must run from anywhere.

    spark-submit --master <cluster> \
        --py-files dist/icdar_2019_rrc_sroie_spark.zip \
        tools/submit_job.py <transcripts_parquet> <out_dir> [snapshot_id]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main(in_path: str, out_dir: str, snapshot_id: str = "snap-1") -> None:
    spark = SparkSession.builder.appName("spark-extract").getOrCreate()
    # imported from the --py-files zip on the executors AND driver
    from icdar_2019_rrc_sroie_spark.plans.lineage import (
        lineage_table,
        run_with_resume,
    )

    t0 = time.time()
    transcripts = spark.read.parquet(in_path)
    spans = run_with_resume(spark, transcripts, out_dir, snapshot_id)
    n = spans.count()
    wall = time.time() - t0
    lineage_rows = lineage_table(spark, out_dir).count()
    print(json.dumps({
        "spans": n,
        "lineage_rows": lineage_rows,
        "wall_sec": round(wall, 2),
        "snapshot_id": snapshot_id,
    }))
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
