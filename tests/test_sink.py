"""S8/X7 sink tests: partitioned layout, file-size bounding, clustering."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from idb_backend_spark.export.sink import compact, write_index_table


def test_write_index_table_layout(spark, tmp_path):
    df = spark.range(0, 10000).select(
        F.col("id").alias("uuid"),
        F.when(F.col("id") % 3 == 0, "records")
        .otherwise("mediarecords")
        .alias("type"),
        (F.col("id") % 100).alias("recordset"),
    )
    path = str(tmp_path / "idx")
    write_index_table(
        df,
        path,
        partition_by=["type"],
        cluster_by=["recordset"],
        max_records_per_file=1000,
    )
    # hive layout with both partitions
    parts = {p.split("=")[-1].split("/")[0]
             for p in glob.glob(f"{path}/type=*")}
    assert parts == {"records", "mediarecords"}
    # file sizes bounded: >= ceil(rows/1000) files per partition overall
    files = glob.glob(f"{path}/type=*/part-*.parquet")
    assert len(files) >= 10
    # roundtrip + partition pruning
    back = spark.read.parquet(path)
    assert back.count() == 10000
    plan = (
        back.filter(F.col("type") == "records")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(type" in plan


def test_compact_reduces_partitions(spark):
    df = spark.range(0, 1000).repartition(64)
    assert compact(df, 4).rdd.getNumPartitions() == 4
