"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's canonical e2e
export query shape: shim filter -> citation counts,
tests/idigbio_workers/lib/test_download.py:13-15) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the full operator catalog from
idb_backend_spark.plans.catalog, one entry per implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from idb_backend_spark.plans.catalog import ORACLE, Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: shim-compiled filter + per-recordset citation counts
    (the reference's dataset-download path, SURVEY §3.1) on sf0.001."""
    from pyspark.sql import functions as F

    from idb_backend_spark.operators.aggregates import hit_counts
    from idb_backend_spark.query.shim import compile_shim

    sf_dir = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pred = compile_shim(
        {"o_orderstatus": "O", "o_totalprice": {"gte": 50000}}
    )
    return hit_counts(
        orders.withColumn("recordset", F.col("o_custkey")), pred, "recordset"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
