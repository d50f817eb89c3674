"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over uav_streamprocessor_spark.registry — every operator from
SURVEY.md §2 registers there with a builder + (where SQL-expressible) a
DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from uav_streamprocessor_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-class detection count
    and confidence stats on keyframes (SURVEY.md §7 M1)."""
    return registry.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
