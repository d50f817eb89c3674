"""SQL entry point — run ANSI SQL against the engine's registered tables.

The reference has no query language (pipelines are hard-wired Python,
SURVEY.md §3); the engine gets one for free from Spark SQL: register the
corpus + derived UAV views, then `sql()` anything. Catalyst produces the
same plans as the DataFrame API, which tests assert by running several
registry oracle strings through BOTH paths and comparing results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from uav_streamprocessor_spark.fixtures import register_uav_views


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run SQL over: region nation customer supplier part orders lineitem
    events documents embeddings + derived frames/keyframes/detections/
    segments (fixtures.py)."""
    register_uav_views(spark, sf_dir)
    return spark.sql(query)
