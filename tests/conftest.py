from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from uav_streamprocessor_spark.session import get_spark

    s = get_spark(
        app_name="tests",
        master="local[8]",
        shuffle_partitions=8,
        # static conf: must be set at session build (bucketed-table tests)
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark_wh_")},
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    yield con
