"""Dev check: fixture CTEs produce identical rows in Spark and DuckDB."""
import sys

sys.path.insert(0, "/root/repo")

import duckdb

from uav_streamprocessor_spark.fixtures import register_uav_views, with_fixture_ctes
from uav_streamprocessor_spark.session import get_spark

SF = "/root/testdata/sf0.001"

spark = get_spark(master="local[4]", shuffle_partitions=4)
register_uav_views(spark, SF)

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def compare(name, select_sql):
    s_rows = [tuple(r) for r in spark.sql(select_sql).collect()]
    d_rows = [tuple(r) for r in con.sql(with_fixture_ctes(select_sql)).fetchall()]
    s_rows.sort(key=repr)
    d_rows.sort(key=repr)
    ok = s_rows == d_rows
    print(f"{name}: spark={len(s_rows)} duck={len(d_rows)} match={ok}")
    if not ok:
        for a, b in zip(s_rows[:5], d_rows[:5]):
            if a != b:
                print("  spark:", a)
                print("  duck :", b)
        sys.exit(1)


compare("frames", "SELECT * FROM frames")
compare("keyframes", "SELECT * FROM keyframes")
compare("detections", "SELECT * FROM detections")
compare("segments", "SELECT * FROM segments")
print("all fixture CTEs parity-OK")
