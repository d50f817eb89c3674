"""SQL API ≡ DataFrame API: the registry's ANSI oracle strings (written
for DuckDB) also run unchanged in Spark SQL and must match the DataFrame
plans row-for-row. Portable SQL across THREE engines (Spark DataFrame,
Spark SQL, DuckDB) is the strongest correctness triangulation available.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from uav_streamprocessor_spark import registry, sql_api

# oracle strings that are engine-portable (no DuckDB-only functions like
# epoch/unnest/string_agg/printf/json_extract_string/TRY_CAST text form)
PORTABLE = [
    "uav_keyframe_decimation",
    "uav_frame_counters",
    "uav_letterbox_geometry",
    "uav_detections_filtered",
    "uav_class_stats",
    "uav_frames_detections_join",
    "uav_frames_without_detections",
    "uav_segment_stats",
    "uav_detection_rank",
    "uav_box_original_coords",
    "tpch_q1_pricing",
    "tpch_q5_region_revenue",
    "tpch_q6_forecast",
    "rel_orders_rollup",
    "rel_price_histogram",
    "rel_union_orders",
    "rel_above_avg_balance",
    "dedup_docs_exact",
    "uav_fps_fallback",
    "uav_detection_lag",
    # round-2 additions
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q10_returned_items",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q18_large_volume",
    "tpch_q19_disjunctive",
    "tpch_q22_sales_opportunity",
    "rel_grouping_sets",
    "rel_unpivot_rates",
    "rel_salted_join",
    "ev_salted_agg",
    "rel_string_functions",
    "tpch_q13_customer_distribution",
    "uav_fps_null_semantics",
]

SPECS = {s.name: s for s in registry.all_specs()}


@pytest.mark.parametrize("name", PORTABLE)
def test_sql_equals_dataframe(name, spark):
    spec = SPECS[name]
    df_rows = sorted(map(repr, spec.build(spark, SF_SMALL).collect()))
    sql_df = sql_api.sql(spark, SF_SMALL, spec.oracle)
    sql_rows = sorted(map(repr, sql_df.collect()))
    # row-level comparison modulo column order
    assert len(df_rows) == len(sql_rows)
    df_vals = sorted(
        sorted(repr(v) for v in r.asDict().values())
        for r in spec.build(spark, SF_SMALL).collect()
    )
    sql_vals = sorted(
        sorted(repr(v) for v in r.asDict().values()) for r in sql_df.collect()
    )
    assert df_vals == sql_vals
