"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed over a full execution (collect of a bounded result —
aggregates/top-k, so driver transfer is negligible). A warmup query runs
first so JVM/codegen startup isn't attributed to the first measurement.

Each headline query runs $SPARK_GRAFT_BENCH_RUNS times (default 3) and
reports the MEDIAN — BASELINE.md documents a 17-23s container-noise band
on single runs, so medians are what make round-over-round comparisons
trustworthy. Per-query min/max land in "spread" (stderr + JSON) so noisy
queries are visible; "value"/"queries" stay median-based and
schema-compatible with earlier rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from uav_streamprocessor_spark import registry
from uav_streamprocessor_spark.session import get_spark

# headline set: the flagship + one representative per operator family
HEADLINE = [
    "uav_class_stats",          # flagship: filter+groupBy on detections
    "uav_frames_detections_join",  # equi-join + agg
    "uav_segment_stats",        # broadcast range join
    "uav_detection_rank",       # window rank
    "tpch_q1_pricing",          # wide aggregation
    "tpch_q3_priority",         # 3-way join + top-k
    "tpch_q5_region_revenue",   # 5-way join
    "ev_session_windows",       # session windows
    "dedup_docs_exact",         # hash dedup
    "dedup_minhash_neardups",   # minhash LSH + verify
    "dedup_simhash_neardups",   # banded simhash + hamming verify
    "text_tfidf_top_terms",     # explode + two-level agg
    "emb_knn_bruteforce",       # vector top-k
    "emb_ann_lsh",              # hyperplane-LSH ANN (multi-probe)
    "uav_pixel_detections",     # Arrow UDF pixel hot path
    # r3 breadth (VERDICT r2 #7): the heavier join/agg paths
    "ev_asof_clicks_views",     # as-of join (time-bounded backward match)
    "tpch_q18_large_volume",    # fact-fact agg + semi-join HAVING
    "tpch_q8_market_share",     # 6-way join + conditional agg
    # r3 additions: iterative + LM-join paths
    "dedup_doc_clusters",       # blocking graph -> iterative hash-min CC
    "text_unigram_cross_entropy",  # corpus-LM token join
    "emb_kmeans_profile",       # iterative Lloyd (Arrow partial-sum update)
    "text_curation_funnel",     # end-to-end dedup->quality->decontam->split
    # r4 (VERDICT r3 #8): heaviest TPC-H join chain
    "tpch_q21_waiting_suppliers",  # 4-way fact join + exists/not-exists
    # r4 additions: training-batch assembly + substring-dedup approximation
    "text_sequence_packing",       # per-shard cumsum packing window
    "text_substring_dup_spans",    # tuple-hashed 8-gram span coverage
]

# Retired to a quarterly rotation (VERDICT r3 #8): consistently sub-0.25s at
# sf0.1, so they cost headline slots without moving the total. Re-measured
# when SPARK_GRAFT_BENCH_FULL=1.
ROTATION = [
    "rel_orders_rollup",        # grouping sets
    "ev_hourly_tumbling",       # time windows
    "text_stratified_downsample",  # sampling path (hash-deterministic)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.removeprefix("sf") or "0.1")
    spark = get_spark(app_name="bench")

    qmap = registry.queries()
    # warmup: build views + run the flagship once (JVM/codegen warm), then
    # one pixel-path pass so Python worker + DataSource startup (a per-
    # session cost, ~6s) isn't attributed to the first UDF measurement
    qmap["uav_class_stats"](spark, sf_dir).collect()
    qmap["uav_pixel_detections"](spark, sf_dir).collect()

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    headline = HEADLINE + (
        ROTATION if os.environ.get("SPARK_GRAFT_BENCH_FULL") == "1" else []
    )
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in headline:
        runs: list[float] = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = qmap[name](spark, sf_dir)
            n = df.count() if name.startswith("uav_keyframe") else len(df.collect())
            runs.append(round(time.perf_counter() - t0, 3))
        runs.sort()
        timings[name] = runs[len(runs) // 2]  # median
        spread[name] = [runs[0], runs[-1]]
        print(
            f"# {name}: median {timings[name]}s "
            f"[{runs[0]}..{runs[-1]}, n={n_runs}] ({n} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "runs_per_query": n_runs,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
