"""Plan audit: print formatted physical plans for the headline queries and
flag scale anti-patterns (missing pushdown, unexpected shuffles, missing
broadcast, codegen gaps). Run: python scripts/audit_plans.py [sf_dir]."""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from uav_streamprocessor_spark import registry
from uav_streamprocessor_spark.session import get_spark

AUDIT = [
    "uav_keyframe_decimation",
    "uav_class_stats",
    "uav_frames_detections_join",
    "uav_segment_stats",
    "tpch_q1_pricing",
    "tpch_q3_priority",
    "tpch_q5_region_revenue",
    "tpch_q21_waiting_suppliers",
    "ev_hourly_tumbling",
    "dedup_docs_exact",
    "emb_knn_bruteforce",
    "emb_hard_negatives",
    "text_sequence_packing",
    "text_substring_dup_spans",
    # round-7 additions
    "dedup_split_leakage",
    "text_source_overlap",
    "dedup_containment",
    "rel_compaction_plan",
    "ev_mad_outliers",
    "emb_cosine_histogram",
    "ev_bounce_rate",
    "text_chunk_manifest",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan_audit", master="local[4]", shuffle_partitions=4)
    qmap = {s.name: s.build for s in registry.all_specs()}
    for name in AUDIT:
        df = qmap[name](spark, sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        n_codegen = len(set(re.findall(r"codegen id : (\d+)", plan)))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        print(f"\n{'='*70}\n{name}: exchanges={n_exchange} bhj={n_bhj} "
              f"smj={n_smj} codegen_spans={n_codegen}")
        for p in pushed[:4]:
            print(f"  PushedFilters: [{p[:100]}]")
        if "--full" in sys.argv:
            print(plan)


if __name__ == "__main__":
    main()
