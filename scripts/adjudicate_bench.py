"""Dedicated perf-fuse adjudication session (the r7/r11 protocol):
fresh session, standard warmup, then median-of-N timed runs for ONLY
the queries under adjudication — no other bench load in the session.

    python scripts/adjudicate_bench.py dedup_winnowing=9 text_ngram_novelty=9

Since r15 the canary-normalized fuse rule (BASELINE.md) is applied
MECHANICALLY (VERDICT r14 #4): the session also times the 6-query
CANARY set to fingerprint this box, loads a reference round artifact
($SPARK_GRAFT_REF_BENCH, default the newest BENCH_full_r*.json), and
emits per query raw + lane-normalized ratios and an open/closed fuse
verdict — UDF-lane queries normalize against uav_pixel_detections,
JVM queries against the 5-query JVM canary total, because the two
lanes provably drift independently (r14 same-day excursion).

Prints one JSON line {"query": {"median": s, "runs": [...],
"raw_ratio": r, "normalized_ratio": n, "lane": ..., "fuse": bool},
"_canary": {...}} suitable for pasting into the BASELINE.md
adjudication table."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench as bench_mod
from uav_streamprocessor_spark import registry
from uav_streamprocessor_spark.session import get_spark


def _median_runs(qmap, spark, sf_dir, name: str, n: int) -> dict:
    if n % 2 == 0:
        n += 1
    qmap[name](spark, sf_dir).collect()  # per-query untimed warmup
    runs: list[float] = []
    for _ in range(n):
        t0 = time.perf_counter()
        qmap[name](spark, sf_dir).collect()
        runs.append(round(time.perf_counter() - t0, 3))
    srt = sorted(runs)
    return {"median": srt[n // 2], "min": srt[0], "max": srt[-1], "runs": runs}


def _reference_artifact() -> tuple[dict, str] | tuple[None, None]:
    env = os.environ.get("SPARK_GRAFT_REF_BENCH")
    root = Path(__file__).resolve().parent.parent
    path = Path(env) if env else None
    if path is None:
        candidates = sorted(root.glob("BENCH_full_r*.json"))
        path = candidates[-1] if candidates else None
    if path is None or not path.exists():
        return None, None
    try:
        return json.loads(path.read_text()), path.name
    except (OSError, json.JSONDecodeError):
        return None, None


def main() -> None:
    targets: dict[str, int] = {}
    for a in sys.argv[1:]:
        name, _, n = a.partition("=")
        targets[name] = max(1, int(n or "9"))
    if not targets:
        raise SystemExit("usage: adjudicate_bench.py query=N [query=N ...]")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="adjudicate")
    qmap = registry.queries()
    # the bench's standard warmup: views + flagship + one pixel pass
    qmap["uav_class_stats"](spark, sf_dir).collect()
    qmap["uav_pixel_detections"](spark, sf_dir).collect()

    # box fingerprint: median-of-3 canary timings for this session
    canary: dict[str, float] = {}
    for name in bench_mod.CANARY:
        canary[name] = _median_runs(qmap, spark, sf_dir, name, 3)["median"]
        print(f"# canary {name}: {canary[name]}s", file=sys.stderr)
    cur_jvm, cur_udf = bench_mod._canary_fingerprints({"canary": canary})

    ref, ref_name = _reference_artifact()

    out: dict[str, dict] = {}
    for name, n in targets.items():
        rec = _median_runs(qmap, spark, sf_dir, name, n)
        refv, ref_jvm, ref_udf, ref_src = (
            bench_mod._source_consistent_reading(ref, name)
            if ref
            else (None, None, None, None)
        )
        if isinstance(refv, (int, float)) and refv > 0 and rec["median"] > 0:
            rec["ref_source"] = ref_src
            lane = "udf" if bench_mod._udf_lane(name) else "jvm"
            cc, pc = (cur_udf, ref_udf) if lane == "udf" else (cur_jvm, ref_jvm)
            rec["lane"] = lane
            rec["ref"] = refv
            rec["raw_ratio"] = round(rec["median"] / refv, 3)
            if cc and pc:
                rec["normalized_ratio"] = round(
                    (rec["median"] / cc) / (refv / pc), 3
                )
            else:
                rec["unnormalized"] = True
            eff = rec.get("normalized_ratio", rec["raw_ratio"])
            rec["fuse"] = bool(
                eff > 1.5 and max(rec["median"], refv) >= 0.2
            )
        print(
            f"# {name}: median {rec['median']}s "
            f"[{rec['min']}..{rec['max']}, n={len(rec['runs'])}]"
            + (
                f" raw {rec.get('raw_ratio')}x norm "
                f"{rec.get('normalized_ratio', 'n/a')}x vs {ref_name} -> "
                + ("FUSE OPEN" if rec.get("fuse") else "closed")
                if "raw_ratio" in rec
                else ""
            ),
            file=sys.stderr,
        )
        out[name] = rec
    ref_by_source = bench_mod._source_canaries(ref) if ref else {}
    out["_canary"] = {
        "timings": canary,
        "jvm": cur_jvm,
        "udf": cur_udf,
        "ref_artifact": ref_name,
        "ref_by_source": {
            s: {"jvm": c[0], "udf": c[1]} for s, c in ref_by_source.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
