"""Dedicated perf-fuse adjudication session (the r7/r11 protocol):
fresh session, standard warmup, then median-of-N timed runs for ONLY
the queries under adjudication — no other bench load in the session.

    python scripts/adjudicate_bench.py dedup_winnowing=9 text_ngram_novelty=9

Prints one JSON line {"query": {"median": s, "runs": [...]}} suitable
for pasting into the BASELINE.md adjudication table."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from uav_streamprocessor_spark import registry
from uav_streamprocessor_spark.session import get_spark


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

    out: dict[str, dict] = {}
    for name, n in targets.items():
        if n % 2 == 0:
            n += 1
        qmap[name](spark, sf_dir).collect()  # per-query untimed warmup
        runs: list[float] = []
        for _ in range(n):
            t0 = time.perf_counter()
            qmap[name](spark, sf_dir).collect()
            runs.append(round(time.perf_counter() - t0, 3))
        srt = sorted(runs)
        out[name] = {"median": srt[n // 2], "min": srt[0], "max": srt[-1],
                     "runs": runs}
        print(f"# {name}: median {srt[n // 2]}s [{srt[0]}..{srt[-1]}, n={n}]",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
