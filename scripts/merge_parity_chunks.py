"""Merge the 4 sf0.1 chunk reports into PARITY_sf0.1_full.json.

The `note` names the generating round via $SPARK_GRAFT_ROUND (ADVICE/
VERDICT r15 nit: a hardcoded round description goes stale the moment a
later sweep reuses the template)."""
import json
import os

queries, fails = {}, []
n_ok = n_rows_only = 0
for i in range(4):
    d = json.load(open(f"/tmp/PARITY_sf0.1_chunk_{i}.json"))
    queries.update(d["queries"])
    fails += d["fails"]
    n_ok += d["n_oracle_matched"]
    n_rows_only += d["n_rows_only"]
rnd = os.environ.get("SPARK_GRAFT_ROUND", "unknown")
out = {
    "sf_dir": "/root/testdata/sf0.1",
    "n_queries": len(queries),
    "n_oracle_matched": n_ok,
    "n_rows_only": n_rows_only,
    "fails": fails,
    "note": (
        f"round-{rnd} FULL-registry sweep at 10x the driver scale factor "
        f"over the registry state at sweep time ({len(queries)} queries), "
        "run in 4 back-to-back single-session chunks "
        "(scripts/sweep_sf01_full.sh)."
    ),
    "queries": queries,
}
with open("/root/repo/PARITY_sf0.1_full.json", "w") as fh:
    json.dump(out, fh, indent=1)
print(f"MERGED: {len(queries)} queries, {n_ok} matched, "
      f"{n_rows_only} rows-only, fails={fails}")
