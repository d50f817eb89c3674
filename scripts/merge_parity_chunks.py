"""Merge the 4 sf0.1 chunk reports into PARITY_sf0.1_full.json."""
import json

queries, fails = {}, []
n_ok = n_rows_only = 0
for i in range(4):
    d = json.load(open(f"/tmp/PARITY_sf0.1_chunk_{i}.json"))
    queries.update(d["queries"])
    fails += d["fails"]
    n_ok += d["n_oracle_matched"]
    n_rows_only += d["n_rows_only"]
out = {
    "sf_dir": "/root/testdata/sf0.1",
    "n_queries": len(queries),
    "n_oracle_matched": n_ok,
    "n_rows_only": n_rows_only,
    "fails": fails,
    "note": (
        "round-12 FULL-registry sweep at 10x the driver scale factor over "
        "the current registry state (287 queries: the r12 promotions "
        "emb_kcenter_sample / emb_mmr_rerank / dedup_lsh_tuning / "
        "dedup_minhash_estimate / text_distinct_ngrams_approx / "
        "emb_ann_tuning_curve, the new emb_ivfpq_recall_bound contract, "
        "the deterministic integer-cent ev_diff_in_diff, and "
        "emb_ivf_full_probe which missed the r11 sweep), run in 4 chunks "
        "back-to-back."
    ),
    "queries": queries,
}
with open("/root/repo/PARITY_sf0.1_full.json", "w") as fh:
    json.dump(out, fh, indent=1)
print(f"MERGED: {len(queries)} queries, {n_ok} matched, "
      f"{n_rows_only} rows-only, fails={fails}")
