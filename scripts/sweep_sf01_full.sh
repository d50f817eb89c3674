#!/bin/bash
# Full-registry parity sweep at sf0.1 in 4 PARITY_SUBSET chunks
# (one Spark session per chunk keeps peak memory bounded), merged into
# PARITY_sf0.1_full.json by merge_parity_chunks.py.
set -u
cd /root/repo
CHUNKS=4
# Stamp the generating round into the merged note (ADVICE r17: the r17
# sweep ran without $SPARK_GRAFT_ROUND and recorded "round-unknown",
# losing the provenance the merge/repair protocol relies on). Default:
# the newest round-numbered bench artifact in the repo.
if [ -z "${SPARK_GRAFT_ROUND:-}" ]; then
  SPARK_GRAFT_ROUND=$(ls BENCH_full_r*.json 2>/dev/null \
    | sed 's/.*_r0*\([0-9]*\)\.json/\1/' | sort -n | tail -1)
  export SPARK_GRAFT_ROUND=${SPARK_GRAFT_ROUND:-unknown}
fi
echo "SPARK_GRAFT_ROUND=$SPARK_GRAFT_ROUND"
python - <<'EOF'
import importlib.util, json
spec = importlib.util.spec_from_file_location("e", "/root/repo/__spark_entry__.py")
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
names = list(m.queries())
k = 4
per = (len(names) + k - 1) // k
for i in range(k):
    open(f"/tmp/parity_chunk_{i}.txt", "w").write(",".join(names[i*per:(i+1)*per]))
print("chunk sizes:", [len(open(f"/tmp/parity_chunk_{i}.txt").read().split(",")) for i in range(k)])
EOF
rc=0
for i in $(seq 0 $((CHUNKS-1))); do
  echo "=== chunk $i ==="
  PARITY_SUBSET="$(cat /tmp/parity_chunk_$i.txt)" \
  PARITY_OUT="/tmp/PARITY_sf0.1_chunk_$i.json" \
  python scripts/drive_driver.py /root/testdata/sf0.1 || rc=1
done
python scripts/merge_parity_chunks.py && echo "SWEEP DONE rc=$rc"
