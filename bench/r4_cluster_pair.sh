#!/bin/bash
# North-rule literal evidence: the SAME frontier job submitted via
# `spark-submit --py-files engine.zip` at N = 1 and 4N = 4 EXECUTORS
# (local-cluster[E,4,16384]: E separate executor JVMs, 4 cores + 16 GiB
# each — the closest single-box analog of a multi-executor fleet, with
# per-executor heaps/GC isolated exactly as on a real cluster; only the
# memory bus is still shared). Same strict load gate, same reused
# 64-bucket 1.6M-page table, same --prime protocol as the local[N]
# campaigns, so the numbers are comparable across all three tables in
# BENCH/BASELINE.md.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-BENCH/r4_cluster_pair.jsonl}
PAGES=${PAGES:-1600000}
ZIP=/tmp/icrawler_spark_pkg_submit.zip
python - <<'PY'
import zipfile, os
zp = "/tmp/icrawler_spark_pkg_submit.zip"
with zipfile.ZipFile(zp, "w", zipfile.ZIP_STORED) as zf:
    for root, _d, fs in os.walk("icrawler_spark"):
        if "__pycache__" in root:
            continue
        for fn in sorted(fs):
            if fn.endswith(".py"):
                p = os.path.join(root, fn)
                zf.write(p, p)
PY
gate() {
  while true; do
    read -r L1 L5 _ < /proc/loadavg
    awk -v a="$L1" -v b="$L5" 'BEGIN{exit !(a < 1.5 && b < 3.0)}' && break
    sleep 30
  done
}
leg() { # $1 = n executors, $2 = total cores
  gate
  M="local-cluster[$1,4,16384]"
  PRE=$(cut -d' ' -f1-3 /proc/loadavg)
  J=$(PYSPARK_PYTHON=$(which python) spark-submit --master "$M" \
        --driver-memory 8g --py-files "$ZIP" bench/frontier_bench.py \
        --cpus "$2" --master "$M" --pages "$PAGES" --rounds 2 \
        --bucketed-pages 64 --reuse-bucketed-table --prime \
        2>/dev/null | tail -1)
  POST=$(cut -d' ' -f1-3 /proc/loadavg)
  echo "{\"campaign\": \"cluster_submit\", \"executors\": $1, \"gate\": \"strict\", \"pre_load\": \"$PRE\", \"post_load\": \"$POST\", \"run\": $J}" >> "$OUT"
}
leg 1 4
leg 4 16
echo done
