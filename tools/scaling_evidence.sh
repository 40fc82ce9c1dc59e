#!/bin/bash
# North-rule scaling evidence: the identical spark-submit pipeline job
# at two cluster sizes (N and 4N cores) on the same input, process tree
# pinned via taskset, job-only wall from the lineage sidecar (excludes
# JVM boot). Prints one line per pair:
#   pairK: local[N]=..s (D docs/s)  local[4N]=..s (D docs/s)  efficiency=E
#
# Usage: tools/scaling_evidence.sh [LOW=4] [PAIRS=3]
# Interpretation: compare E against bench.py's hw_scaling_ceiling (the
# same-session pure-multiprocessing curve) — shared-host weather bounds
# any engine's single-box scaling (BASELINE.md "Scaling protocol").
set -u
cd "$(dirname "$0")/.."
LOW=${1:-4}
PAIRS=${2:-3}
HIGH=$((LOW * 4))
export SPARK_LOCAL_IP=127.0.0.1

CORPUS=$(python - <<'EOF'
from zpdfspark.fixtures import CORPUS_VERSION, write_corpus_parquet
import os
path = f"/tmp/zpdfspark_bench_corpus_{CORPUS_VERSION}_sf0.1_60000.parquet"
if not os.path.exists(path):
    write_corpus_parquet(path + ".tmp", 60000, seed=42, profile="heavy")
    os.replace(path + ".tmp", path)
print(path)
EOF
)
N_DOCS=60000

zip -qr /tmp/zpdfspark_scaling.zip zpdfspark -x "*.pyc"

run_one() { # CORES OUTDIR -> job seconds or FAIL
  local CORES=$1 OUT=$2
  rm -rf "$OUT"
  taskset -c 0-$((CORES - 1)) spark-submit \
    --master "local[$CORES,4]" --driver-memory $((CORES + 2))g \
    --conf spark.ui.enabled=false \
    --conf spark.sql.shuffle.partitions=$((CORES * 2)) \
    --py-files /tmp/zpdfspark_scaling.zip zpdfspark/spark/pipeline.py \
    --input "$CORPUS" --output "$OUT" --single-pass --no-resume \
    --partitions $((CORES * 4)) >/dev/null 2>&1
  python - "$OUT" "$N_DOCS" <<'EOF'
import json, glob, sys
files = glob.glob(sys.argv[1] + "/_lineage/*.json")
rows = [json.loads(l) for f in files for l in open(f) if l.strip()]
docs = sum(r["n_docs"] for r in rows)
print(f"{max(r['wall_secs'] for r in rows):.1f}"
      if rows and docs == int(sys.argv[2]) else "FAIL")
EOF
}

for P in $(seq 1 "$PAIRS"); do
  TL=$(run_one "$LOW" /tmp/scaling_ev_low)
  TH=$(run_one "$HIGH" /tmp/scaling_ev_high)
  if [ "$TL" = FAIL ] || [ "$TH" = FAIL ]; then
    echo "pair$P: FAIL (T$LOW=$TL T$HIGH=$TH)"
    continue
  fi
  echo "$TL $TH $LOW $HIGH $N_DOCS $P" | awk '{
    printf "pair%s: local[%d]=%ss (%.0f docs/s)  local[%d]=%ss (%.0f docs/s)  efficiency=%.3f\n",
      $6, $3, $1, $5/$1, $4, $2, $5/$2, $1/(4*$2)}'
done
