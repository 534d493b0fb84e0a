#!/usr/bin/env bash
# TIPC train-throughput certification leg
# (reference: test_tipc/benchmark_train.sh — parameterized train benchmark
# with logged IPS for CI thresholds). TPU-native equivalent: runs the
# driver-audited bench.py train mode (full fwd+bwd+AdamW step, AMP O2) for
# a model and asserts scans/sec against the committed per-model threshold.
#
#   bash test_tipc/benchmark_train.sh pointpillars
#   bash test_tipc/benchmark_train.sh all
#
# Thresholds live in test_tipc/configs/<model>/train_benchmark.txt and are
# set from the latest driver-captured BENCH (85% of BENCH_r03 to absorb
# chip-to-chip variance). On a non-TPU backend the bench still runs (smoke)
# but the threshold check is skipped — the certification is a TPU contract,
# like the reference's GPU-only benchmark mode.
set -euo pipefail
cd "$(dirname "$0")/.."

param() { grep "^$2:" "$1" | head -1 | cut -d: -f2-; }

BACKEND=$(python -c "import jax; print(jax.default_backend())" 2>/dev/null |
          tail -1)

run_one() {
    local pfile="test_tipc/configs/$1/train_benchmark.txt"
    [ -f "$pfile" ] || { echo "no param file $pfile"; exit 1; }
    local bs iters thr
    bs=$(param "$pfile" batch_size)
    iters=$(param "$pfile" iters)
    thr=$(param "$pfile" min_scans_per_sec)

    echo "==== [$1] benchmark_train (bs=$bs iters=$iters backend=$BACKEND)"
    local line
    line=$(python bench.py --mode train --model "$1" --batch "$bs" \
           --iters "$iters" | tail -1)
    echo "$line"
    local sps
    sps=$(python - "$line" <<'PYEOF'
import json, sys
print(json.loads(sys.argv[1])["value"])
PYEOF
)
    if [ "$BACKEND" = "tpu" ]; then
        python - "$sps" "$thr" "$1" <<'PYEOF'
import sys
sps, thr, name = float(sys.argv[1]), float(sys.argv[2]), sys.argv[3]
ok = sps >= thr
print(f"[{name}] train {sps:.2f} scans/s vs threshold {thr:.2f}: "
      f"{'PASS' if ok else 'FAIL'}")
sys.exit(0 if ok else 1)
PYEOF
    else
        echo "[$1] backend=$BACKEND — threshold check skipped (TPU contract)"
    fi
}

if [ "${1:-all}" = "all" ]; then
    for m in pointpillars centerpoint; do run_one "$m"; done
else
    run_one "$1"
fi
echo "benchmark_train: OK"
