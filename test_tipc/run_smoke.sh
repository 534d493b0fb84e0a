#!/usr/bin/env bash
# TIPC-style end-to-end certification smoke
# (reference: test_tipc/test_train_inference_python.sh — lite_train_lite_infer
# mode): train a few iters -> evaluate -> export -> verify artifacts, all on
# the hermetic synthetic dataset so no real data is needed.
set -euo pipefail
cd "$(dirname "$0")/.."

CFG=configs/pointpillars/pointpillars_synthetic_tiny.yml
OUT=$(mktemp -d /tmp/tipc_smoke.XXXXXX)
DEVICE=${DEVICE:-cpu}
export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"

echo "== train (8 iters, device=$DEVICE) =="
python tools/train.py --config "$CFG" --device "$DEVICE" --iters 8 \
    --batch_size 8 --save_dir "$OUT" --save_interval 4 --log_interval 2 \
    --seed 123

echo "== evaluate from checkpoint =="
python tools/evaluate.py --config "$CFG" --device "$DEVICE" --batch_size 8 \
    --model "$OUT/checkpoints/best_model"

echo "== export =="
python tools/export.py --config "$CFG" --device "$DEVICE" \
    --model "$OUT/checkpoints/best_model" --save_dir "$OUT/export" \
    --num_points 1024

test -s "$OUT/export/model.stablehlo.mlir"
test -s "$OUT/export/model.msgpack"
echo "TIPC smoke OK ($OUT)"
