#!/usr/bin/env bash
# TIPC-style per-model certification chain
# (reference: test_tipc/test_train_inference_python.sh, mode
# lite_train_lite_infer): driven by per-model param files under
# test_tipc/configs/<model>/train_infer_python.txt, runs
# train -> evaluate -> export -> deploy-infer -> output-consistency check
# on the hermetic synthetic datasets.
#
#   bash test_tipc/test_train_inference_python.sh <model_name>
#   bash test_tipc/test_train_inference_python.sh all
set -euo pipefail
cd "$(dirname "$0")/.."

DEVICE=${DEVICE:-cpu}
export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"

param() {  # param <file> <key>
    grep "^$2:" "$1" | head -1 | cut -d: -f2-
}

run_chain() {
    local pfile="test_tipc/configs/$1/train_infer_python.txt"
    [ -f "$pfile" ] || { echo "no param file $pfile"; exit 1; }
    local cfg iters bs si npts atol
    cfg=$(param "$pfile" config)
    iters=$(param "$pfile" train_iters)
    bs=$(param "$pfile" batch_size)
    si=$(param "$pfile" save_interval)
    npts=$(param "$pfile" export_num_points)
    atol=$(param "$pfile" consistency_atol)
    local out
    out=$(mktemp -d "/tmp/tipc_$1.XXXXXX")

    echo "==== [$1] train ($iters iters, bs=$bs, device=$DEVICE)"
    python tools/train.py --config "$cfg" --device "$DEVICE" \
        --iters "$iters" --batch_size "$bs" --save_dir "$out" \
        --save_interval "$si" --log_interval 2 --seed 123

    echo "==== [$1] evaluate"
    python tools/evaluate.py --config "$cfg" --device "$DEVICE" \
        --batch_size "$bs" --model "$out/checkpoints/best_model"

    echo "==== [$1] export"
    local export_args=(--config "$cfg" --device "$DEVICE"
                       --model "$out/checkpoints/best_model"
                       --save_dir "$out/export")
    if [ "$npts" != "0" ]; then
        export_args+=(--num_points "$npts")
    fi
    python tools/export.py "${export_args[@]}"
    test -s "$out/export/model.stablehlo.mlir"
    test -s "$out/export/model.msgpack"

    echo "==== [$1] deploy infer"
    python deploy/python/infer.py --model_dir "$out/export" \
        --device "$DEVICE" --iters 2

    echo "==== [$1] train/export output consistency"
    python test_tipc/check_consistency.py --config "$cfg" \
        --model "$out/checkpoints/best_model" --device "$DEVICE" \
        --export_dir "$out/export" --atol "$atol"

    echo "==== [$1] cpp infer (PJRT C API runner)"
    local plugin=${CPP_PLUGIN:-/opt/axon/libaxon_pjrt.so}
    if [ -f "$plugin" ] && [ "${SKIP_CPP:-0}" != "1" ]; then
        [ -x deploy/cpp/pjrt_runner ] || bash deploy/cpp/build.sh
        python test_tipc/cpp_infer_check.py --export_dir "$out/export" \
            --runner deploy/cpp/pjrt_runner --plugin "$plugin" \
            --atol "$atol"
    else
        echo "  (skipped: no PJRT plugin at $plugin)"
    fi

    echo "==== [$1] chain OK ($out)"
}

if [ "${1:-all}" = "all" ]; then
    for d in test_tipc/configs/*/; do
        run_chain "$(basename "$d")"
    done
else
    run_chain "$1"
fi
