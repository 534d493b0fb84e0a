#!/usr/bin/env bash
# Build the generic PJRT inference runner.
# The PJRT C API is a single self-contained header; point PJRT_INCLUDE at
# any checkout that provides xla/pjrt/c/pjrt_c_api.h (the tensorflow pip
# package vendors one, used as the default below).
set -e
cd "$(dirname "$0")"
PJRT_INCLUDE=${PJRT_INCLUDE:-$(python -c "import tensorflow, os; print(os.path.join(os.path.dirname(tensorflow.__file__), 'include'))" 2>/dev/null || true)}
if [ -z "$PJRT_INCLUDE" ] || [ ! -f "$PJRT_INCLUDE/xla/pjrt/c/pjrt_c_api.h" ]; then
  echo "set PJRT_INCLUDE to a dir containing xla/pjrt/c/pjrt_c_api.h" >&2
  exit 1
fi
g++ -O2 -std=c++17 -I"$PJRT_INCLUDE" pjrt_runner.cpp -ldl -o pjrt_runner
echo "built deploy/cpp/pjrt_runner"
