#!/usr/bin/env bash
# Build libsnn_runtime.so into shadernn_tpu/lib/ (cmake + ninja).
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p build
cmake -S . -B build -G Ninja >/dev/null
cmake --build build >/dev/null
echo "built: $(ls ../shadernn_tpu/lib/libsnn_runtime.so)"
