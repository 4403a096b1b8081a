#!/usr/bin/env bash
# ASan/UBSan tier for the C++ host library — the analog of the reference
# CI's sanitizer jobs (its .github workflows build with
# -DGINKGO_BUILD_TESTS + sanitizer flags and re-run the test suite).
#
# Builds libginkgo_native with -fsanitize=address,undefined and runs every
# test module that exercises the native surface with libasan preloaded
# into the python host process.  halt_on_error keeps UBSan fatal.
set -euo pipefail
cd "$(dirname "$0")/.."

export GINKGO_TPU_NATIVE_SANITIZE=address,undefined
rm -f ginkgo_tpu/native/lib/libginkgo_native.san.so

ASAN_LIB="$(g++ -print-file-name=libasan.so)"
UBSAN_LIB="$(g++ -print-file-name=libubsan.so)"

# leak detection sees the long-lived python interpreter allocations;
# restrict the report to our library via suppressions-free strict checks
# on the C++ side only.
export ASAN_OPTIONS="detect_leaks=0:halt_on_error=1:abort_on_error=1"
export UBSAN_OPTIONS="halt_on_error=1:print_stacktrace=1"

# wall-clock assertions are deselected: the sanitizer build is -O1 with
# interception overhead (~10x), so speed tests belong to the normal tier
LD_PRELOAD="$ASAN_LIB $UBSAN_LIB" python -m pytest \
    tests/test_native.py tests/test_matrix_data.py \
    tests/test_triangular_ilu.py tests/test_parilut_scale.py \
    tests/test_direct_reorder.py -q \
    --deselect tests/test_parilut_scale.py::test_parilut_generate_32k_stencil \
    --deselect tests/test_direct_reorder.py::test_amd_scales_to_100k \
    "$@"
