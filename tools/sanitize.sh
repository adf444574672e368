#!/bin/sh
# Build the native codec with ASan+UBSan (no-recover) and run the
# in-process test suite plus a corpus sweep against it.
set -e
cd "$(dirname "$0")/.."
SO=/tmp/libleptonc_asub.so
gcc -O1 -g -fsanitize=address,undefined -fno-sanitize-recover=all \
    -fPIC -shared -o "$SO" lepton_tpu/_native/leptonc.c
export LEPTONC_SO="$SO"
export LD_PRELOAD="$(gcc -print-file-name=libasan.so) $(gcc -print-file-name=libubsan.so)"
export ASAN_OPTIONS=detect_leaks=0
python -m pytest tests/ -q -x \
    --ignore=tests/test_sandbox.py --ignore=tests/test_serve_suite.py \
    -k "not graft and not mesh and not pallas and not scan_kernel and not phase_a and not tpu"
echo "sanitizer suite clean"
