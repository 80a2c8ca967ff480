#!/bin/bash
# Builds the reference C library against the local fftw shim, verifies its
# own golden tests pass, and builds the throughput benchmark harness.
set -euo pipefail
cd "$(dirname "$0")"

SHIM=$PWD/fftw_shim
mkdir -p "$SHIM/lib" build

# shim library + pkg-config file
gcc -O2 -fPIC -shared -o "$SHIM/lib/libfftw3.so" "$SHIM/fftw_shim.c" -lm
cat > "$SHIM/fftw3.pc" <<EOF
prefix=$SHIM
libdir=$SHIM/lib
includedir=$SHIM

Name: fftw3-shim
Description: minimal fftw3 shim for baseline benchmarking
Version: 3.3.0
Libs: -L\${libdir} -lfftw3
Cflags: -I\${includedir}
EOF

export PKG_CONFIG_PATH="$SHIM:${PKG_CONFIG_PATH:-}"
cmake -S /root/reference -B build -DCMAKE_BUILD_TYPE=Release \
      -DCMAKE_C_FLAGS="-O2" >/dev/null
make -C build -j"$(nproc)" bliss test_analyze test_decode >/dev/null

gcc -O2 -o build/bench_ref bench_ref.c -Ibuild -I/root/reference/include \
    -Lbuild -lbliss -lm
echo "baseline build OK"
