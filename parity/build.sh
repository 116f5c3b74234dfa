#!/bin/bash
# Build the darknet-C parity oracle (CPU) out-of-tree.
#
# Role of the reference's darknet-test build.rs (CMake build of the vendored
# AlexeyAB darknet): compiles the darknet C sources read-only from
# $DARKNET_SRC into ./darknet_build and links the dk_shim.so ctypes shim.
set -euo pipefail
cd "$(dirname "$0")"

DARKNET_SRC="${DARKNET_SRC:-/root/reference/darknet-test/darknet}"
BUILD=darknet_build
mkdir -p "$BUILD"/obj "$BUILD"/backup "$BUILD"/results

# upstream FPE fix: pure-sequence nets (rnn.cfg etc.) have no layer with
# w>1&&h>1, so parser.c:1670 divides by zero (SIGFPE) — guard the average.
# The patched copy lives only in the build dir; the reference stays read-only.
mkdir -p "$BUILD"/patched
# fail fast if the upstream line drifts: sed exits 0 on a no-match, which
# would produce a "successful" build whose oracle still SIGFPEs
grep -q 'avg_outputs = avg_outputs / avg_counter;' "$DARKNET_SRC/src/parser.c" \
    || { echo "FPE-guard pattern not found in parser.c — update build.sh" >&2; exit 1; }
sed 's|avg_outputs = avg_outputs / avg_counter;|if (avg_counter > 0) avg_outputs = avg_outputs / avg_counter;|' \
    "$DARKNET_SRC/src/parser.c" > "$BUILD/patched/parser.c"

# out-of-tree Makefile: point VPATH/include paths at the read-only source
# (patched/ first so the FPE-guarded parser.c wins)
sed -e "s|^VPATH=./src/|VPATH=patched/:$DARKNET_SRC/src/|" \
    -e "s|^LIBSO=0|LIBSO=1|" \
    -e "s|COMMON= -Iinclude/ -I3rdparty/stb/include|COMMON= -I$DARKNET_SRC/include/ -I$DARKNET_SRC/3rdparty/stb/include -I$DARKNET_SRC/src/|" \
    -e "s|DEPS = \$(wildcard src/\*.h) Makefile include/darknet.h|DEPS = \$(wildcard $DARKNET_SRC/src/*.h) Makefile $DARKNET_SRC/include/darknet.h|" \
    -e "s|src/yolo_v2_class.cpp|$DARKNET_SRC/src/yolo_v2_class.cpp|g" \
    -e "s|include/yolo_v2_class.hpp|$DARKNET_SRC/include/yolo_v2_class.hpp|g" \
    "$DARKNET_SRC/Makefile" > "$BUILD/Makefile"

make -C "$BUILD" libdarknet.so -j"$(nproc)"

gcc -shared -fPIC -O2 -I"$DARKNET_SRC/include" dk_shim.c -o dk_shim.so \
    -L"$BUILD" -ldarknet -Wl,-rpath,'$ORIGIN/'"$BUILD"
echo "built parity/dk_shim.so"
