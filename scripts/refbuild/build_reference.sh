#!/bin/bash
# Build the reference GraphChainer binary from /root/reference with
# offline stand-ins for its missing dependencies (boost, sdsl, BBHash,
# concurrentqueue, parallel-hashmap, zstr, mummer).  The stubs are
# original code (see stubs/); mummer seeding is compiled out.
#
# Usage: build_reference.sh [builddir]   (default /tmp/refbuild)
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF=${REF:-/root/reference}
BUILD=${1:-/tmp/refbuild}
mkdir -p "$BUILD"
cp -r "$REF/src" "$REF/edlib" "$REF/test" "$BUILD/" 2>/dev/null || true
chmod -R u+w "$BUILD"
cp -r "$HERE/stubs" "$BUILD/"
cp "$HERE/makefile.stub" "$BUILD/makefile"
cp "$HERE/MummerSeeder.h.stub" "$BUILD/src/MummerSeeder.h"
cp "$HERE/MummerSeeder.cpp.stub" "$BUILD/src/MummerSeeder.cpp"
cd "$BUILD"
make src/vg.pb.cc
make -j"$(nproc)"
echo "built: $BUILD/bin/GraphChainer"
