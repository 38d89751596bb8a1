#!/bin/bash
# Build the upstream NMSLIB core (the file list mirrors the reference's
# build.zig, ReleaseFast-equivalent flags) + the bench harness.
set -eu
REF=/root/reference
OUT=/tmp/ref_baseline
mkdir -p "$OUT/obj"
CXX=${CXX:-g++}
FLAGS="-O3 -DNDEBUG -march=native -std=c++17 -I$REF/include -w"

SRCS=$(cd "$REF" && ls src/*.cc src/method/*.cc src/space/*.cc | grep -v space_sqfd)
for s in $SRCS; do
  o="$OUT/obj/$(echo "$s" | tr '/' '_').o"
  if [ ! -f "$o" ] || [ "$REF/$s" -nt "$o" ]; then
    echo "CXX $s" >&2
    $CXX $FLAGS -c "$REF/$s" -o "$o"
  fi
done
echo "CXX bench_ref.cpp" >&2
$CXX $FLAGS -c "$(dirname "$0")/bench_ref.cpp" -o "$OUT/obj/bench_ref.o"
$CXX $FLAGS "$OUT"/obj/*.o -o "$OUT/bench_ref" -lpthread
echo "built $OUT/bench_ref" >&2
