#!/bin/sh
# Build the C reference (hglm/detex) as a shared library used ONLY as the
# bit-exactness oracle for golden-vector generation (tools/gen_goldens.py).
# Usage: tools/build_reference.sh [build_dir] [ref_src]
set -e
BUILD="${1:-/tmp/refbuild}"
SRC="${2:-/root/reference}"
mkdir -p "$BUILD"
cd "$BUILD"
for f in bits clamp convert dds decompress-bc decompress-bptc \
         decompress-bptc-float decompress-eac decompress-etc \
         decompress-rgtc division-tables bptc-tables file-info \
         half-float hdr ktx misc raw texture; do
  gcc -std=gnu99 -O2 -fPIC -I"$SRC" -c "$SRC/$f.c" -o "$f.o"
done
gcc -shared -o libdetex_ref.so ./*.o -lm -lpthread
echo "built $BUILD/libdetex_ref.so"
