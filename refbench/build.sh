#!/bin/sh
# Build the reference-engine baseline driver against the reference's
# own libdivsufsort, compiled IN PLACE from /root/reference (sources
# are not copied into this repo).  Flags mirror the reference build
# (setup.py: -O2-class distutils default, HAVE_CONFIG_H, no OpenMP),
# with NDEBUG added (generous to the reference: asserts off).
set -e
REF=${REF:-/root/reference}
HERE=$(dirname "$0")
OUT=${1:-$HERE/refbench}
[ -d "$REF/divsufsort" ] || { echo "no reference at $REF" >&2; exit 3; }
cc -O2 -DNDEBUG -DHAVE_CONFIG_H=1 -I"$REF/divsufsort" \
    "$HERE/refbench.c" \
    "$REF/divsufsort/divsufsort.c" "$REF/divsufsort/sssort.c" \
    "$REF/divsufsort/trsort.c" "$REF/divsufsort/utils.c" \
    -o "$OUT" -lm
echo "built $OUT"
