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

# refprobcons: the reference's OWN ProbCons engine (probcons/Probcons.cc)
# compiled in place.  The file is a python2 extension module; everything
# above its "//PYTHON LIB!" marker (line 1606) is pure C++ (DoAlign and
# the whole consistency/tree/refinement pipeline), so slice there at
# build time (no sources copied into the repo), shim Python.h (10 lines,
# shim/Python.h) and rename its dormant CLI main.  Flags mirror the
# reference build (setup.py:33-36: NumInsertStates=2) with NDEBUG added
# (asserts off — generous to the reference, same as refbench above).
PC="$REF/probcons/Probcons.cc"
if [ -f "$PC" ]; then
    BUILDDIR=$(mktemp -d)
    trap 'rm -rf "$BUILDDIR"' EXIT
    CUT=$(grep -n '//PYTHON LIB!' "$PC" | head -1 | cut -d: -f1)
    [ -n "$CUT" ] || { echo "no PYTHON LIB marker in $PC" >&2; exit 3; }
    sed -n "1,$((CUT - 1))p" "$PC" > "$BUILDDIR/probcons_core.cc"
    c++ -O2 -DNDEBUG -DNumInsertStates=2 -DVERSION=1.12 \
        -Dmain=probcons_ref_cli_main \
        -I"$HERE/shim" -I"$REF/probcons" \
        -c "$BUILDDIR/probcons_core.cc" -o "$BUILDDIR/probcons_core.o"
    c++ -O2 -DNDEBUG -DNumInsertStates=2 -DVERSION=1.12 \
        -I"$REF/probcons" \
        "$HERE/refprobcons.cc" "$BUILDDIR/probcons_core.o" \
        -o "$HERE/refprobcons" -lm
    echo "built $HERE/refprobcons"
fi
