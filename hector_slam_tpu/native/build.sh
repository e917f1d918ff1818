#!/bin/sh
# Build the native reference oracle shared library.
# -ffp-contract=off: no FMA fusion, so float rounding matches the plain
# SSE arithmetic of a default reference build.
set -e
cd "$(dirname "$0")"
g++ -O2 -ffp-contract=off -fno-fast-math -shared -fPIC \
    -o libref_engine.so ref_engine.cpp
echo "built $(pwd)/libref_engine.so"
