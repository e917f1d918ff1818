#!/bin/sh
# Builds the extern-C driver around the ACTUAL reference header-only
# library (see ref_harness.cpp). Requires the read-only reference checkout
# and an Eigen (the TensorFlow wheel bundles one). IEEE f32: -O2 without
# fast-math, matching a stock catkin release build.
set -e
cd "$(dirname "$0")"

REF_INCLUDE="${HECTOR_REF_INCLUDE:-/root/reference/hector_mapping/include/hector_slam_lib}"
if [ ! -d "$REF_INCLUDE" ]; then
  echo "reference include dir not found: $REF_INCLUDE" >&2
  exit 3
fi

EIGEN_INCLUDE="${EIGEN_INCLUDE:-}"
if [ -z "$EIGEN_INCLUDE" ]; then
  for d in /opt/venv/lib/python*/site-packages/tensorflow/include \
           /usr/include/eigen3; do
    if [ -d "$d/Eigen" ]; then EIGEN_INCLUDE="$d"; break; fi
  done
fi
if [ -z "$EIGEN_INCLUDE" ]; then
  echo "no Eigen headers found (set EIGEN_INCLUDE)" >&2
  exit 3
fi

exec g++ -O2 -fPIC -shared -std=c++14 \
  -I "$REF_INCLUDE" -I "$EIGEN_INCLUDE" -I . \
  ref_harness.cpp -o ref_reference.so
