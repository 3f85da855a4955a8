#!/bin/sh
# Build the native host-side mesh-ops library.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libmesh_ops.so mesh_ops.cpp
echo "built $(pwd)/libmesh_ops.so"
