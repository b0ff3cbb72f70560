#!/bin/sh
# Build the native runtime library. Output: native/libmultihmr_native.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    multihmr_native.cpp -o libmultihmr_native.so -ljpeg -lpng
echo "built $(pwd)/libmultihmr_native.so"
