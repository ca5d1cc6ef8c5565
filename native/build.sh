#!/bin/sh
# Build the native data-plane library. Output lands next to this script so
# pangu_tpu/data/fastpack.py can find it.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    fastpack.cpp -o libfastpack.so
echo "built $(pwd)/libfastpack.so"
