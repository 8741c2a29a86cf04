#!/bin/sh
# Build the native feature-pack reader -> native/libovqa_pack.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    feature_pack.cc -o libovqa_pack.so
echo "built $(pwd)/libovqa_pack.so"
