#!/bin/sh
# Build the native IO library: native/libfst_io.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread fst_io.cc -o libfst_io.so
echo "built $(pwd)/libfst_io.so"
