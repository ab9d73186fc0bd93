#!/bin/bash
# Build the native loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o liborbtpu_loader.so loader.cpp -lz -lpthread
echo "built native/liborbtpu_loader.so"
