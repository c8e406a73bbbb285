#!/bin/sh
# Build the native IO runtime (no external deps).
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -pthread -o libxio.so xio.cpp
echo "built native/libxio.so"
