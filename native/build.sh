#!/bin/sh
# Quick build without cmake (CI / dev convenience); cmake build also works:
#   cmake -S native -B native/build -G Ninja && ninja -C native/build
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -std=c++20 -O3 -shared -fPIC src/ingest.cpp -o lib/libtpusfm_ingest.so \
    -ljpeg -lpng -lz -pthread
echo "built native/lib/libtpusfm_ingest.so"
