#!/usr/bin/env bash
# ThreadSanitizer build + run of the ingest worker-pool harness
# (SURVEY.md §5 race-detection contract; invoked by ci.sh nightly).
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p build_tsan
g++ -std=c++20 -O1 -g -fsanitize=thread -fno-omit-frame-pointer \
    src/ingest.cpp test/tsan_pool_test.cpp \
    -o build_tsan/tsan_pool_test \
    -ljpeg -lpng -lz -lpthread
./build_tsan/tsan_pool_test
echo "TSAN OK"
