#!/bin/sh
# Build the native patch loader -> native/librcot_patchloader.so
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -o librcot_patchloader.so patchloader.cc \
    -lpng -ljpeg -lpthread
echo "built $(pwd)/librcot_patchloader.so"
