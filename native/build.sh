#!/bin/sh
# Build the native codecs into deepbedmap_tpu/data/libtiffcodec.so.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 tiffcodec.cc -o ../deepbedmap_tpu/data/libtiffcodec.so
echo "built deepbedmap_tpu/data/libtiffcodec.so"
