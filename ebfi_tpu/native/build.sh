#!/usr/bin/env bash
# Build the host data-plane shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -o libebfi_host.so ebfi_host.cpp
echo "built $(pwd)/libebfi_host.so"
