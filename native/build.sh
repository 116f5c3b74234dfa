#!/bin/bash
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 loader.cpp -o libyolodl_loader.so -ljpeg -lpng -lpthread
echo "built native/libyolodl_loader.so"
