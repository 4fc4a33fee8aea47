#!/bin/sh
# Build the native tokenizer shared library into the package directory.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o ../fvta_memexqa_tpu/data/_libfvta_tokenizer.so tokenizer.cc
echo "built fvta_memexqa_tpu/data/_libfvta_tokenizer.so"
