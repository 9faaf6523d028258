#!/usr/bin/env bash
# Build the UNMODIFIED reference C++ engine (/root/reference) against the
# tiny Arrow shims in ./shim (no Arrow C++ in this sandbox) plus our
# binary-corpus DocumentIterator, then benchmark index build + BM25 queries
# on the same synthetic web corpus the Spark engine is measured on.
#
# The reference sources are compiled from a /tmp scratch COPY with exactly one
# portability fix (libstdc++12 lacks constexpr unordered_set::contains);
# nothing from the reference enters this repository.
#
#   bash scripts/ref_bench/build_and_run.sh [docs=400000]
#
# Prints build/query timings at 32 (native), 8, and 2 pinned cores and leaves
# the binary at /tmp/ref_build/ref_fts, full output at
# /tmp/ref_build/ref_out_<docs>.txt (consumed by scripts/parity_vs_reference.py).
set -euo pipefail
DOCS="${1:-400000}"
HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(cd "$HERE/../.." && pwd)"
SCRATCH=/tmp/ref_build
REF=/root/reference

mkdir -p "$SCRATCH"
if [ ! -d "$SCRATCH/src" ]; then
  cp -r "$REF/src" "$SCRATCH/src"
  # sole change: g++-12's libstdc++ has no constexpr unordered_set::contains
  sed -i 's/static constexpr bool isStopWord/static inline bool isStopWord/' \
    "$SCRATCH/src/tokenizer/tokenizer_rules.hpp"
fi
R="$SCRATCH/src"

if [ ! -x "$SCRATCH/ref_fts" ]; then
  cd "$SCRATCH"
  gcc -O3 -c "$R"/tokenizer/snowball/api.c "$R"/tokenizer/snowball/utilities.c \
    "$R"/tokenizer/snowball/stem_UTF_8_english.c
  g++ -std=c++2b -O3 -pthread -I"$HERE/shim" -I"$R" -c \
    "$R"/algorithms/inverted/inverted_index_engine.cpp \
    "$R"/tokenizer/stemmingtokenizer.cpp "$R"/tokenizer/simpletokenizer.cpp \
    "$R"/scoring/bm25.cpp "$R"/scoring/tf_idf.cpp \
    "$HERE/document_iterator_binfile.cpp" "$HERE/ref_main.cc"
  mv document_iterator_binfile.o document_iterator.o 2>/dev/null || true
  g++ -O3 -pthread -o ref_fts ./*.o
fi

python "$HERE/export_corpus.py" "$DOCS"

cd "$SCRATCH"
echo "== 32 cores (native, hardware_concurrency threads) =="
./ref_fts "corpus${DOCS}.bin" queries.txt 10 1.2 0.75 | tee "ref_out_${DOCS}.txt" | grep -E "BUILD|DOC_COUNT|QUERY_SEC"
echo "== 8 pinned cores =="
taskset -c 0-7 ./ref_fts "corpus${DOCS}.bin" queries.txt 10 1.2 0.75 | grep -E "BUILD|QUERY_SEC"
echo "== 2 pinned cores =="
taskset -c 0-1 ./ref_fts "corpus${DOCS}.bin" queries.txt 10 1.2 0.75 | grep -E "BUILD|QUERY_SEC"
