// Benchmark harness around the UNMODIFIED reference engine sources:
// build the inverted index over a binary corpus, run a query file, print
// timings and top-k results for parity checking.
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <iostream>
#include <string>

#include "algorithms/inverted/inverted_index_engine.hpp"
#include "scoring/bm25.hpp"

int main(int argc, char **argv) {
  if (argc < 4) {
    std::fprintf(stderr, "usage: %s corpus.bin queries.txt k [k1] [b]\n", argv[0]);
    return 2;
  }
  std::string corpus = argv[1];
  std::string qfile = argv[2];
  int k = std::atoi(argv[3]);
  double k1 = argc > 4 ? std::atof(argv[4]) : 1.5;
  double b = argc > 5 ? std::atof(argv[5]) : 0.75;

  InvertedIndexEngine engine;
  auto t0 = std::chrono::steady_clock::now();
  engine.indexDocuments(corpus);
  auto t1 = std::chrono::steady_clock::now();
  double build_s = std::chrono::duration<double>(t1 - t0).count();
  std::printf("BUILD_SECONDS %.3f\n", build_s);
  std::printf("DOC_COUNT %u AVGDL %.6f\n", engine.getDocumentCount(), engine.getAvgDocumentLength());

  scoring::BM25 bm25(engine.getDocumentCount(), engine.getAvgDocumentLength(), k1, b);
  std::ifstream qf(qfile);
  std::string line;
  double total_q = 0;
  int nq = 0;
  while (std::getline(qf, line)) {
    if (line.empty()) continue;
    auto q0 = std::chrono::steady_clock::now();
    auto res = engine.search(line, bm25, k);
    auto q1 = std::chrono::steady_clock::now();
    total_q += std::chrono::duration<double>(q1 - q0).count();
    ++nq;
    for (size_t r = 0; r < res.size(); ++r)
      std::printf("RESULT %d|%zu|%u|%.9f|\n", nq, r + 1, res[r].first, res[r].second);
  }
  std::printf("QUERY_SECONDS %.4f N_QUERIES %d\n", total_q, nq);
  return 0;
}
