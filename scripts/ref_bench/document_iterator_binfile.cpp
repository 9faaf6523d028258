// Drop-in replacement for the reference's Arrow/parquet DocumentIterator:
// reads a pre-exported binary corpus ([u32 n][u32 len + bytes]*), ids 0..n-1
// in file order. Interface and batch semantics match document_iterator.hpp.
#include "documents/document_iterator.hpp"

#include <cstdio>
#include <cstring>
#include <stdexcept>
#include <vector>

namespace {
struct Corpus {
  std::vector<char> blob;
  std::vector<size_t> off;   // n+1 offsets into blob
  uint32_t n = 0;
  bool loaded = false;
  std::string path;
};
Corpus g_corpus;  // loaded once; iterators share it with private cursors
std::mutex g_load_lock;

void loadCorpus(const std::string &p) {
  std::lock_guard<std::mutex> g(g_load_lock);
  if (g_corpus.loaded && g_corpus.path == p) return;
  FILE *f = fopen(p.c_str(), "rb");
  if (!f) throw std::runtime_error("cannot open corpus " + p);
  uint32_t n = 0;
  if (fread(&n, 4, 1, f) != 1) throw std::runtime_error("bad corpus header");
  Corpus c;
  c.n = n;
  c.off.reserve(n + 1);
  std::vector<uint32_t> lens(n);
  if (fread(lens.data(), 4, n, f) != n) throw std::runtime_error("bad corpus lens");
  size_t total = 0;
  for (auto l : lens) total += l;
  c.blob.resize(total);
  if (fread(c.blob.data(), 1, total, f) != total) throw std::runtime_error("bad corpus blob");
  fclose(f);
  size_t acc = 0;
  c.off.push_back(0);
  for (auto l : lens) { acc += l; c.off.push_back(acc); }
  c.loaded = true;
  c.path = p;
  g_corpus = std::move(c);
}
}  // namespace

DocumentIterator::DocumentIterator(const std::string &folder_path, uint32_t batch_size)
    : num_row_groups(0), row_group_index(0), batch_size(batch_size), row_batch_index(0) {
  loadCorpus(folder_path);
}

std::vector<Document> DocumentIterator::next() {
  uint32_t idx;
  {
    std::lock_guard<std::mutex> g(global_lock);
    idx = row_batch_index++;
  }
  const size_t start = size_t(idx) * batch_size;
  if (start >= g_corpus.n) return {};
  const size_t end = std::min<size_t>(start + batch_size, g_corpus.n);
  std::vector<Document> out;
  out.reserve(end - start);
  for (size_t i = start; i < end; ++i) {
    out.emplace_back(static_cast<uint32_t>(i), g_corpus.blob.data() + g_corpus.off[i],
                     g_corpus.off[i + 1] - g_corpus.off[i], nullptr);
  }
  return out;
}

bool DocumentIterator::loadNextFile() { return false; }
bool DocumentIterator::loadNextRowGroup() { return false; }
void DocumentIterator::readBatch(size_t, size_t, std::vector<Document> &) const {}
