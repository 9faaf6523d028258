// Minimal stand-in for the Arrow types referenced by the reference's
// document headers; the real Arrow-based parquet iterator is replaced by a
// binary-corpus reader for benchmarking (no Arrow C++ available here).
#pragma once
#include <cstdint>
#include <memory>
namespace arrow {
class Buffer {};
class BinaryArray {};
class UInt32Array {};
}  // namespace arrow
