// Minimal stand-in for sdsl::int_vector<0>: stores full 64-bit words and
// ignores the bit-width hint (correct, just not bit-packed).
#pragma once
#include <cstdint>
#include <cstddef>
#include <vector>
namespace sdsl {
template <int W = 0>
class int_vector {
 public:
  using value_type = uint64_t;
  using iterator = std::vector<uint64_t>::iterator;
  using const_iterator = std::vector<uint64_t>::const_iterator;
  int_vector() : width_(64) {}
  explicit int_vector(size_t n, uint64_t v = 0, uint8_t w = 64)
      : data_(n, v), width_(w) {}
  uint64_t& operator[](size_t i) { return data_[i]; }
  const uint64_t& operator[](size_t i) const { return data_[i]; }
  size_t size() const { return data_.size(); }
  void resize(size_t n) { data_.resize(n); }
  uint8_t width() const { return width_; }
  void width(uint8_t w) { width_ = w; }
  iterator begin() { return data_.begin(); }
  iterator end() { return data_.end(); }
  const_iterator begin() const { return data_.begin(); }
  const_iterator end() const { return data_.end(); }
 private:
  std::vector<uint64_t> data_;
  uint8_t width_;
};
namespace util {
template <class V, class T>
void set_to_value(V& v, T val) {
  for (size_t i = 0; i < v.size(); i++) v[i] = val;
}
}
}
