// Stand-in for BBHash (boomphf): a sorted-array "perfect hash" — lookup
// returns the key's rank.  Same contract for present keys; absent keys
// return an arbitrary index (callers verify with kmerCheck).
#pragma once
#include <algorithm>
#include <cstdint>
#include <vector>
namespace boomphf {
template <class T>
struct SingleHashFunctor {
  uint64_t operator()(T v, uint64_t = 0) const { return (uint64_t)v; }
};
template <class T, class Hasher>
class mphf {
 public:
  mphf() = default;
  template <class Range>
  mphf(size_t n, const Range& keys, int /*threads*/, double /*gamma*/,
       bool /*writeEach*/ = true, bool /*progress*/ = true) {
    keys_.assign(keys.begin(), keys.end());
    std::sort(keys_.begin(), keys_.end());
    keys_.erase(std::unique(keys_.begin(), keys_.end()), keys_.end());
  }
  uint64_t lookup(T key) const {
    auto it = std::lower_bound(keys_.begin(), keys_.end(), key);
    if (it == keys_.end()) return keys_.empty() ? 0 : keys_.size() - 1;
    return (uint64_t)(it - keys_.begin());
  }
  size_t nbKeys() const { return keys_.size(); }
 private:
  std::vector<T> keys_;
};
}
