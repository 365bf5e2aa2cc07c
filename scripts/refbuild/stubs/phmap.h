// Stand-in for parallel-hashmap (header-only dep not present in image):
// alias the phmap containers to libstdc++ equivalents.  Slower, same API
// subset.
#pragma once
#include <unordered_map>
#include <unordered_set>
namespace phmap {
template <class K, class V, class H = std::hash<K>,
          class E = std::equal_to<K>>
using flat_hash_map = std::unordered_map<K, V, H, E>;
template <class K, class H = std::hash<K>, class E = std::equal_to<K>>
using flat_hash_set = std::unordered_set<K, H, E>;
template <class K, class V, class H = std::hash<K>,
          class E = std::equal_to<K>>
using node_hash_map = std::unordered_map<K, V, H, E>;
}
