// Mutex-based stand-in for moodycamel::ConcurrentQueue (the vendored
// lock-free queue submodule is not present).  API subset used by
// Aligner.cpp; tokens are accepted and ignored.
#pragma once
#include <cstddef>
#include <deque>
#include <mutex>
namespace moodycamel {
template <class T>
class ConcurrentQueue;
struct ProducerToken {
  template <class Q>
  explicit ProducerToken(Q&) {}
};
struct ConsumerToken {
  template <class Q>
  explicit ConsumerToken(Q&) {}
};
template <class T>
class ConcurrentQueue {
 public:
  ConcurrentQueue() = default;
  explicit ConcurrentQueue(size_t) {}
  ConcurrentQueue(size_t, size_t, size_t) {}
  ConcurrentQueue(ConcurrentQueue&& other) noexcept {
    std::lock_guard<std::mutex> g(other.m_);
    q_ = std::move(other.q_);
  }
  ConcurrentQueue& operator=(ConcurrentQueue&& other) noexcept {
    if (this != &other) {
      std::scoped_lock g(m_, other.m_);
      q_ = std::move(other.q_);
    }
    return *this;
  }
  bool enqueue(const T& v) {
    std::lock_guard<std::mutex> g(m_);
    q_.push_back(v);
    return true;
  }
  bool enqueue(T&& v) {
    std::lock_guard<std::mutex> g(m_);
    q_.push_back(std::move(v));
    return true;
  }
  bool enqueue(const ProducerToken&, const T& v) { return enqueue(v); }
  bool enqueue(const ProducerToken&, T&& v) { return enqueue(std::move(v)); }
  bool try_enqueue(const T& v) { return enqueue(v); }
  bool try_enqueue(T&& v) { return enqueue(std::move(v)); }
  bool try_enqueue(const ProducerToken&, const T& v) { return enqueue(v); }
  bool try_enqueue(const ProducerToken&, T&& v) {
    return enqueue(std::move(v));
  }
  template <class It>
  bool enqueue_bulk(It first, size_t n) {
    std::lock_guard<std::mutex> g(m_);
    for (size_t i = 0; i < n; i++) q_.push_back(std::move(first[i]));
    return true;
  }
  template <class It>
  bool enqueue_bulk(const ProducerToken&, It first, size_t n) {
    return enqueue_bulk(first, n);
  }
  bool try_dequeue(T& out) {
    std::lock_guard<std::mutex> g(m_);
    if (q_.empty()) return false;
    out = std::move(q_.front());
    q_.pop_front();
    return true;
  }
  bool try_dequeue(ConsumerToken&, T& out) { return try_dequeue(out); }
  template <class It>
  size_t try_dequeue_bulk(It first, size_t max) {
    std::lock_guard<std::mutex> g(m_);
    size_t n = 0;
    while (n < max && !q_.empty()) {
      *first++ = std::move(q_.front());
      q_.pop_front();
      n++;
    }
    return n;
  }
  template <class It>
  size_t try_dequeue_bulk(ConsumerToken&, It first, size_t max) {
    return try_dequeue_bulk(first, max);
  }
  size_t size_approx() const {
    std::lock_guard<std::mutex> g(m_);
    return q_.size();
  }
 private:
  mutable std::mutex m_;
  std::deque<T> q_;
};
}
