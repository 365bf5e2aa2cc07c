// Minimal zlib-iostream stand-in for the zstr submodule (not present):
// zstr::ifstream transparently inflates gzip files (passthrough for plain
// text); zstr::ostream gzip-compresses into a wrapped ostream.
#pragma once
#include <zlib.h>
#include <cstring>
#include <fstream>
#include <istream>
#include <memory>
#include <ostream>
#include <stdexcept>
#include <streambuf>
#include <vector>

namespace zstr {

class inflate_streambuf : public std::streambuf {
 public:
  explicit inflate_streambuf(std::streambuf* src)
      : src_(src), in_(1 << 16), out_(1 << 16) {
    int c0 = src_->sbumpc();
    int c1 = src_->sgetc();
    if (c0 != EOF) src_->sungetc();  // put c0 back via sputbackc path
    // streambuf has no double-unget guarantee; emulate with a small
    // holdback buffer instead
    if (c0 == 0x1f && c1 == 0x8b) {
      gz_ = true;
      std::memset(&strm_, 0, sizeof(strm_));
      if (inflateInit2(&strm_, 15 + 32) != Z_OK)
        throw std::runtime_error("inflateInit2 failed");
    }
  }
  ~inflate_streambuf() override {
    if (gz_) inflateEnd(&strm_);
  }

 protected:
  int_type underflow() override {
    if (gptr() < egptr()) return traits_type::to_int_type(*gptr());
    if (!gz_) {
      std::streamsize n = src_->sgetn(out_.data(), (std::streamsize)out_.size());
      if (n <= 0) return traits_type::eof();
      setg(out_.data(), out_.data(), out_.data() + n);
      return traits_type::to_int_type(*gptr());
    }
    strm_.avail_out = (uInt)out_.size();
    strm_.next_out = (Bytef*)out_.data();
    while (strm_.avail_out == out_.size()) {
      if (strm_.avail_in == 0) {
        std::streamsize n = src_->sgetn(in_.data(), (std::streamsize)in_.size());
        if (n <= 0 && strm_.avail_in == 0) {
          if (strm_.avail_out == out_.size()) return traits_type::eof();
          break;
        }
        strm_.avail_in = (uInt)n;
        strm_.next_in = (Bytef*)in_.data();
      }
      int ret = inflate(&strm_, Z_NO_FLUSH);
      if (ret == Z_STREAM_END) {
        // support concatenated gzip members
        if (strm_.avail_in > 0 || src_->sgetc() != EOF) inflateReset(&strm_);
        else break;
      } else if (ret != Z_OK && ret != Z_BUF_ERROR) {
        throw std::runtime_error("gzip inflate error");
      }
    }
    std::streamsize produced =
        (std::streamsize)(out_.size() - strm_.avail_out);
    if (produced <= 0) return traits_type::eof();
    setg(out_.data(), out_.data(), out_.data() + produced);
    return traits_type::to_int_type(*gptr());
  }

 private:
  std::streambuf* src_;
  bool gz_ = false;
  z_stream strm_{};
  std::vector<char> in_, out_;
};

class deflate_streambuf : public std::streambuf {
 public:
  explicit deflate_streambuf(std::streambuf* dst)
      : dst_(dst), buf_(1 << 16), out_(1 << 16) {
    std::memset(&strm_, 0, sizeof(strm_));
    if (deflateInit2(&strm_, Z_DEFAULT_COMPRESSION, Z_DEFLATED, 15 + 16, 8,
                     Z_DEFAULT_STRATEGY) != Z_OK)
      throw std::runtime_error("deflateInit2 failed");
    setp(buf_.data(), buf_.data() + buf_.size());
  }
  ~deflate_streambuf() override {
    finish();
    deflateEnd(&strm_);
  }
  void finish() {
    if (finished_) return;
    drain(Z_FINISH);
    finished_ = true;
  }

 protected:
  int_type overflow(int_type ch) override {
    drain(Z_NO_FLUSH);
    if (ch != traits_type::eof()) {
      *pptr() = traits_type::to_char_type(ch);
      pbump(1);
    }
    return 0;
  }
  int sync() override {
    drain(Z_SYNC_FLUSH);
    return 0;
  }

 private:
  void drain(int flush) {
    strm_.avail_in = (uInt)(pptr() - pbase());
    strm_.next_in = (Bytef*)pbase();
    do {
      strm_.avail_out = (uInt)out_.size();
      strm_.next_out = (Bytef*)out_.data();
      int ret = deflate(&strm_, flush);
      if (ret == Z_STREAM_ERROR) throw std::runtime_error("deflate error");
      std::streamsize n = (std::streamsize)(out_.size() - strm_.avail_out);
      if (n > 0) dst_->sputn(out_.data(), n);
      if (ret == Z_STREAM_END) break;
    } while (strm_.avail_out == 0 || strm_.avail_in > 0);
    setp(buf_.data(), buf_.data() + buf_.size());
  }
  std::streambuf* dst_;
  z_stream strm_{};
  std::vector<char> buf_, out_;
  bool finished_ = false;
};

class ifstream : public std::istream {
 public:
  explicit ifstream(const std::string& path)
      : std::istream(nullptr), file_(path, std::ios::binary) {
    if (!file_) {
      setstate(std::ios::failbit);
      return;
    }
    buf_.reset(new inflate_streambuf(file_.rdbuf()));
    rdbuf(buf_.get());
  }

 private:
  std::ifstream file_;
  std::unique_ptr<inflate_streambuf> buf_;
};

class istream : public std::istream {
 public:
  explicit istream(std::istream& src) : std::istream(nullptr) {
    buf_.reset(new inflate_streambuf(src.rdbuf()));
    rdbuf(buf_.get());
  }

 private:
  std::unique_ptr<inflate_streambuf> buf_;
};

class ostream : public std::ostream {
 public:
  explicit ostream(std::ostream& dst) : std::ostream(nullptr) {
    buf_.reset(new deflate_streambuf(dst.rdbuf()));
    rdbuf(buf_.get());
  }
  ~ostream() override { buf_->finish(); }

 private:
  std::unique_ptr<deflate_streambuf> buf_;
};

}  // namespace zstr
