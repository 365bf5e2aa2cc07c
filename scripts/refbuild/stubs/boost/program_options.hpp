// Minimal re-implementation of the boost::program_options API subset used
// by AlignerMain.cpp (boost is not available in this image).  Supports:
// long/short option names ("name,n"), typed value<T>() semantics with
// multitoken(), untyped flag options, grouped descriptions with help
// printing, parse_command_line + store + notify, variables_map
// count()/operator[]/as<T>().
#pragma once
#include <any>
#include <cstdlib>
#include <map>
#include <memory>
#include <ostream>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace boost {
namespace program_options {

struct value_semantic_base {
  virtual ~value_semantic_base() = default;
  virtual void parse(std::any& storage, const std::string& tok) const = 0;
  virtual bool takes_value() const { return true; }
  virtual bool is_multitoken() const { return false; }
};

template <class T>
struct typed_value : value_semantic_base {
  bool multi_ = false;
  typed_value* multitoken() {
    multi_ = true;
    return this;
  }
  bool is_multitoken() const override { return multi_; }
  void parse(std::any& storage, const std::string& tok) const override {
    std::istringstream ss(tok);
    T v{};
    ss >> v;
    if (ss.fail()) throw std::runtime_error("invalid option value: " + tok);
    storage = v;
  }
};

template <class T>
struct typed_value<std::vector<T>> : value_semantic_base {
  bool multi_ = false;
  typed_value* multitoken() {
    multi_ = true;
    return this;
  }
  bool is_multitoken() const override { return multi_; }
  void parse(std::any& storage, const std::string& tok) const override {
    std::istringstream ss(tok);
    T v{};
    ss >> v;
    if (ss.fail()) throw std::runtime_error("invalid option value: " + tok);
    if (!storage.has_value()) storage = std::vector<T>{};
    std::any_cast<std::vector<T>&>(storage).push_back(v);
  }
};

template <>
struct typed_value<std::string> : value_semantic_base {
  bool multi_ = false;
  typed_value* multitoken() {
    multi_ = true;
    return this;
  }
  bool is_multitoken() const override { return multi_; }
  void parse(std::any& storage, const std::string& tok) const override {
    storage = tok;
  }
};

template <>
struct typed_value<std::vector<std::string>> : value_semantic_base {
  bool multi_ = false;
  typed_value* multitoken() {
    multi_ = true;
    return this;
  }
  bool is_multitoken() const override { return multi_; }
  void parse(std::any& storage, const std::string& tok) const override {
    if (!storage.has_value()) storage = std::vector<std::string>{};
    std::any_cast<std::vector<std::string>&>(storage).push_back(tok);
  }
};

template <class T>
typed_value<T>* value() {
  return new typed_value<T>();
}

struct option_info {
  std::string long_name, short_name, desc;
  std::shared_ptr<value_semantic_base> sem;  // null = flag
};

class options_description;

class options_adder {
 public:
  explicit options_adder(options_description* d) : d_(d) {}
  options_adder& operator()(const char* spec, const char* desc);
  options_adder& operator()(const char* spec, value_semantic_base* sem,
                            const char* desc);

 private:
  options_description* d_;
};

class options_description {
 public:
  options_description() = default;
  explicit options_description(const std::string& caption)
      : caption_(caption) {}
  options_adder add_options() { return options_adder(this); }
  options_description& add(const options_description& other) {
    for (auto& o : other.opts_) opts_.push_back(o);
    return *this;
  }
  void add_option(const char* spec, value_semantic_base* sem,
                  const char* desc) {
    option_info oi;
    std::string s(spec);
    auto comma = s.find(',');
    if (comma == std::string::npos) {
      oi.long_name = s;
    } else {
      oi.long_name = s.substr(0, comma);
      oi.short_name = s.substr(comma + 1);
    }
    oi.desc = desc;
    oi.sem.reset(sem);
    opts_.push_back(std::move(oi));
  }
  const std::vector<option_info>& options() const { return opts_; }
  const std::string& caption() const { return caption_; }

 private:
  std::string caption_;
  std::vector<option_info> opts_;
};

inline options_adder& options_adder::operator()(const char* spec,
                                                const char* desc) {
  d_->add_option(spec, nullptr, desc);
  return *this;
}
inline options_adder& options_adder::operator()(const char* spec,
                                                value_semantic_base* sem,
                                                const char* desc) {
  d_->add_option(spec, sem, desc);
  return *this;
}

inline std::ostream& operator<<(std::ostream& os,
                                const options_description& d) {
  if (!d.caption().empty()) os << d.caption() << ":\n";
  for (auto& o : d.options()) {
    os << "  --" << o.long_name;
    if (!o.short_name.empty()) os << " [ -" << o.short_name << " ]";
    if (o.sem) os << " arg";
    os << "\n        " << o.desc << "\n";
  }
  return os;
}

class variable_value {
 public:
  variable_value() = default;
  explicit variable_value(std::any v) : v_(std::move(v)) {}
  template <class T>
  const T& as() const {
    return std::any_cast<const T&>(v_);
  }

 private:
  std::any v_;
};

class variables_map {
 public:
  size_t count(const std::string& name) const { return vals_.count(name); }
  const variable_value& operator[](const std::string& name) const {
    static variable_value empty;
    auto it = vals_.find(name);
    return it == vals_.end() ? empty : it->second;
  }
  std::map<std::string, variable_value> vals_;
};

struct parsed_options {
  std::map<std::string, std::any> values;
  std::vector<std::string> flags;
};

inline parsed_options parse_command_line(int argc, char** argv,
                                         const options_description& desc) {
  parsed_options out;
  auto find = [&](const std::string& tok,
                  bool is_short) -> const option_info* {
    for (auto& o : desc.options()) {
      if (is_short ? (o.short_name == tok) : (o.long_name == tok)) return &o;
    }
    throw std::runtime_error("unrecognised option '" +
                             std::string(is_short ? "-" : "--") + tok + "'");
  };
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    const option_info* oi = nullptr;
    std::string inline_val;
    bool has_inline = false;
    if (a.rfind("--", 0) == 0) {
      std::string body = a.substr(2);
      auto eq = body.find('=');
      if (eq != std::string::npos) {
        inline_val = body.substr(eq + 1);
        has_inline = true;
        body = body.substr(0, eq);
      }
      oi = find(body, false);
    } else if (a.size() >= 2 && a[0] == '-' && !isdigit((unsigned char)a[1])) {
      std::string body = a.substr(1);
      if (body.size() > 1) {
        inline_val = body.substr(1);
        has_inline = true;
        body = body.substr(0, 1);
      }
      oi = find(body, true);
    } else {
      throw std::runtime_error("unexpected positional argument '" + a + "'");
    }
    if (!oi->sem) {
      out.values[oi->long_name] = std::any{};
      continue;
    }
    auto& storage = out.values[oi->long_name];
    auto eat = [&](const std::string& tok) { oi->sem->parse(storage, tok); };
    if (has_inline) {
      eat(inline_val);
    } else {
      if (i + 1 >= argc)
        throw std::runtime_error("option '--" + oi->long_name +
                                 "' requires an argument");
      eat(argv[++i]);
      if (oi->sem->is_multitoken()) {
        while (i + 1 < argc && argv[i + 1][0] != '-') eat(argv[++i]);
      }
    }
  }
  return out;
}

inline void store(const parsed_options& po, variables_map& vm) {
  for (auto& kv : po.values) vm.vals_[kv.first] = variable_value(kv.second);
}
inline void notify(variables_map&) {}

}  // namespace program_options
}  // namespace boost
