// FlashAttention TPU CLI driver (native).
//
// Capability parity with the reference C++ driver (/root/reference/src/main.cpp,
// src/utils.cpp, include/error_utils.h): positional-arg parsing, shape
// parsed from the data directory's basename (B%d_H%d_S%d_D%d), raw-float32
// .bin tensor IO and validation, wall timing, and engine invocation.
//
// On TPU the compute engine is the JAX/Pallas runtime (there is no
// user-facing native device language on TPU); this driver owns the native
// side: argument/shape/file validation, input integrity checks, launching
// the engine process, and output verification (existence, size, finiteness).
//
// Usage: FlashAttention <naive|fa1|fa2> <forward|backward|forward_backward>
//                       <fp16|fp32|bf16> <data_dir> [--causal]

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <sys/stat.h>
#include <sys/wait.h>
#include <unistd.h>
#include <vector>

namespace {

[[noreturn]] void usage_and_exit() {
  // Parity with include/error_utils.h:15-19.
  std::fprintf(stderr,
               "Usage: FlashAttention <naive|fa1|fa2> "
               "<forward|backward|forward_backward> <fp16|fp32|bf16> "
               "<data_dir> [--causal]\n");
  std::exit(1);
}

struct Args {
  std::string method;
  std::string mode;
  std::string precision;
  std::string data_dir;
  bool causal = false;
};

Args parse_args(int argc, char **argv) {
  // Parity with src/utils.cpp:52-100; unlike the reference we also accept
  // the README's "forward-backward" spelling (documented quirk).
  Args a;
  std::vector<std::string> pos;
  for (int i = 1; i < argc; ++i) {
    std::string s = argv[i];
    if (s == "--causal") {
      a.causal = true;
    } else {
      pos.push_back(s);
    }
  }
  if (pos.size() != 4) usage_and_exit();
  a.method = pos[0];
  a.mode = pos[1];
  a.precision = pos[2];
  a.data_dir = pos[3];
  if (a.method != "naive" && a.method != "fa1" && a.method != "fa2" &&
      a.method != "fa2-naive" && a.method != "vanilla-attn") {
    std::fprintf(stderr, "error: unknown method '%s'\n", a.method.c_str());
    usage_and_exit();
  }
  if (a.mode == "forward-backward") a.mode = "forward_backward";
  if (a.mode != "forward" && a.mode != "backward" &&
      a.mode != "forward_backward") {
    std::fprintf(stderr, "error: unknown mode '%s'\n", a.mode.c_str());
    usage_and_exit();
  }
  if (a.precision != "fp16" && a.precision != "fp32" && a.precision != "bf16") {
    std::fprintf(stderr, "error: unknown precision '%s'\n",
                 a.precision.c_str());
    usage_and_exit();
  }
  // Reference dispatcher rejection rules (include/dispatcher.h:32-35,74-83).
  if (a.method != "fa2" && a.mode != "forward") {
    std::fprintf(stderr, "error: %s supports only the forward pass\n",
                 a.method.c_str());
    std::exit(1);
  }
  if (a.method != "fa2" && a.precision != "fp32") {
    std::fprintf(stderr, "error: %s supports only fp32\n", a.method.c_str());
    std::exit(1);
  }
  return a;
}

struct Shape {
  int64_t b, h, s, d;
  int64_t numel() const { return b * h * s * d; }
};

Shape parse_config_string(const std::string &data_dir) {
  // Parity with src/utils.cpp:32-49 (sscanf of the basename).
  std::string base = data_dir;
  while (!base.empty() && base.back() == '/') base.pop_back();
  auto slash = base.find_last_of('/');
  if (slash != std::string::npos) base = base.substr(slash + 1);
  Shape s{};
  long long b = 0, h = 0, sl = 0, d = 0;
  if (std::sscanf(base.c_str(), "B%lld_H%lld_S%lld_D%lld", &b, &h, &sl, &d) !=
      4) {
    std::fprintf(stderr,
                 "error: data dir basename '%s' does not match "
                 "B<B>_H<H>_S<S>_D<D>\n",
                 base.c_str());
    std::exit(1);
  }
  s.b = b;
  s.h = h;
  s.s = sl;
  s.d = d;
  return s;
}

bool file_exists(const std::string &p) {
  struct stat st {};
  return ::stat(p.c_str(), &st) == 0 && S_ISREG(st.st_mode);
}

int64_t file_size(const std::string &p) {
  struct stat st {};
  if (::stat(p.c_str(), &st) != 0) return -1;
  return static_cast<int64_t>(st.st_size);
}

// Raw little-endian float32 blob load (parity with src/utils.cpp:10-18).
std::vector<float> load_binary_file(const std::string &path, int64_t numel) {
  std::FILE *f = std::fopen(path.c_str(), "rb");
  if (!f) {
    std::perror(path.c_str());
    std::exit(1);
  }
  std::vector<float> out(static_cast<size_t>(numel));
  size_t got = std::fread(out.data(), sizeof(float), out.size(), f);
  std::fclose(f);
  if (got != out.size()) {
    std::fprintf(stderr, "error: %s: expected %lld floats, read %zu\n",
                 path.c_str(), static_cast<long long>(numel), got);
    std::exit(1);
  }
  return out;
}

struct TensorStats {
  double min = 0, max = 0, mean = 0;
  int64_t nonfinite = 0;
};

TensorStats validate_tensor(const std::vector<float> &x) {
  TensorStats st;
  if (x.empty()) return st;
  double sum = 0;
  st.min = st.max = x[0];
  for (float v : x) {
    if (!std::isfinite(v)) {
      ++st.nonfinite;
      continue;
    }
    st.min = std::min(st.min, static_cast<double>(v));
    st.max = std::max(st.max, static_cast<double>(v));
    sum += v;
  }
  st.mean = sum / static_cast<double>(x.size());
  return st;
}

class TimerCPU {
  // Parity with include/timer.h:79-115 (chrono-based), aggregated like
  // TimerManager (:118-164).
 public:
  void start() { t0_ = std::chrono::steady_clock::now(); }
  void stop() {
    auto t1 = std::chrono::steady_clock::now();
    total_ms_ +=
        std::chrono::duration<double, std::milli>(t1 - t0_).count();
  }
  double total_ms() const { return total_ms_; }

 private:
  std::chrono::steady_clock::time_point t0_;
  double total_ms_ = 0.0;
};

int run_engine(const Args &a) {
  // The TPU compute path lives in the JAX/Pallas engine; launch it as a
  // child process with the same positional contract.
  const char *py = std::getenv("CFA_PYTHON");
  std::string python = py ? py : "python3";
  std::vector<std::string> argv_s = {
      python, "-m", "cuda_flash_attention_tpu.cli",
      a.method, a.mode, a.precision, a.data_dir};
  if (a.causal) argv_s.push_back("--causal");
  std::vector<char *> argv_c;
  argv_c.reserve(argv_s.size() + 1);
  for (auto &s : argv_s) argv_c.push_back(const_cast<char *>(s.c_str()));
  argv_c.push_back(nullptr);

  pid_t pid = ::fork();
  if (pid < 0) {
    std::perror("fork");
    return 1;
  }
  if (pid == 0) {
    ::execvp(argv_c[0], argv_c.data());
    std::perror("execvp");
    std::_Exit(127);
  }
  int status = 0;
  if (::waitpid(pid, &status, 0) < 0) {
    std::perror("waitpid");
    return 1;
  }
  if (WIFEXITED(status)) return WEXITSTATUS(status);
  return 1;
}

void check_output(const std::string &path, int64_t numel, const char *name) {
  if (!file_exists(path)) {
    std::fprintf(stderr, "error: engine did not produce %s\n", name);
    std::exit(1);
  }
  int64_t sz = file_size(path);
  if (sz != numel * static_cast<int64_t>(sizeof(float))) {
    std::fprintf(stderr, "error: %s has %lld bytes, expected %lld\n", name,
                 static_cast<long long>(sz),
                 static_cast<long long>(numel * sizeof(float)));
    std::exit(1);
  }
  auto data = load_binary_file(path, numel);
  auto st = validate_tensor(data);
  if (st.nonfinite > 0) {
    std::fprintf(stderr, "error: %s contains %lld non-finite values\n", name,
                 static_cast<long long>(st.nonfinite));
    std::exit(1);
  }
  std::printf("  %-14s min=%-12.6g max=%-12.6g mean=%-12.6g\n", name, st.min,
              st.max, st.mean);
}

}  // namespace

int main(int argc, char **argv) {
  Args args = parse_args(argc, argv);
  Shape shape = parse_config_string(args.data_dir);
  std::printf("FlashAttention TPU driver\n");
  std::printf("  method=%s mode=%s precision=%s causal=%d\n",
              args.method.c_str(), args.mode.c_str(), args.precision.c_str(),
              args.causal ? 1 : 0);
  std::printf("  config: B=%lld H=%lld S=%lld D=%lld\n",
              static_cast<long long>(shape.b), static_cast<long long>(shape.h),
              static_cast<long long>(shape.s), static_cast<long long>(shape.d));

  // Validate inputs natively before touching the engine (src/main.cpp:66-92).
  const int64_t numel = shape.numel();
  for (const char *name : {"Q.bin", "K.bin", "V.bin"}) {
    std::string p = args.data_dir + "/" + name;
    if (!file_exists(p)) {
      std::fprintf(stderr, "error: missing input %s\n", p.c_str());
      return 1;
    }
    auto data = load_binary_file(p, numel);
    auto st = validate_tensor(data);
    if (st.nonfinite > 0) {
      std::fprintf(stderr, "error: %s contains non-finite values\n", name);
      return 1;
    }
  }
  if (args.mode == "backward") {
    for (const char *name : {"O.bin", "logsumexp.bin"}) {
      std::string p = args.data_dir + "/" + name;
      if (!file_exists(p)) {
        std::fprintf(stderr,
                     "error: backward mode requires %s from a prior forward "
                     "run\n",
                     name);
        return 1;
      }
    }
  }
  std::string do_path = args.data_dir + "/dO.bin";
  if (args.mode != "forward" && !file_exists(do_path)) {
    std::printf("  dO.bin absent -> engine will use dO = 1 (L = sum(O))\n");
  }

  TimerCPU timer;
  timer.start();
  int rc = run_engine(args);
  timer.stop();
  if (rc != 0) {
    std::fprintf(stderr, "error: engine exited with code %d\n", rc);
    return rc;
  }

  std::printf("outputs:\n");
  if (args.mode != "backward") {
    check_output(args.data_dir + "/O.bin", numel, "O.bin");
    if (args.method == "fa2") {
      check_output(args.data_dir + "/logsumexp.bin",
                   shape.b * shape.h * shape.s, "logsumexp.bin");
    }
  }
  if (args.mode != "forward") {
    check_output(args.data_dir + "/dQ.bin", numel, "dQ.bin");
    check_output(args.data_dir + "/dK.bin", numel, "dK.bin");
    check_output(args.data_dir + "/dV.bin", numel, "dV.bin");
  }
  std::printf("total time (engine incl. compile): %.2f ms\n",
              timer.total_ms());
  return 0;
}
