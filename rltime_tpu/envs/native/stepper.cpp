// Native batched environment stepper (SURVEY.md §2a).
//
// The reference's env throughput comes from Python subprocess workers
// around per-env emulators; the TPU-native build replaces that with an
// in-process C++ lane pool stepped in lockstep: one call advances all
// E lanes, writing fixed-shape output buffers the caller hands straight
// to jax.device_put. A worker thread pool shards lanes across cores
// (emulator stepping releases no GIL to fight over — we never re-enter
// Python inside the loop).
//
// Implemented environments:
//   * CartPole-v1 (gymnasium-exact Euler dynamics) — the [BJ] config
//     #1 task, used to validate the native path end-to-end and as the
//     throughput microbenchmark baseline.
// The lane-pool machinery (threads, lockstep barrier, buffer layout)
// is environment-agnostic: an ALE lane (ale_interface) drops into
// step_lane() unchanged when ALE headers are available.
//
// C ABI only — bound from Python with ctypes (no pybind11 in image).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

constexpr double kGravity = 9.8;
constexpr double kMassCart = 1.0;
constexpr double kMassPole = 0.1;
constexpr double kTotalMass = kMassCart + kMassPole;
constexpr double kLength = 0.5;
constexpr double kPoleMassLength = kMassPole * kLength;
constexpr double kForceMag = 10.0;
constexpr double kTau = 0.02;
constexpr double kThetaThreshold = 12.0 * 2.0 * M_PI / 360.0;
constexpr double kXThreshold = 2.4;

struct CartPoleLane {
  double s[4];
  int64_t steps = 0;
  std::mt19937_64 rng;

  void reset_state() {
    std::uniform_real_distribution<double> d(-0.05, 0.05);
    for (double& v : s) v = d(rng);
    steps = 0;
  }

  // One env step; returns (reward, terminated, truncated) via outs.
  void step(int32_t action, int32_t time_limit, float* obs_out,
            float* rew_out, uint8_t* term_out, uint8_t* trunc_out) {
    const double force = action == 1 ? kForceMag : -kForceMag;
    const double x = s[0], x_dot = s[1], th = s[2], th_dot = s[3];
    const double costh = std::cos(th), sinth = std::sin(th);
    const double temp =
        (force + kPoleMassLength * th_dot * th_dot * sinth) / kTotalMass;
    const double th_acc =
        (kGravity * sinth - costh * temp) /
        (kLength * (4.0 / 3.0 - kMassPole * costh * costh / kTotalMass));
    const double x_acc = temp - kPoleMassLength * th_acc * costh / kTotalMass;
    s[0] = x + kTau * x_dot;
    s[1] = x_dot + kTau * x_acc;
    s[2] = th + kTau * th_dot;
    s[3] = th_dot + kTau * th_acc;
    steps += 1;

    const bool terminated =
        std::fabs(s[0]) > kXThreshold || std::fabs(s[2]) > kThetaThreshold;
    const bool truncated = !terminated && steps >= time_limit;
    *rew_out = 1.0f;
    *term_out = terminated ? 1 : 0;
    *trunc_out = truncated ? 1 : 0;
    if (terminated || truncated) reset_state();
    for (int i = 0; i < 4; ++i) obs_out[i] = static_cast<float>(s[i]);
  }
};

// Lockstep lane pool: persistent worker threads, range-sharded lanes.
class LanePool {
 public:
  LanePool(int num_lanes, int num_threads)
      : num_lanes_(num_lanes),
        num_threads_(std::max(1, num_threads)) {
    if (num_threads_ > 1) {
      workers_.reserve(num_threads_);
      for (int w = 0; w < num_threads_; ++w) {
        workers_.emplace_back([this, w] { worker_loop(w); });
      }
    }
  }

  ~LanePool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      shutdown_ = true;
      epoch_ += 1;
    }
    cv_work_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Run fn(lane_begin, lane_end) across the pool and wait.
  void parallel_for(const std::function<void(int, int)>& fn) {
    if (num_threads_ <= 1) {
      fn(0, num_lanes_);
      return;
    }
    {
      std::unique_lock<std::mutex> lk(mu_);
      fn_ = &fn;
      pending_ = num_threads_;
      epoch_ += 1;
    }
    cv_work_.notify_all();
    std::unique_lock<std::mutex> lk(mu_);
    cv_done_.wait(lk, [this] { return pending_ == 0; });
  }

 private:
  void worker_loop(int w) {
    int64_t seen = 0;
    const int per = (num_lanes_ + num_threads_ - 1) / num_threads_;
    const int begin = std::min(w * per, num_lanes_);
    const int end = std::min(begin + per, num_lanes_);
    while (true) {
      const std::function<void(int, int)>* fn = nullptr;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_work_.wait(lk, [&] { return epoch_ != seen; });
        seen = epoch_;
        if (shutdown_) return;
        fn = fn_;
      }
      (*fn)(begin, end);
      {
        std::unique_lock<std::mutex> lk(mu_);
        if (--pending_ == 0) cv_done_.notify_all();
      }
    }
  }

  const int num_lanes_;
  const int num_threads_;
  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_work_, cv_done_;
  const std::function<void(int, int)>* fn_ = nullptr;
  int pending_ = 0;
  int64_t epoch_ = 0;
  bool shutdown_ = false;
};

struct CartPolePool {
  std::vector<CartPoleLane> lanes;
  LanePool pool;
  int32_t time_limit;

  CartPolePool(int n, uint64_t seed, int threads, int32_t limit)
      : pool(n, threads), time_limit(limit) {
    lanes.resize(n);
    for (int i = 0; i < n; ++i) {
      lanes[i].rng.seed(seed + static_cast<uint64_t>(i) * 0x9E3779B97F4A7C15ULL);
      lanes[i].reset_state();
    }
  }
};

}  // namespace

extern "C" {

void* cartpole_create(int32_t num_lanes, uint64_t seed,
                      int32_t num_threads, int32_t time_limit) {
  return new CartPolePool(num_lanes, seed, num_threads, time_limit);
}

void cartpole_destroy(void* handle) {
  delete static_cast<CartPolePool*>(handle);
}

void cartpole_reset(void* handle, uint64_t seed, float* obs_out) {
  auto* p = static_cast<CartPolePool*>(handle);
  for (size_t i = 0; i < p->lanes.size(); ++i) {
    p->lanes[i].rng.seed(seed + static_cast<uint64_t>(i) * 0x9E3779B97F4A7C15ULL);
    p->lanes[i].reset_state();
    for (int k = 0; k < 4; ++k)
      obs_out[i * 4 + k] = static_cast<float>(p->lanes[i].s[k]);
  }
}

void cartpole_step(void* handle, const int32_t* actions, float* obs_out,
                   float* rew_out, uint8_t* term_out, uint8_t* trunc_out) {
  auto* p = static_cast<CartPolePool*>(handle);
  p->pool.parallel_for([&](int begin, int end) {
    for (int i = begin; i < end; ++i) {
      p->lanes[i].step(actions[i], p->time_limit, obs_out + i * 4,
                       rew_out + i, term_out + i, trunc_out + i);
    }
  });
}

// Multi-step fused rollout with a caller-provided action table:
// actions laid out (steps, lanes); outputs (steps, lanes, ...).
// Amortizes the Python boundary to one call per chunk when the policy
// is cheap/scripted (benchmarks; random warmup).
void cartpole_step_many(void* handle, int32_t steps,
                        const int32_t* actions, float* obs_out,
                        float* rew_out, uint8_t* term_out,
                        uint8_t* trunc_out) {
  auto* p = static_cast<CartPolePool*>(handle);
  const size_t n = p->lanes.size();
  p->pool.parallel_for([&](int begin, int end) {
    for (int32_t t = 0; t < steps; ++t) {
      const size_t base = static_cast<size_t>(t) * n;
      for (int i = begin; i < end; ++i) {
        p->lanes[i].step(actions[base + i], p->time_limit,
                         obs_out + (base + i) * 4, rew_out + base + i,
                         term_out + base + i, trunc_out + base + i);
      }
    }
  });
}

}  // extern "C"
