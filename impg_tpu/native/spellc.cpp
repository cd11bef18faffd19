// Path-spelling kernel for the columnar GFA model (graph/columnar_ops.py).
//
// Role model: the reference's streaming path validation over flat vectors
// (docs/crush-perf-report.md:82 — 136 ms for a 115 MiB graph). A numpy
// formulation needs several large gather/where temporaries whose first-touch
// page faults dominate on this environment's kernel; this kernel is a single
// pass that writes each output byte exactly once.
//
// Threads split the step range; every step writes a disjoint output slice,
// so no synchronization is needed.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline uint8_t rc_base(uint8_t b) {
  switch (b) {
    case 'A': return 'T';
    case 'C': return 'G';
    case 'G': return 'C';
    case 'T': return 'A';
    case 'a': return 't';
    case 'c': return 'g';
    case 'g': return 'c';
    case 't': return 'a';
    case 'N': return 'N';
    case 'n': return 'n';
    default:  return b;  // IUPAC and others pass through like the LUT
  }
}

void spell_range(const uint8_t* blob, const int64_t* seg_off,
                 const int32_t* step_row, const uint8_t* step_rev,
                 const int64_t* out_off, uint8_t* out, int64_t lo,
                 int64_t hi) {
  for (int64_t i = lo; i < hi; ++i) {
    const int32_t r = step_row[i];
    const int64_t s = seg_off[r];
    const int64_t len = seg_off[r + 1] - s;
    uint8_t* dst = out + out_off[i];
    if (!step_rev[i]) {
      std::memcpy(dst, blob + s, static_cast<size_t>(len));
    } else {
      const uint8_t* src = blob + s + len - 1;
      for (int64_t j = 0; j < len; ++j) dst[j] = rc_base(src[-j]);
    }
  }
}

}  // namespace

extern "C" {

// out must be sized out_off[n_steps]; out_off has n_steps+1 entries.
void impg_spell_steps(const uint8_t* blob, const int64_t* seg_off,
                      const int32_t* step_row, const uint8_t* step_rev,
                      int64_t n_steps, const int64_t* out_off, uint8_t* out,
                      int32_t n_threads) {
  if (n_steps <= 0) return;
  int nt = n_threads > 0 ? n_threads : 1;
  if (nt == 1 || n_steps < 4096) {
    spell_range(blob, seg_off, step_row, step_rev, out_off, out, 0, n_steps);
    return;
  }
  // Split by output bytes, not steps, for balance on skewed segment sizes.
  const int64_t total = out_off[n_steps];
  std::vector<std::thread> threads;
  int64_t lo = 0;
  for (int t = 0; t < nt && lo < n_steps; ++t) {
    const int64_t want = total * (t + 1) / nt;
    // first step index whose out_off exceeds `want`
    int64_t hi = lo;
    while (hi < n_steps && out_off[hi + 1] <= want) ++hi;
    if (t == nt - 1 || hi >= n_steps) hi = n_steps;
    else if (hi == lo) hi = lo + 1;
    threads.emplace_back(spell_range, blob, seg_off, step_row, step_rev,
                         out_off, out, lo, hi);
    lo = hi;
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
