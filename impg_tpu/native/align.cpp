// Pairwise affine-gap alignment with CIGAR traceback for impg_tpu.
//
// Role of the reference's WFA2/lib FFI (impg.rs:43-71 thread-local
// AffineWavefronts): reconstruct base-level CIGARs for bounded segments —
// anchor-gap alignment in the `align` command and tracepoint segment
// reconstruction.  Global Gotoh DP with =/X distinction in the traceback;
// segments are bounded by the callers (anchor gaps / tracepoint spacing), so
// O(n*m) time with a 2-bit-per-cell traceback matrix is plenty.
//
// CIGAR runs use the repo codec: (op << 29) | len with ops = 0 '=', 1 'X',
// 2 'I' (query-only), 3 'D' (target-only).  Query = sequence A, target = B,
// matching PAF orientation (I consumes A, D consumes B).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int32_t NEG = INT32_MIN / 4;
constexpr uint32_t kLenMask = (1u << 29) - 1;

inline void push_run(std::vector<uint32_t>* out, uint32_t op, uint32_t len) {
  if (len == 0) return;
  if (!out->empty() && (out->back() >> 29) == op) {
    uint32_t combined = (out->back() & kLenMask) + len;
    out->back() = (op << 29) | (combined & kLenMask);
  } else {
    out->push_back((op << 29) | (len & kLenMask));
  }
}

}  // namespace

namespace {

// Shared Gotoh DP.  With free_b_end, the alignment is anchored at (0,0) but
// the target end is FREE: traceback starts from the best column of the last
// row (the ends-free extension mode of the reference's BiWFA boundary
// refinement, syng_transitive.rs:436 set_alignment_free_ends).
int64_t align_impl(const uint8_t* a, int64_t alen, const uint8_t* b,
                   int64_t blen, int match, int mismatch, int gap_open,
                   int gap_ext, uint32_t* out, int64_t out_cap,
                   bool free_b_end) {
  if (alen == 0 && blen == 0) return 0;
  if (alen == 0) {
    if (free_b_end) return 0;  // best prefix of b is empty
    if (out_cap < 1) return -1;
    out[0] = (3u << 29) | (static_cast<uint32_t>(blen) & kLenMask);
    return 1;
  }
  if (blen == 0) {
    if (out_cap < 1) return -1;
    out[0] = (2u << 29) | (static_cast<uint32_t>(alen) & kLenMask);
    return 1;
  }
  // Guard: bounded segments only.
  if (alen * blen > (int64_t)256 * 1024 * 1024) return -1;

  const int64_t cols = blen + 1;
  const int64_t n_cells = (alen + 1) * cols;
  std::vector<uint8_t> tb(static_cast<size_t>(n_cells), 0);

  auto TB = [&](int64_t i, int64_t j) -> uint8_t& {
    return tb[static_cast<size_t>(i) * cols + j];
  };

  std::vector<int32_t> Hrow(cols), Erow(cols), Frow(cols), Hup(cols), Fup(cols);
  // tb bits: 0-1 H source (0 diag, 1 from E ('D'), 2 from F ('I')),
  // bit 2: E extension (E[i][j] came from E[i][j-1]),
  // bit 3: F extension (F[i][j] came from F[i-1][j]).
  Hup[0] = 0;
  Fup[0] = NEG;
  for (int64_t j = 1; j <= blen; ++j) {
    Hup[j] = -gap_open - gap_ext * static_cast<int32_t>(j - 1);
    Fup[j] = NEG;
    TB(0, j) = 1 | 4;  // chain of D
  }
  for (int64_t i = 1; i <= alen; ++i) {
    Hrow[0] = -gap_open - gap_ext * static_cast<int32_t>(i - 1);
    Erow[0] = NEG;
    Frow[0] = std::max(Hup[0] - gap_open, Fup[0] - gap_ext);
    TB(i, 0) = 2 | 8;
    for (int64_t j = 1; j <= blen; ++j) {
      int32_t e_open = Hrow[j - 1] - gap_open;
      int32_t e_ext = Erow[j - 1] - gap_ext;
      bool e_is_ext = e_ext >= e_open;
      Erow[j] = e_is_ext ? e_ext : e_open;

      int32_t f_open = Hup[j] - gap_open;
      int32_t f_ext = Fup[j] - gap_ext;
      bool f_is_ext = f_ext >= f_open;
      Frow[j] = f_is_ext ? f_ext : f_open;

      bool is_match = a[i - 1] == b[j - 1];
      int32_t diag = Hup[j - 1] + (is_match ? match : -mismatch);

      int32_t best = diag;
      uint8_t src = 0;
      if (Erow[j] > best) {
        best = Erow[j];
        src = 1;
      }
      if (Frow[j] > best) {
        best = Frow[j];
        src = 2;
      }
      Hrow[j] = best;
      TB(i, j) = src | (e_is_ext ? 4 : 0) | (f_is_ext ? 8 : 0);
    }
    std::swap(Hup, Hrow);
    std::swap(Fup, Frow);
  }

  // Traceback from (alen, blen) — or the best last-row column when the
  // target end is free.
  int64_t j_final = blen;
  if (free_b_end) {
    int32_t best = Hup[0];
    j_final = 0;
    for (int64_t j = 1; j <= blen; ++j) {
      if (Hup[j] > best) {
        best = Hup[j];
        j_final = j;
      }
    }
  }
  std::vector<uint32_t> rev;
  rev.reserve(static_cast<size_t>((alen + blen) / 16 + 4));
  int64_t i = alen, j = j_final;
  int state = 0;  // 0 = H, 1 = E chain, 2 = F chain
  while (i > 0 || j > 0) {
    uint8_t cell = TB(i, j);
    if (state == 0) {
      uint8_t src = cell & 3;
      if (i == 0) src = 1;
      if (j == 0) src = 2;
      if (src == 0) {
        bool is_match = a[i - 1] == b[j - 1];
        push_run(&rev, is_match ? 0u : 1u, 1);
        --i;
        --j;
      } else if (src == 1) {
        state = 1;
      } else {
        state = 2;
      }
    } else if (state == 1) {
      // Consuming b ('D'); whether the chain continues depends on this cell.
      push_run(&rev, 3u, 1);
      bool ext = (cell & 4) != 0 && j > 1;
      --j;
      state = ext ? 1 : 0;
    } else {
      push_run(&rev, 2u, 1);
      bool ext = (cell & 8) != 0 && i > 1;
      --i;
      state = ext ? 2 : 0;
    }
  }

  // rev holds runs in reverse order (merged); reverse into out.
  int64_t n = static_cast<int64_t>(rev.size());
  if (n > out_cap) return -1;
  for (int64_t r = 0; r < n; ++r) out[r] = rev[static_cast<size_t>(n - 1 - r)];
  // Merge adjacent same-op runs across the reversal boundary artifacts.
  int64_t w = 0;
  for (int64_t r = 1; r < n; ++r) {
    if ((out[w] >> 29) == (out[r] >> 29)) {
      uint32_t combined = (out[w] & kLenMask) + (out[r] & kLenMask);
      out[w] = (out[w] & ~kLenMask) | (combined & kLenMask);
    } else {
      out[++w] = out[r];
    }
  }
  return n == 0 ? 0 : w + 1;
}

}  // namespace

extern "C" {

// Align query a[0..alen) against target b[0..blen); writes packed runs into
// out (capacity out_cap).  Returns the number of runs, or -1 if the problem
// is too large / capacity too small.  Scores: positive penalties.
int64_t impg_align_pair(const uint8_t* a, int64_t alen, const uint8_t* b,
                        int64_t blen, int match, int mismatch, int gap_open,
                        int gap_ext, uint32_t* out, int64_t out_cap) {
  return align_impl(a, alen, b, blen, match, mismatch, gap_open, gap_ext,
                    out, out_cap, false);
}

// Ends-free extension: align ALL of a against the best-scoring PREFIX of b.
int64_t impg_align_prefix(const uint8_t* a, int64_t alen, const uint8_t* b,
                          int64_t blen, int match, int mismatch, int gap_open,
                          int gap_ext, uint32_t* out, int64_t out_cap) {
  return align_impl(a, alen, b, blen, match, mismatch, gap_open, gap_ext,
                    out, out_cap, true);
}

}  // extern "C"
