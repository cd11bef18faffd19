// Native closed-syncmer extraction (bit-exact twin of ops/syncmer.py).
//
// Role model: the reference's C seqhash syncmer iterator (used via
// syng_ffi.rs; params syng.rs:1464) and its ~80 ms 4-thread build headline
// (README.md:315).  The numpy implementation in ops/syncmer.py remains the
// semantics oracle and fallback; this kernel must produce IDENTICAL
// (positions, ids, fwd) so indexes built by either path interoperate.
//
// Pipeline per sequence: rolling 2-bit k-mer pack -> canonical(min of kmer,
// revcomp) -> mix32 hash -> monotone-deque sliding min over the w+1 inner
// k-mers -> closed-syncmer boundary test -> paired-hash canonical id.
// Parallelism: phase A (k-mer/hash fill) and phase B (window scan) each
// split across std::threads; no locks, per-thread output buffers merged.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

namespace {

inline uint32_t mix32(uint32_t x, uint32_t seed) {
    x ^= seed * 0x9E3779B9u;
    x ^= x >> 16;
    x *= 0x7FEB352Du;
    x ^= x >> 15;
    x *= 0x846CA68Bu;
    x ^= x >> 16;
    return x;
}

inline uint32_t revcomp(uint32_t code, int k) {
    uint32_t out = 0;
    for (int i = 0; i < k; ++i) {
        out = (out << 2) | ((code ^ 3u) & 3u);
        code >>= 2;
    }
    return out;
}

struct SxResult {
    std::vector<int64_t> pos;
    std::vector<uint64_t> ids;
    std::vector<uint8_t> fwd;
};

const int8_t* base_code_table() {
    static int8_t table[256];
    static bool init = false;
    if (!init) {
        std::memset(table, -1, sizeof(table));
        const char* b = "ACGT";
        for (int i = 0; i < 4; ++i) {
            table[(uint8_t)b[i]] = (int8_t)i;
            table[(uint8_t)(b[i] + 32)] = (int8_t)i;
        }
        init = true;
    }
    return table;
}

// Reverse complement of all 8-base (16-bit) packed codes; rc of a k<=8-mer
// is table[code] >> (16 - 2k) (pad bases complement into the low bits).
const uint16_t* rc16_table() {
    static uint16_t table[65536];
    static bool init = false;
    if (!init) {
        for (uint32_t x = 0; x < 65536; ++x)
            table[x] = (uint16_t)revcomp(x, 8);
        init = true;
    }
    return table;
}

// Fill kcodes/hashes/kvalid for k-mer indices [a, b).
void fill_range(const uint8_t* seq, int64_t n, int k, uint32_t seed,
                int64_t a, int64_t b, uint32_t* kcodes, uint32_t* hashes,
                uint8_t* kvalid) {
    const int8_t* tab = base_code_table();
    const uint32_t mask = (k == 16) ? 0xFFFFFFFFu : ((1u << (2 * k)) - 1);
    uint32_t code = 0;
    int64_t last_inv = a - 1;
    // Prime the first k-1 bases of the window at `a`.
    for (int64_t j = a; j < a + k - 1 && j < n; ++j) {
        int8_t c = tab[seq[j]];
        if (c < 0) {
            last_inv = j;
            c = 0;
        }
        code = ((code << 2) | (uint32_t)c) & mask;
    }
    for (int64_t i = a; i < b; ++i) {
        int64_t j = i + k - 1;
        int8_t c = tab[seq[j]];
        if (c < 0) {
            last_inv = j;
            c = 0;
        }
        code = ((code << 2) | (uint32_t)c) & mask;
        bool valid = last_inv < i;
        kcodes[i] = code;
        kvalid[i] = valid ? 1 : 0;
        if (valid) {
            uint32_t rc = k <= 8 ? (uint32_t)(rc16_table()[code] >>
                                              (16 - 2 * k))
                                 : revcomp(code, k);
            uint32_t canon = code < rc ? code : rc;
            hashes[i] = mix32(canon, seed);
        } else {
            hashes[i] = 0xFFFFFFFFu;
        }
    }
}

// Window starts [lo, hi): closed-syncmer test + id emission.  The
// monotone queue lives in a power-of-two ring buffer (capacity > w1, so
// it can never overflow) — much cheaper than std::deque.
void scan_range(const uint32_t* kcodes, const uint32_t* hashes,
                const uint8_t* kvalid, int k, int w1, uint32_t seed,
                int64_t lo, int64_t hi, SxResult& out) {
    uint32_t cap = 1;
    while ((int64_t)cap < w1 + 1) cap <<= 1;
    uint32_t ring_mask = cap - 1;
    std::vector<int64_t> ring(cap);
    uint32_t head = 0, tail = 0;  // ring[head..tail) valid, indices mod cap
    const uint16_t* rc16 = rc16_table();
    int rc_shift = 16 - 2 * k;

    int64_t last_inv = lo - 1;
    for (int64_t j = lo; j < lo + w1 - 1; ++j) {
        while (tail != head && hashes[ring[(tail - 1) & ring_mask]] >=
                                   hashes[j])
            --tail;
        ring[tail & ring_mask] = j;
        ++tail;
        if (!kvalid[j]) last_inv = j;
    }
    out.pos.reserve((hi - lo) / (w1 / 2 + 1) + 16);
    for (int64_t i = lo; i < hi; ++i) {
        int64_t j = i + w1 - 1;  // window end (inclusive)
        while (tail != head && hashes[ring[(tail - 1) & ring_mask]] >=
                                   hashes[j])
            --tail;
        ring[tail & ring_mask] = j;
        ++tail;
        if (ring[head & ring_mask] < i) ++head;
        if (!kvalid[j]) last_inv = j;
        if (last_inv >= i) continue;  // window contains an invalid k-mer
        uint32_t wmin = hashes[ring[head & ring_mask]];
        if (hashes[i] != wmin && hashes[j] != wmin) continue;
        uint32_t first_k = kcodes[i];
        uint32_t last_k = kcodes[j];
        uint64_t h_fwd = ((uint64_t)mix32(first_k, seed) << 32) |
                         mix32(last_k, seed + 1);
        uint32_t rc_first = k <= 8 ? (uint32_t)(rc16[last_k] >> rc_shift)
                                   : revcomp(last_k, k);
        uint32_t rc_last = k <= 8 ? (uint32_t)(rc16[first_k] >> rc_shift)
                                  : revcomp(first_k, k);
        uint64_t h_rev = ((uint64_t)mix32(rc_first, seed) << 32) |
                         mix32(rc_last, seed + 1);
        bool fwd = h_fwd <= h_rev;
        out.pos.push_back(i);
        out.ids.push_back(fwd ? h_fwd : h_rev);
        out.fwd.push_back(fwd ? 1 : 0);
    }
}

}  // namespace

extern "C" {

void* sx_extract(const uint8_t* seq, int64_t n, int32_t k, int32_t w,
                 uint32_t seed, int32_t threads) {
    auto* res = new SxResult();
    int64_t m = n - k + 1;  // number of k-mers
    int w1 = w + 1;
    if (m < w1 || k < 1 || k > 16) return res;
    int64_t n_win = m - w1 + 1;
    base_code_table();  // prime shared tables before any thread touches them
    rc16_table();

    std::vector<uint32_t> kcodes(m);
    std::vector<uint32_t> hashes(m);
    std::vector<uint8_t> kvalid(m);

    int nt = threads < 1 ? 1 : threads;
    int hc = (int)std::thread::hardware_concurrency();
    if (hc > 0 && nt > hc) nt = hc;
    if (n_win / 16384 < nt) nt = (int)std::max<int64_t>(1, n_win / 16384);

    if (nt == 1) {
        fill_range(seq, n, k, seed, 0, m, kcodes.data(), hashes.data(),
                   kvalid.data());
        scan_range(kcodes.data(), hashes.data(), kvalid.data(), k, w1, seed,
                   0, n_win, *res);
        return res;
    }

    {
        std::vector<std::thread> ts;
        int64_t step = (m + nt - 1) / nt;
        for (int t = 0; t < nt; ++t) {
            int64_t a = t * step, b = std::min<int64_t>(m, a + step);
            if (a >= b) break;
            ts.emplace_back(fill_range, seq, n, k, seed, a, b, kcodes.data(),
                            hashes.data(), kvalid.data());
        }
        for (auto& th : ts) th.join();
    }
    std::vector<SxResult> parts(nt);
    {
        std::vector<std::thread> ts;
        int64_t step = (n_win + nt - 1) / nt;
        for (int t = 0; t < nt; ++t) {
            int64_t a = t * step, b = std::min<int64_t>(n_win, a + step);
            if (a >= b) break;
            ts.emplace_back(scan_range, kcodes.data(), hashes.data(),
                            kvalid.data(), k, w1, seed, a, b,
                            std::ref(parts[t]));
        }
        for (auto& th : ts) th.join();
    }
    size_t total = 0;
    for (auto& p : parts) total += p.pos.size();
    res->pos.reserve(total);
    res->ids.reserve(total);
    res->fwd.reserve(total);
    for (auto& p : parts) {
        res->pos.insert(res->pos.end(), p.pos.begin(), p.pos.end());
        res->ids.insert(res->ids.end(), p.ids.begin(), p.ids.end());
        res->fwd.insert(res->fwd.end(), p.fwd.begin(), p.fwd.end());
    }
    return res;
}

int64_t sx_count(void* h) { return (int64_t)((SxResult*)h)->pos.size(); }
const int64_t* sx_pos(void* h) { return ((SxResult*)h)->pos.data(); }
const uint64_t* sx_ids(void* h) { return ((SxResult*)h)->ids.data(); }
const uint8_t* sx_fwd(void* h) { return ((SxResult*)h)->fwd.data(); }
void sx_free(void* h) { delete (SxResult*)h; }

// ── batch extraction ────────────────────────────────────────────────
// One call for a whole sequence SET (the index-build shape: many ~100 kb
// haplotypes).  Parallelism ACROSS sequences — each worker runs the
// single-thread fill+scan per sequence with reused scratch — instead of
// splitting every small sequence 4 ways (two thread-pool spawns per
// 77 kb sequence cost more than the scan itself; measured 107 ms serial
// vs 75 ms at t=4 for 90x77 kb before this API).  Results are bit-exact
// per sequence and concatenated in input order with per-seq counts.

struct SxBatch {
    SxResult all;
    std::vector<int64_t> counts;  // per input sequence
};

void* sx_extract_batch(const uint8_t* blob, const int64_t* offsets,
                       int32_t n_seqs, int32_t k, int32_t w, uint32_t seed,
                       int32_t threads) {
    auto* res = new SxBatch();
    res->counts.assign((size_t)n_seqs, 0);
    if (n_seqs <= 0 || k < 1 || k > 16) return res;
    base_code_table();
    rc16_table();
    int w1 = w + 1;

    int nt = threads < 1 ? (int)std::thread::hardware_concurrency()
                         : threads;
    if (nt < 1) nt = 1;
    if (nt > n_seqs) nt = n_seqs;
    if (nt > 16) nt = 16;

    std::vector<SxResult> parts((size_t)n_seqs);
    std::atomic<int32_t> cursor{0};
    auto worker = [&] {
        std::vector<uint32_t> kcodes, hashes;
        std::vector<uint8_t> kvalid;
        for (;;) {
            int32_t s = cursor.fetch_add(1);
            if (s >= n_seqs) return;
            const uint8_t* seq = blob + offsets[s];
            int64_t n = offsets[s + 1] - offsets[s];
            int64_t m = n - k + 1;
            if (m < w1) continue;
            int64_t n_win = m - w1 + 1;
            if ((int64_t)kcodes.size() < m) {
                kcodes.resize(m);
                hashes.resize(m);
                kvalid.resize(m);
            }
            fill_range(seq, n, k, seed, 0, m, kcodes.data(), hashes.data(),
                       kvalid.data());
            scan_range(kcodes.data(), hashes.data(), kvalid.data(), k, w1,
                       seed, 0, n_win, parts[s]);
        }
    };
    if (nt == 1) {
        worker();
    } else {
        std::vector<std::thread> ts;
        ts.reserve(nt);
        for (int t = 0; t < nt; ++t) ts.emplace_back(worker);
        for (auto& th : ts) th.join();
    }

    size_t total = 0;
    for (auto& p : parts) total += p.pos.size();
    res->all.pos.reserve(total);
    res->all.ids.reserve(total);
    res->all.fwd.reserve(total);
    for (int32_t s = 0; s < n_seqs; ++s) {
        auto& p = parts[s];
        res->counts[s] = (int64_t)p.pos.size();
        res->all.pos.insert(res->all.pos.end(), p.pos.begin(), p.pos.end());
        res->all.ids.insert(res->all.ids.end(), p.ids.begin(), p.ids.end());
        res->all.fwd.insert(res->all.fwd.end(), p.fwd.begin(), p.fwd.end());
    }
    return res;
}

// Stable LSD radix argsort of uint64 keys (the occurrence-table sort:
// ~25 ms of np.lexsort/np.argsort(kind='stable') at 250k keys becomes
// ~2 ms).  Skips passes whose byte is constant across all keys.
void sx_radix_argsort_u64(const uint64_t* keys, int64_t n,
                          int64_t* order) {
    if (n <= 0) return;
    std::vector<int64_t> tmp((size_t)n);
    int64_t* src = order;
    int64_t* dst = tmp.data();
    for (int64_t i = 0; i < n; ++i) src[i] = i;
    size_t counts[256];
    for (int pass = 0; pass < 8; ++pass) {
        int shift = pass * 8;
        std::memset(counts, 0, sizeof(counts));
        for (int64_t i = 0; i < n; ++i)
            ++counts[(keys[src[i]] >> shift) & 0xFF];
        if (counts[(keys[src[0]] >> shift) & 0xFF] == (size_t)n)
            continue;  // constant byte: pass is the identity
        size_t sum = 0;
        for (int b = 0; b < 256; ++b) {
            size_t c = counts[b];
            counts[b] = sum;
            sum += c;
        }
        for (int64_t i = 0; i < n; ++i)
            dst[counts[(keys[src[i]] >> shift) & 0xFF]++] = src[i];
        std::swap(src, dst);
    }
    if (src != order) std::memcpy(order, src, (size_t)n * sizeof(int64_t));
}

int64_t sxb_count(void* h) {
    return (int64_t)((SxBatch*)h)->all.pos.size();
}
const int64_t* sxb_pos(void* h) { return ((SxBatch*)h)->all.pos.data(); }
const uint64_t* sxb_ids(void* h) { return ((SxBatch*)h)->all.ids.data(); }
const uint8_t* sxb_fwd(void* h) { return ((SxBatch*)h)->all.fwd.data(); }
const int64_t* sxb_seq_counts(void* h) {
    return ((SxBatch*)h)->counts.data();
}
void sxb_free(void* h) { delete (SxBatch*)h; }

}  // extern "C"
