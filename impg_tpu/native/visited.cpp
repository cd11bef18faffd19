// Visited-range bookkeeping for transitive walks (native hot path).
//
// Role model: the reference's SortedRanges (impg.rs:242-369) and the
// per-hit visited bookkeeping of query_transitive_bfs (impg.rs:2505-2545
// proximity check + insert-returning-uncovered).  The Python
// core/intervals.py SortedRanges remains the semantics oracle; the engine
// always uses min_distance=0 on insert (snapping disabled — proximity is
// a separate pre-check), so this structure is a pure sorted interval book.
//
// The batched API processes one depth's hits in order for MANY walks at
// once: each hit optionally (book flag) runs the too-close pre-check and
// the visited insert, and uncovered sub-ranges long enough to keep walking
// accumulate as the next frontier, exactly mirroring the Python loop in
// query/engine.py query_transitive_bfs_many.

#include <algorithm>
#include <cstdint>
#include <unordered_map>
#include <utility>
#include <vector>

namespace {

using Range = std::pair<int64_t, int64_t>;
using Book = std::vector<Range>;

struct VisitedBook {
    // key = walk * KEY_SHIFT + seq_id
    std::unordered_map<int64_t, Book> books;
    std::vector<int64_t> fw, fq, fs, fe;  // frontier accumulator
};

constexpr int64_t KEY_SHIFT = 1ll << 32;

inline size_t search_start(const Book& b, int64_t start) {
    return std::lower_bound(
               b.begin(), b.end(), start,
               [](const Range& r, int64_t v) { return r.first < v; }) -
           b.begin();
}

// Mirror of SortedRanges.insert with min_distance == 0: returns the
// sub-ranges of [start, end) not already covered, then merges the range in.
void insert_range(Book& b, int64_t start, int64_t end,
                  std::vector<Range>& uncovered) {
    uncovered.clear();
    if (start > end) std::swap(start, end);

    int64_t current = start;
    size_t i = search_start(b, start);
    if (i > 0 && b[i - 1].second > start) --i;
    while (i < b.size() && current < end) {
        int64_t r_start = b[i].first, r_end = b[i].second;
        if (r_start > end) break;
        if (current < r_start) uncovered.push_back({current, r_start});
        current = std::max(current, r_end);
        ++i;
    }
    if (current < end) uncovered.push_back({current, end});

    size_t pos = search_start(b, start);
    if (pos > 0 && b[pos - 1].second >= start) {
        b[pos - 1].second = std::max(b[pos - 1].second, end);
        pos -= 1;
    } else if (pos < b.size() && end >= b[pos].first) {
        b[pos].first = std::min(start, b[pos].first);
        b[pos].second = std::max(end, b[pos].second);
    } else {
        b.insert(b.begin() + pos, {start, end});
        return;  // no merge needed for a fresh disjoint range
    }
    // Merge forward while the grown range swallows successors.
    size_t j = pos + 1;
    while (j < b.size() && b[j].first <= b[pos].second) {
        b[pos].second = std::max(b[pos].second, b[j].second);
        ++j;
    }
    if (j > pos + 1) b.erase(b.begin() + pos + 1, b.begin() + j);
}

// Mirror of engine._too_close (impg.rs:2505-2545 proximity pre-check).
bool too_close(const Book& b, int64_t lo, int64_t hi, int64_t min_dist) {
    if (min_dist <= 0) return false;
    size_t idx = search_start(b, lo);
    if (idx > 0 && std::llabs(lo - b[idx - 1].second) < min_dist) return true;
    if (idx < b.size() && std::llabs(b[idx].first - hi) < min_dist)
        return true;
    return false;
}

}  // namespace

extern "C" {

void* vb_create() { return new VisitedBook(); }
void vb_destroy(void* h) { delete (VisitedBook*)h; }

// Masked-region preload: plain insert, result discarded.
void vb_preload(void* h, int64_t walk, int64_t qid, int64_t s, int64_t e) {
    auto* v = (VisitedBook*)h;
    std::vector<Range> scratch;
    insert_range(v->books[walk * KEY_SHIFT + qid], s, e, scratch);
}

// Seed insert: returns the uncovered sub-ranges (capped at cap).
int64_t vb_seed(void* h, int64_t walk, int64_t qid, int64_t s, int64_t e,
                int64_t* out_s, int64_t* out_e, int64_t cap) {
    auto* v = (VisitedBook*)h;
    std::vector<Range> uncovered;
    insert_range(v->books[walk * KEY_SHIFT + qid], s, e, uncovered);
    int64_t n = (int64_t)uncovered.size();
    for (int64_t i = 0; i < n && i < cap; ++i) {
        out_s[i] = uncovered[i].first;
        out_e[i] = uncovered[i].second;
    }
    return n;
}

// One depth's hits, in order.  book[i] == 0 skips bookkeeping entirely
// (self-target or subset-filtered hits).  Frontier entries accumulate
// internally; fetch with vb_frontier_*.
void vb_process(void* h, const int64_t* walk, const int64_t* qid,
                const int64_t* aq_s, const int64_t* aq_e,
                const uint8_t* book, int64_t n, int64_t min_dist,
                int64_t min_trans_len) {
    auto* v = (VisitedBook*)h;
    std::vector<Range> uncovered;
    for (int64_t i = 0; i < n; ++i) {
        if (!book[i]) continue;
        Book& b = v->books[walk[i] * KEY_SHIFT + qid[i]];
        int64_t lo = aq_s[i], hi = aq_e[i];
        if (lo > hi) std::swap(lo, hi);
        if (too_close(b, lo, hi, min_dist)) continue;
        insert_range(b, aq_s[i], aq_e[i], uncovered);
        for (const Range& r : uncovered) {
            if (std::llabs(r.second - r.first) >= min_trans_len) {
                v->fw.push_back(walk[i]);
                v->fq.push_back(qid[i]);
                v->fs.push_back(r.first);
                v->fe.push_back(r.second);
            }
        }
    }
}

int64_t vb_frontier_size(void* h) {
    return (int64_t)((VisitedBook*)h)->fw.size();
}

void vb_frontier_fetch(void* h, int64_t* w, int64_t* q, int64_t* s,
                       int64_t* e) {
    auto* v = (VisitedBook*)h;
    std::copy(v->fw.begin(), v->fw.end(), w);
    std::copy(v->fq.begin(), v->fq.end(), q);
    std::copy(v->fs.begin(), v->fs.end(), s);
    std::copy(v->fe.begin(), v->fe.end(), e);
}

void vb_frontier_clear(void* h) {
    auto* v = (VisitedBook*)h;
    v->fw.clear();
    v->fq.clear();
    v->fs.clear();
    v->fe.clear();
}

}  // extern "C"
