// Partial-order alignment (POA) engine for impg_tpu.
//
// Functional equivalent of the reference's SPOA usage (graph.rs:416-483 via
// the spoa_rs FFI): sequences are aligned to a growing DAG with convex
// (two-piece affine) gap penalties, producing a partial-order graph that
// yields an MSA, per-sequence node paths, and a GFA.
//
// Algorithm notes:
//  - Alignment: Needleman-Wunsch over the topologically-ordered graph with
//    H/E/F matrices; convex gaps = max of two affine models (SPOA kConvex
//    semantics; with q=0,c=0 it degenerates to plain affine).
//  - Graph update: matches reuse the aligned node (or an aligned-group
//    sibling with the same base); mismatches grow the aligned group;
//    insertions chain fresh nodes (SPOA add_alignment semantics).
//  - MSA columns: aligned groups are contracted to super-nodes; column index
//    is the longest-path rank over the contracted DAG.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <limits>
#include <string>
#include <vector>

namespace {

constexpr int32_t NEG = std::numeric_limits<int32_t>::min() / 4;

struct PoaGraph {
  // Scoring (positive penalties).
  int32_t match_, mismatch_, gap_open_, gap_ext_, gap_open2_, gap_ext2_;

  std::vector<char> base;                  // per node
  std::vector<std::vector<int>> preds;     // in-neighbors
  std::vector<std::vector<int>> succs;     // out-neighbors
  std::vector<int> group_of;               // aligned-group id per node
  std::vector<std::vector<int>> groups;    // group id -> member nodes
  std::vector<std::vector<int>> paths;     // per-sequence node path
  std::vector<int64_t> edge_weight;        // parallel to edge list
  std::vector<std::pair<int, int>> edges;  // (from, to)
  std::string error;

  int new_node(char b) {
    int id = static_cast<int>(base.size());
    base.push_back(b);
    preds.emplace_back();
    succs.emplace_back();
    succ_eidx.emplace_back();
    int gid = static_cast<int>(groups.size());
    groups.push_back({id});
    group_of.push_back(gid);
    return id;
  }

  // Edge index per (from, succ position): add_edge scans only from's
  // out-neighbors (degree-bounded) instead of the whole edge list
  // (which made graph updates quadratic in total edges).
  std::vector<std::vector<int>> succ_eidx;

  void add_edge(int from, int to) {
    auto& ss = succs[from];
    auto& se = succ_eidx[from];
    for (size_t i = 0; i < ss.size(); ++i) {
      if (ss[i] == to) {
        ++edge_weight[se[i]];
        return;
      }
    }
    edges.emplace_back(from, to);
    edge_weight.push_back(1);
    ss.push_back(to);
    se.push_back(static_cast<int>(edges.size()) - 1);
    preds[to].push_back(from);
  }

  std::vector<int> topo_order() const {
    int n = static_cast<int>(base.size());
    std::vector<int> indeg(n, 0), order;
    order.reserve(n);
    for (int v = 0; v < n; ++v)
      indeg[v] = static_cast<int>(preds[v].size());
    std::vector<int> stack;
    for (int v = 0; v < n; ++v)
      if (indeg[v] == 0) stack.push_back(v);
    while (!stack.empty()) {
      int v = stack.back();
      stack.pop_back();
      order.push_back(v);
      for (int w : succs[v])
        if (--indeg[w] == 0) stack.push_back(w);
    }
    return order;
  }

  int32_t score(char a, char b) const {
    return a == b ? match_ : -mismatch_;
  }

  // DP scratch, reused across align() calls: the matrices reach ~100 MB
  // on smoothing-size blocks and this environment's first touch of fresh
  // pages costs 20-40x the arithmetic — assign() rewrites values but
  // keeps the (already-faulted) capacity.
  mutable std::vector<int32_t> H, E1, E2, F1, F2, bt_pred;
  mutable std::vector<uint8_t> bt;
  // align() row scratch (vectorized pass outputs).
  mutable std::vector<int32_t> diag_v, dpred_v, f1pred_v, f2pred_v, sc_v;

  // Align `seq` to the graph (global); returns (node_id, query_pos)
  // pairs with -1 for gaps on either side.  Dispatches to the
  // restructured two-pass kernel (align_fast, bit-identical) unless
  // IMPG_POA_REF=1 pins the original straight-line reference.
  std::vector<std::pair<int, int>> align(const std::string& seq) const {
    static const bool use_ref = [] {
      const char* e = getenv("IMPG_POA_REF");
      return e && *e == '1';
    }();
    return use_ref ? align_ref(seq) : align_fast(seq);
  }

  // Restructured DP with identical results: per graph row, the
  // predecessor-dependent candidates (F gaps, diagonal) are computed in
  // a branch-light pass the compiler vectorizes over the query
  // dimension (8-16 int32 lanes), then a cheap scalar pass runs the
  // row-local E chain + the exact tie-break precedence of align_ref
  // (diag-by-pred-order, then E1, E2, F1, F2, all strict >).  E is
  // row-local, so E matrices collapse to registers; F/H stay full
  // (predecessor rows read them).
  std::vector<std::pair<int, int>> align_fast(const std::string& seq) const {
    int n = static_cast<int>(base.size());
    int m = static_cast<int>(seq.size());
    std::vector<int> order = topo_order();
    std::vector<int> rank(n);
    for (int i = 0; i < n; ++i) rank[order[i]] = i;

    int rows = n + 1;
    int cols = m + 1;
    auto idx = [cols](int r, int c) {
      return static_cast<size_t>(r) * cols + c;
    };
    const size_t cells = static_cast<size_t>(rows) * cols;
    // No matrix-wide init: pass A writes every F cell (every node has a
    // predecessor row — the virtual start if none) and pass B writes
    // every H/bt/bt_pred cell unconditionally (best seeds at NEG/0/-1,
    // matching align_ref's assign defaults when nothing wins).  Dropping
    // the assigns removes ~17 B/cell of pure memset traffic.
    if (H.size() < cells) {
      H.resize(cells);
      F1.resize(cells);
      F2.resize(cells);
      bt.resize(cells);
      bt_pred.resize(cells);
    }
    diag_v.assign(cols, NEG);
    dpred_v.assign(cols, -1);
    f1pred_v.assign(cols, -1);
    f2pred_v.assign(cols, -1);
    sc_v.assign(cols, 0);

    const int32_t go1 = gap_open_, ge1 = gap_ext_;
    const int32_t go2 = gap_open2_, ge2 = gap_ext2_;

    // Row 0 = virtual start: H[0,0]=0, E chain along the row (same bt
    // codes as align_ref's row-0 loop).
    {
      int32_t* Hr = H.data();
      uint8_t* btr = bt.data();
      Hr[0] = 0;
      int32_t e1 = NEG, e2 = NEG;
      for (int j = 1; j <= m; ++j) {
        e1 = std::max(Hr[j - 1] - go1, e1 - ge1);
        e2 = std::max(Hr[j - 1] - go2, e2 - ge2);
        Hr[j] = std::max(e1, e2);
        btr[j] = (Hr[j] == e1) ? 2 : 4;
      }
      // Virtual-start F row is READ by rows whose predecessor is the
      // start; it has no writer, so it keeps align_ref's NEG default.
      std::fill(F1.data(), F1.data() + cols, NEG);
      std::fill(F2.data(), F2.data() + cols, NEG);
    }

    std::vector<int32_t> prow_ids;
    const char* seqb = seq.data();
    for (int oi = 0; oi < n; ++oi) {
      int v = order[oi];
      int r = oi + 1;
      prow_ids.clear();
      if (preds[v].empty()) {
        prow_ids.push_back(0);
      } else {
        for (int p : preds[v]) prow_ids.push_back(rank[p] + 1);
      }
      const size_t np = prow_ids.size();
      int32_t* __restrict Hr = H.data() + static_cast<size_t>(r) * cols;
      int32_t* __restrict F1r = F1.data() + static_cast<size_t>(r) * cols;
      int32_t* __restrict F2r = F2.data() + static_cast<size_t>(r) * cols;
      uint8_t* __restrict btr = bt.data() + static_cast<size_t>(r) * cols;
      int32_t* __restrict btpr =
          bt_pred.data() + static_cast<size_t>(r) * cols;
      int32_t* __restrict dg = diag_v.data();
      int32_t* __restrict dgp = dpred_v.data();
      int32_t* __restrict f1p_out = f1pred_v.data();
      int32_t* __restrict f2p_out = f2pred_v.data();
      int32_t* __restrict scv = sc_v.data();
      const char bv = base[v];

      // Score row: match/mismatch vs this node's base (byte compare —
      // vectorizes).
      const int32_t mt = match_, mm = -mismatch_;
      for (int j = 1; j <= m; ++j)
        scv[j] = (seqb[j - 1] == bv) ? mt : mm;

      // Pass A: predecessor-dependent candidates, vectorized over j.
      // First predecessor initializes, later ones blend on strict >
      // (ties keep the earliest p — align_ref's rule).
      for (size_t p = 0; p < np; ++p) {
        const int32_t pr = prow_ids[p];
        const int32_t* __restrict hp =
            H.data() + static_cast<size_t>(pr) * cols;
        const int32_t* __restrict f1pp =
            F1.data() + static_cast<size_t>(pr) * cols;
        const int32_t* __restrict f2pp =
            F2.data() + static_cast<size_t>(pr) * cols;
        if (p == 0) {
          for (int j = 0; j <= m; ++j) {
            int32_t c1 = std::max(hp[j] - go1, f1pp[j] - ge1);
            int32_t c2 = std::max(hp[j] - go2, f2pp[j] - ge2);
            F1r[j] = c1;
            f1p_out[j] = pr;
            F2r[j] = c2;
            f2p_out[j] = pr;
          }
          for (int j = 1; j <= m; ++j) {
            dg[j] = hp[j - 1] + scv[j];
            dgp[j] = pr;
          }
        } else {
          // Two loops, not one: seven distinct streams exceed gcc's
          // alias-versioning budget and the fused form stays scalar.
          for (int j = 0; j <= m; ++j) {
            int32_t c1 = std::max(hp[j] - go1, f1pp[j] - ge1);
            bool m1 = c1 > F1r[j];
            F1r[j] = m1 ? c1 : F1r[j];
            f1p_out[j] = m1 ? pr : f1p_out[j];
          }
          for (int j = 0; j <= m; ++j) {
            int32_t c2 = std::max(hp[j] - go2, f2pp[j] - ge2);
            bool m2 = c2 > F2r[j];
            F2r[j] = m2 ? c2 : F2r[j];
            f2p_out[j] = m2 ? pr : f2p_out[j];
          }
          for (int j = 1; j <= m; ++j) {
            int32_t cand = hp[j - 1] + scv[j];
            bool md = cand > dg[j];
            dg[j] = md ? cand : dg[j];
            dgp[j] = md ? pr : dgp[j];
          }
        }
      }

      // Pass B: row-local E chain + exact align_ref precedence.
      int32_t e1 = NEG, e2 = NEG;
      {
        // j == 0: only F candidates compete (align_ref's j==0 branch).
        int32_t best = NEG;
        uint8_t best_bt = 0;
        int32_t best_pred = -1;
        if (F1r[0] > best) {
          best = F1r[0];
          best_bt = 3;
          best_pred = f1p_out[0];
        }
        if (F2r[0] > best) {
          best = F2r[0];
          best_bt = 5;
          best_pred = f2p_out[0];
        }
        Hr[0] = best;
        btr[0] = best_bt;
        btpr[0] = best_pred;
      }
      for (int j = 1; j <= m; ++j) {
        e1 = std::max(Hr[j - 1] - go1, e1 - ge1);
        e2 = std::max(Hr[j - 1] - go2, e2 - ge2);
        // align_ref seeds best=NEG/bt0 and takes the diagonal only on
        // strict >; dg[j] is already the earliest-tie max over preds.
        int32_t best = NEG;
        uint8_t best_bt = 0;
        int32_t best_pred = -1;
        if (dg[j] > NEG) {
          best = dg[j];
          best_bt = 1;
          best_pred = dgp[j];
        }
        if (e1 > best) {
          best = e1;
          best_bt = 2;
          best_pred = -1;
        }
        if (e2 > best) {
          best = e2;
          best_bt = 4;
          best_pred = -1;
        }
        if (F1r[j] > best) {
          best = F1r[j];
          best_bt = 3;
          best_pred = f1p_out[j];
        }
        if (F2r[j] > best) {
          best = F2r[j];
          best_bt = 5;
          best_pred = f2p_out[j];
        }
        Hr[j] = best;
        btr[j] = best_bt;
        btpr[j] = best_pred;
      }
    }

    (void)idx;
    return backtrack_walk(order, rank, cols, m, n);
  }

  // End-row selection + backtrack walk shared by align_fast (identical
  // to align_ref's inline tail).
  std::vector<std::pair<int, int>> backtrack_walk(
      const std::vector<int>& order, const std::vector<int>& rank,
      int cols, int m, int n) const {
    auto idx = [cols](int r, int c) {
      return static_cast<size_t>(r) * cols + c;
    };
    int end_row = 0;
    int32_t end_score = NEG;
    if (n == 0) {
      end_row = 0;
      end_score = H[idx(0, m)];
    } else {
      for (int oi = 0; oi < n; ++oi) {
        int v = order[oi];
        if (succs[v].empty()) {
          int r = oi + 1;
          if (H[idx(r, m)] > end_score) {
            end_score = H[idx(r, m)];
            end_row = r;
          }
        }
      }
    }

    std::vector<std::pair<int, int>> aln;
    int r = end_row, j = m;
    while (r != 0 || j != 0) {
      uint8_t code = bt[idx(r, j)];
      int node = (r > 0) ? order[r - 1] : -1;
      if (code == 1) {
        aln.emplace_back(node, j - 1);
        int pr = bt_pred[idx(r, j)];
        r = pr;
        --j;
      } else if (code == 2 || code == 4) {
        aln.emplace_back(-1, j - 1);
        --j;
      } else if (code == 3 || code == 5) {
        aln.emplace_back(node, -1);
        r = bt_pred[idx(r, j)];
      } else {
        if (j == 0 && r > 0) {
          aln.emplace_back(node, -1);
          int v2 = order[r - 1];
          if (preds[v2].empty()) {
            r = 0;
          } else {
            int best_pr = rank[preds[v2][0]] + 1;
            r = best_pr;
          }
        } else if (r == 0 && j > 0) {
          aln.emplace_back(-1, j - 1);
          --j;
        } else {
          break;
        }
      }
    }
    std::reverse(aln.begin(), aln.end());
    return aln;
  }

  // Original straight-line DP (reference oracle; IMPG_POA_REF=1).
  std::vector<std::pair<int, int>> align_ref(const std::string& seq) const {
    int n = static_cast<int>(base.size());
    int m = static_cast<int>(seq.size());
    std::vector<int> order = topo_order();
    std::vector<int> rank(n);
    for (int i = 0; i < n; ++i) rank[order[i]] = i;

    // DP over (graph row = topo position + 1 virtual start row 0, query col).
    int rows = n + 1;
    int cols = m + 1;
    auto idx = [cols](int r, int c) { return static_cast<size_t>(r) * cols + c; };
    const size_t cells = static_cast<size_t>(rows) * cols;
    H.assign(cells, NEG);
    E1.assign(cells, NEG);
    E2.assign(cells, NEG);
    F1.assign(cells, NEG);
    F2.assign(cells, NEG);
    // Backtrack codes: 0 none, 1 diag(from pred p), 2 E1, 3 F1(from pred p),
    // 4 E2, 5 F2(from pred p); store pred row for diag/F.
    bt.assign(cells, 0);
    bt_pred.assign(cells, -1);

    auto gap1 = [&](int len) { return gap_open_ + gap_ext_ * (len - 1); };
    (void)gap1;

    // Row 0 = virtual start (before any node).
    H[idx(0, 0)] = 0;
    for (int j = 1; j <= m; ++j) {
      int32_t a1 = H[idx(0, j - 1)] - ((j == 1) ? gap_open_ : 0) -
                   ((j > 1) ? 0 : 0);
      (void)a1;
      // E recurrences along the row.
      E1[idx(0, j)] = std::max(H[idx(0, j - 1)] - gap_open_,
                               E1[idx(0, j - 1)] - gap_ext_);
      E2[idx(0, j)] = std::max(H[idx(0, j - 1)] - gap_open2_,
                               E2[idx(0, j - 1)] - gap_ext2_);
      H[idx(0, j)] = std::max(E1[idx(0, j)], E2[idx(0, j)]);
      bt[idx(0, j)] = (H[idx(0, j)] == E1[idx(0, j)]) ? 2 : 4;
    }

    // Row-local raw pointers: the straightforward H[idx(r, j)] form
    // costs a size_t multiply + vector access per operand (~15 operands
    // per cell) and measured ~110 cycles/cell; hoisting row bases and
    // predecessor-row bases out of the j loop is a pure constant-factor
    // rewrite (identical results).
    std::vector<const int32_t*> hp, f1p, f2p;
    std::vector<int32_t> prow_ids;
    for (int oi = 0; oi < n; ++oi) {
      int v = order[oi];
      int r = oi + 1;
      // Predecessor rows (virtual start row 0 if no preds).
      prow_ids.clear();
      if (preds[v].empty()) {
        prow_ids.push_back(0);
      } else {
        for (int p : preds[v]) prow_ids.push_back(rank[p] + 1);
      }
      const size_t np = prow_ids.size();
      hp.clear();
      f1p.clear();
      f2p.clear();
      for (int pr : prow_ids) {
        hp.push_back(H.data() + static_cast<size_t>(pr) * cols);
        f1p.push_back(F1.data() + static_cast<size_t>(pr) * cols);
        f2p.push_back(F2.data() + static_cast<size_t>(pr) * cols);
      }
      const int32_t* const* hpb = hp.data();
      const int32_t* const* f1pb = f1p.data();
      const int32_t* const* f2pb = f2p.data();
      const int32_t* prb = prow_ids.data();
      int32_t* Hr = H.data() + static_cast<size_t>(r) * cols;
      int32_t* E1r = E1.data() + static_cast<size_t>(r) * cols;
      int32_t* E2r = E2.data() + static_cast<size_t>(r) * cols;
      int32_t* F1r = F1.data() + static_cast<size_t>(r) * cols;
      int32_t* F2r = F2.data() + static_cast<size_t>(r) * cols;
      uint8_t* btr = bt.data() + static_cast<size_t>(r) * cols;
      int32_t* btpr = bt_pred.data() + static_cast<size_t>(r) * cols;
      const char bv = base[v];
      for (int j = 0; j <= m; ++j) {
        int32_t best = NEG;
        uint8_t best_bt = 0;
        int32_t best_pred = -1;
        // Graph gaps (F): skip node v.
        int32_t f1 = NEG, f2 = NEG;
        int32_t f1_pred = -1, f2_pred = -1;
        for (size_t p = 0; p < np; ++p) {
          int32_t cand1 = std::max(hpb[p][j] - gap_open_,
                                   f1pb[p][j] - gap_ext_);
          if (cand1 > f1) {
            f1 = cand1;
            f1_pred = prb[p];
          }
          int32_t cand2 = std::max(hpb[p][j] - gap_open2_,
                                   f2pb[p][j] - gap_ext2_);
          if (cand2 > f2) {
            f2 = cand2;
            f2_pred = prb[p];
          }
        }
        F1r[j] = f1;
        F2r[j] = f2;
        if (j > 0) {
          // Query gaps (E).
          const int32_t e1 = std::max(Hr[j - 1] - gap_open_,
                                      E1r[j - 1] - gap_ext_);
          const int32_t e2 = std::max(Hr[j - 1] - gap_open2_,
                                      E2r[j - 1] - gap_ext2_);
          E1r[j] = e1;
          E2r[j] = e2;
          // Diagonal.
          int32_t s = score(bv, seq[static_cast<size_t>(j - 1)]);
          for (size_t p = 0; p < np; ++p) {
            int32_t cand = hpb[p][j - 1] + s;
            if (cand > best) {
              best = cand;
              best_bt = 1;
              best_pred = prb[p];
            }
          }
          if (e1 > best) {
            best = e1;
            best_bt = 2;
            best_pred = -1;
          }
          if (e2 > best) {
            best = e2;
            best_bt = 4;
            best_pred = -1;
          }
        }
        if (f1 > best) {
          best = f1;
          best_bt = 3;
          best_pred = f1_pred;
        }
        if (f2 > best) {
          best = f2;
          best_bt = 5;
          best_pred = f2_pred;
        }
        if (best > Hr[j]) {
          Hr[j] = best;
          btr[j] = best_bt;
          btpr[j] = best_pred;
        }
      }
    }

    // Global end: best over rows whose node has no successors (or virtual
    // start when the graph is empty), at column m.
    int end_row = 0;
    int32_t end_score = NEG;
    if (n == 0) {
      end_row = 0;
      end_score = H[idx(0, m)];
    } else {
      for (int oi = 0; oi < n; ++oi) {
        int v = order[oi];
        if (succs[v].empty()) {
          int r = oi + 1;
          if (H[idx(r, m)] > end_score) {
            end_score = H[idx(r, m)];
            end_row = r;
          }
        }
      }
    }

    // Backtrack.
    std::vector<std::pair<int, int>> aln;
    int r = end_row, j = m;
    while (r != 0 || j != 0) {
      uint8_t code = bt[idx(r, j)];
      int node = (r > 0) ? order[r - 1] : -1;
      if (code == 1) {
        aln.emplace_back(node, j - 1);
        int pr = bt_pred[idx(r, j)];
        r = pr;
        --j;
      } else if (code == 2 || code == 4) {
        // Gap in graph: query base consumed, no node. Walk the E chain back
        // one column at a time.
        aln.emplace_back(-1, j - 1);
        --j;
      } else if (code == 3 || code == 5) {
        // Gap in query: node consumed, no query base.
        aln.emplace_back(node, -1);
        r = bt_pred[idx(r, j)];
      } else {
        // code 0 at (r>0, j==0): pure leading graph skip.
        if (j == 0 && r > 0) {
          aln.emplace_back(node, -1);
          // No recorded pred: fall back to first predecessor row.
          int v2 = order[r - 1];
          if (preds[v2].empty()) {
            r = 0;
          } else {
            int best_pr = rank[preds[v2][0]] + 1;
            r = best_pr;
          }
        } else if (r == 0 && j > 0) {
          aln.emplace_back(-1, j - 1);
          --j;
        } else {
          break;
        }
      }
    }
    std::reverse(aln.begin(), aln.end());
    return aln;
  }

  void add_sequence(const std::string& seq) {
    if (seq.empty()) {
      paths.emplace_back();
      return;
    }
    std::vector<int> path;
    path.reserve(seq.size());
    if (base.empty()) {
      for (size_t i = 0; i < seq.size(); ++i) {
        int id = new_node(seq[i]);
        if (i > 0) add_edge(path.back(), id);
        path.push_back(id);
      }
      paths.push_back(std::move(path));
      return;
    }
    auto aln = align(seq);
    int prev = -1;
    for (auto& [node, qpos] : aln) {
      if (qpos < 0) continue;  // gap in query: graph node skipped
      char b = seq[static_cast<size_t>(qpos)];
      int use = -1;
      if (node >= 0) {
        if (base[node] == b) {
          use = node;
        } else {
          for (int sib : groups[group_of[node]]) {
            if (base[sib] == b) {
              use = sib;
              break;
            }
          }
          if (use < 0) {
            use = new_node(b);
            // Join node's aligned group.
            int gid = group_of[node];
            groups[group_of[use]].clear();
            group_of[use] = gid;
            groups[gid].push_back(use);
          }
        }
      } else {
        use = new_node(b);  // insertion
      }
      if (prev >= 0) add_edge(prev, use);
      prev = use;
      path.push_back(use);
    }
    paths.push_back(std::move(path));
  }

  // MSA columns: longest-path rank over the aligned-group contraction.
  std::vector<int> msa_columns(int* n_cols_out) const {
    int n = static_cast<int>(base.size());
    std::vector<int> order = topo_order();
    std::vector<int> col(n, 0);
    // Effective group members (groups may have stale cleared entries).
    for (int v : order) {
      int c = 0;
      for (int p : preds[v]) c = std::max(c, col[p] + 1);
      col[v] = std::max(col[v], c);
      // Propagate within the aligned group.
      for (int sib : groups[group_of[v]]) {
        if (col[sib] < col[v]) col[sib] = col[v];
      }
    }
    // Iterate once more to stabilize group/pred interactions.
    bool changed = true;
    int guard = 0;
    while (changed && guard++ < 64) {
      changed = false;
      for (int v : order) {
        int c = col[v];
        for (int p : preds[v]) c = std::max(c, col[p] + 1);
        for (int sib : groups[group_of[v]]) c = std::max(c, col[sib]);
        if (c != col[v]) {
          col[v] = c;
          changed = true;
        }
      }
    }
    int n_cols = 0;
    for (int v = 0; v < n; ++v) n_cols = std::max(n_cols, col[v] + 1);
    *n_cols_out = n_cols;
    return col;
  }
};

}  // namespace

extern "C" {

PoaGraph* impg_poa_create(int match, int mismatch, int gap_open, int gap_ext,
                          int gap_open2, int gap_ext2) {
  auto* g = new PoaGraph();
  g->match_ = match;
  g->mismatch_ = mismatch;
  g->gap_open_ = gap_open;
  g->gap_ext_ = gap_ext;
  // With q <= 0 treat as single-affine (disable the second model).
  if (gap_open2 <= 0) {
    g->gap_open2_ = 1 << 20;
    g->gap_ext2_ = 1 << 20;
  } else {
    g->gap_open2_ = gap_open2;
    g->gap_ext2_ = gap_ext2;
  }
  return g;
}

void impg_poa_add(PoaGraph* g, const char* seq, int64_t len) {
  g->add_sequence(std::string(seq, static_cast<size_t>(len)));
}

int64_t impg_poa_n_nodes(PoaGraph* g) {
  return static_cast<int64_t>(g->base.size());
}
int64_t impg_poa_n_edges(PoaGraph* g) {
  return static_cast<int64_t>(g->edges.size());
}
int64_t impg_poa_n_seqs(PoaGraph* g) {
  return static_cast<int64_t>(g->paths.size());
}

// MSA: returns number of columns; caller sizes buffers as n_seqs * n_cols.
int64_t impg_poa_msa_n_cols(PoaGraph* g) {
  int n_cols = 0;
  g->msa_columns(&n_cols);
  return n_cols;
}

void impg_poa_msa_fill(PoaGraph* g, char* out, int64_t n_cols) {
  int nc = 0;
  std::vector<int> col = g->msa_columns(&nc);
  for (size_t s = 0; s < g->paths.size(); ++s) {
    char* row = out + s * n_cols;
    memset(row, '-', static_cast<size_t>(n_cols));
    for (int node : g->paths[s]) {
      row[col[static_cast<size_t>(node)]] = g->base[static_cast<size_t>(node)];
    }
  }
}

void impg_poa_node_bases(PoaGraph* g, char* out) {
  memcpy(out, g->base.data(), g->base.size());
}

void impg_poa_edges_fill(PoaGraph* g, int32_t* from, int32_t* to,
                         int64_t* weight) {
  for (size_t i = 0; i < g->edges.size(); ++i) {
    from[i] = g->edges[i].first;
    to[i] = g->edges[i].second;
    weight[i] = g->edge_weight[i];
  }
}

int64_t impg_poa_path_len(PoaGraph* g, int64_t s) {
  return static_cast<int64_t>(g->paths[static_cast<size_t>(s)].size());
}

void impg_poa_path_fill(PoaGraph* g, int64_t s, int32_t* out) {
  const auto& p = g->paths[static_cast<size_t>(s)];
  for (size_t i = 0; i < p.size(); ++i) out[i] = p[i];
}

void impg_poa_free(PoaGraph* g) { delete g; }

}  // extern "C"
