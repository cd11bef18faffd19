// Native GFA tokenizer -> columnar arrays (the graph-layer twin of
// paf_parser.cpp).
//
// Role model: the reference's crush GFA parse hot path
// (docs/crush-perf-report.md: 115 MiB blunt GFA in ~50 ms after
// optimization).  Produces struct-of-arrays output:
//   * one interned name table (segments, link endpoints, path steps)
//   * segment sequences as a single blob + offsets
//   * links as (a_idx, a_rev, b_idx, b_rev)
//   * paths as CSR (path_off -> step_name_idx / step_rev) with names,
//     W lines converted to PanSN-range path names (graph/gfa.py contract)
//
// Semantics mirror graph/gfa.py Gfa.parse EXACTLY (it remains the oracle):
// malformed lines with too few fields are skipped, the LAST H line wins,
// P steps drop their final orientation char whatever it is and rev is
// (last char == '-'), empty step tokens are skipped, S tags and L
// overlaps are ignored (blunt 0M contract), '#' comments skipped, and a
// bad W walk orientation is a hard error.

#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct GfaOut {
    std::string error;
    std::string header;  // last H line (empty = default)

    // Interned names (all referenced ids, in first-seen order).
    std::string names_blob;             // concatenated
    std::vector<int64_t> name_offsets;  // n_names + 1

    // Segments.
    std::vector<int32_t> seg_name_idx;
    std::string seq_blob;
    std::vector<int64_t> seq_offsets;  // n_segs + 1

    // Links.
    std::vector<int32_t> link_a, link_b;
    std::vector<int8_t> link_a_rev, link_b_rev;

    // Paths (CSR).
    std::string path_names_blob;
    std::vector<int64_t> path_name_offsets;  // n_paths + 1
    std::vector<int8_t> path_is_walk;
    std::vector<int64_t> path_off;  // n_paths + 1
    std::vector<int32_t> step_name_idx;
    std::vector<int8_t> step_rev;

    std::unordered_map<std::string_view, int32_t> intern;
    // Fast intern for canonical decimal names (the overwhelmingly common
    // case: numeric node ids): value -> idx + 1, 0 = absent.  Capped so a
    // stray huge id can't balloon memory; overflow falls to the hash map.
    std::vector<int32_t> numeric_intern;
    static constexpr uint32_t kNumericCap = 1u << 25;  // 32M ids, 128 MB max

    int32_t add_name(std::string_view s) {
        int32_t idx = (int32_t)(name_offsets.size() - 1);
        names_blob.append(s);
        name_offsets.push_back((int64_t)names_blob.size());
        return idx;
    }

    int32_t intern_name(std::string_view s) {
        // Canonical decimal (no leading zeros except "0") up to 9 digits.
        if (!s.empty() && s.size() <= 9 &&
            (s[0] != '0' || s.size() == 1)) {
            uint32_t v = 0;
            bool numeric = true;
            for (char c : s) {
                if (c < '0' || c > '9') {
                    numeric = false;
                    break;
                }
                v = v * 10 + (uint32_t)(c - '0');
            }
            if (numeric && v < kNumericCap) {
                if (v >= numeric_intern.size()) {
                    size_t grow = numeric_intern.empty()
                                      ? 1024
                                      : numeric_intern.size() * 2;
                    numeric_intern.resize(
                        std::max<size_t>(grow, (size_t)v + 1), 0);
                }
                int32_t& slot = numeric_intern[v];
                if (slot == 0) slot = add_name(s) + 1;
                return slot - 1;
            }
        }
        auto it = intern.find(s);
        if (it != intern.end()) return it->second;
        int32_t idx = add_name(s);
        // string_view into names_blob would dangle on realloc; key views
        // must point into the INPUT buffer, which outlives the parse.
        intern.emplace(s, idx);
        return idx;
    }
};

// Split a line into tab-separated fields (mirrors str.split("\t")).
inline void split_fields(const char* line, const char* lend,
                         std::vector<std::string_view>& out) {
    out.clear();
    const char* s = line;
    for (const char* p = line; p <= lend; ++p) {
        if (p == lend || *p == '\t') {
            out.emplace_back(s, (size_t)(p - s));
            s = p + 1;
        }
    }
}

}  // namespace

extern "C" {

void* impg_gfa_parse(const char* data, size_t len) {
    auto* o = new GfaOut();
    o->name_offsets.push_back(0);
    o->seq_offsets.push_back(0);
    o->path_name_offsets.push_back(0);
    o->path_off.push_back(0);
    o->seq_blob.reserve(len / 2);
    o->names_blob.reserve(len / 32 + 1024);
    o->step_name_idx.reserve(len / 16 + 1024);
    o->step_rev.reserve(len / 16 + 1024);

    const char* p = data;
    const char* end = data + len;
    std::vector<std::string_view> f;
    while (p < end) {
        const char* line = p;
        const char* eol = (const char*)memchr(p, '\n', (size_t)(end - p));
        const char* lend = eol ? eol : end;
        if (lend > line && lend[-1] == '\r') --lend;
        p = eol ? eol + 1 : end;
        if (line == lend || *line == '#') continue;
        char kind = *line;
        if (kind != 'H' && kind != 'S' && kind != 'L' && kind != 'P' &&
            kind != 'W')
            continue;
        split_fields(line, lend, f);
        if (f[0].size() != 1) continue;
        if (kind == 'H') {
            o->header.assign(line, (size_t)(lend - line));
        } else if (kind == 'S' && f.size() >= 3) {
            o->seg_name_idx.push_back(o->intern_name(f[1]));
            o->seq_blob.append(f[2]);
            o->seq_offsets.push_back((int64_t)o->seq_blob.size());
        } else if (kind == 'L' && f.size() >= 6) {
            o->link_a.push_back(o->intern_name(f[1]));
            o->link_a_rev.push_back(f[2] == "-" ? 1 : 0);
            o->link_b.push_back(o->intern_name(f[3]));
            o->link_b_rev.push_back(f[4] == "-" ? 1 : 0);
        } else if (kind == 'P' && f.size() >= 3) {
            o->path_names_blob.append(f[1]);
            o->path_name_offsets.push_back(
                (int64_t)o->path_names_blob.size());
            o->path_is_walk.push_back(0);
            const char* sp = f[2].data();
            const char* send = sp + f[2].size();
            while (sp < send) {
                const char* tok = sp;
                while (sp < send && *sp != ',') ++sp;
                size_t tl = (size_t)(sp - tok);
                if (sp < send) ++sp;  // skip comma
                if (tl == 0) continue;
                bool rev = tok[tl - 1] == '-';
                o->step_name_idx.push_back(
                    o->intern_name(std::string_view(tok, tl - 1)));
                o->step_rev.push_back(rev ? 1 : 0);
            }
            o->path_off.push_back((int64_t)o->step_name_idx.size());
        } else if (kind == 'W' && f.size() >= 7) {
            std::string nm;
            nm.reserve(f[1].size() + f[2].size() + f[3].size() +
                       f[4].size() + f[5].size() + 4);
            nm.append(f[1]);
            nm.push_back('#');
            nm.append(f[2]);
            nm.push_back('#');
            nm.append(f[3]);
            nm.push_back(':');
            nm.append(f[4]);
            nm.push_back('-');
            nm.append(f[5]);
            o->path_names_blob.append(nm);
            o->path_name_offsets.push_back(
                (int64_t)o->path_names_blob.size());
            o->path_is_walk.push_back(1);
            const char* sp = f[6].data();
            const char* send = sp + f[6].size();
            while (sp < send) {
                char orient = *sp;
                if (orient != '>' && orient != '<') {
                    o->error = "invalid W walk orientation";
                    return o;
                }
                const char* tok = ++sp;
                while (sp < send && *sp != '>' && *sp != '<') ++sp;
                o->step_name_idx.push_back(o->intern_name(
                    std::string_view(tok, (size_t)(sp - tok))));
                o->step_rev.push_back(orient == '<' ? 1 : 0);
            }
            o->path_off.push_back((int64_t)o->step_name_idx.size());
        }
    }
    // Keys view into the caller's buffer, which dies after this call.
    o->intern.clear();
    return o;
}

const char* impg_gfa_error(void* h) {
    auto* o = (GfaOut*)h;
    return o->error.empty() ? nullptr : o->error.c_str();
}
const char* impg_gfa_header(void* h) { return ((GfaOut*)h)->header.c_str(); }
int64_t impg_gfa_n_names(void* h) {
    return (int64_t)((GfaOut*)h)->name_offsets.size() - 1;
}
int64_t impg_gfa_names_size(void* h) {
    return (int64_t)((GfaOut*)h)->names_blob.size();
}
const char* impg_gfa_names_buf(void* h) {
    return ((GfaOut*)h)->names_blob.data();
}
const int64_t* impg_gfa_name_offsets(void* h) {
    return ((GfaOut*)h)->name_offsets.data();
}
int64_t impg_gfa_n_segs(void* h) {
    return (int64_t)((GfaOut*)h)->seg_name_idx.size();
}
const int32_t* impg_gfa_seg_name_idx(void* h) {
    return ((GfaOut*)h)->seg_name_idx.data();
}
int64_t impg_gfa_seq_size(void* h) {
    return (int64_t)((GfaOut*)h)->seq_blob.size();
}
const char* impg_gfa_seq_buf(void* h) { return ((GfaOut*)h)->seq_blob.data(); }
const int64_t* impg_gfa_seq_offsets(void* h) {
    return ((GfaOut*)h)->seq_offsets.data();
}
int64_t impg_gfa_n_links(void* h) {
    return (int64_t)((GfaOut*)h)->link_a.size();
}
const int32_t* impg_gfa_link_a(void* h) { return ((GfaOut*)h)->link_a.data(); }
const int32_t* impg_gfa_link_b(void* h) { return ((GfaOut*)h)->link_b.data(); }
const int8_t* impg_gfa_link_a_rev(void* h) {
    return ((GfaOut*)h)->link_a_rev.data();
}
const int8_t* impg_gfa_link_b_rev(void* h) {
    return ((GfaOut*)h)->link_b_rev.data();
}
int64_t impg_gfa_n_paths(void* h) {
    return (int64_t)((GfaOut*)h)->path_off.size() - 1;
}
int64_t impg_gfa_path_names_size(void* h) {
    return (int64_t)((GfaOut*)h)->path_names_blob.size();
}
const char* impg_gfa_path_names_buf(void* h) {
    return ((GfaOut*)h)->path_names_blob.data();
}
const int64_t* impg_gfa_path_name_offsets(void* h) {
    return ((GfaOut*)h)->path_name_offsets.data();
}
const int8_t* impg_gfa_path_is_walk(void* h) {
    return ((GfaOut*)h)->path_is_walk.data();
}
const int64_t* impg_gfa_path_off(void* h) {
    return ((GfaOut*)h)->path_off.data();
}
int64_t impg_gfa_n_steps(void* h) {
    return (int64_t)((GfaOut*)h)->step_name_idx.size();
}
const int32_t* impg_gfa_step_name_idx(void* h) {
    return ((GfaOut*)h)->step_name_idx.data();
}
const int8_t* impg_gfa_step_rev(void* h) {
    return ((GfaOut*)h)->step_rev.data();
}
void impg_gfa_free(void* h) { delete (GfaOut*)h; }

}  // extern "C"
