// spumoni_native.cpp — native index-construction + CPU query engine for the
// TPU-native matching-statistics framework (spumoni_tpu).
//
// This replaces the reference's external build pipeline (Big-BWT `newscan.x`,
// `pfp_thresholds`, RePair/SLP chain invoked as subprocesses from
// /root/reference/src/spumoni.cpp:442-545) with a single in-process library:
//   * SA-IS suffix-array construction (induced sorting, Nong-Zhang-Chan)
//   * Kasai LCP
//   * run-length BWT extraction (runs, heads, lengths)
//   * Bannai-Gagie-I thresholds per run (leftmost LCP argmin between
//     consecutive same-character runs; first run of a char gets 0 — matches
//     the convention asserted by /root/reference/include/thresholds_ds.hpp:422-423)
//   * SA samples at run boundaries (raw SA values; the Python layer applies
//     the (sa - 1) mod n convention of
//     /root/reference/src/compute_ms_pml.cpp:431-434)
//
// It also provides a dense-array CPU query engine implementing the exact
// MS/PML streaming recurrence of /root/reference/src/compute_ms_pml.cpp:237-286
// and :570-623, with rank/select realized as binary searches over per-character
// run tables — the same layout the TPU kernels use. This doubles as
// (a) the measured multi-thread CPU baseline, and (b) the oracle for JAX
// engine parity tests.
//
// No code is copied from the reference; the algorithms are reimplemented from
// their published descriptions.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <algorithm>
#include <thread>
#include <atomic>
#include <functional>
#include <string>
#include <unordered_map>

typedef int64_t i64;
typedef int32_t i32;
typedef uint64_t u64;
typedef uint8_t u8;

// ---------------------------------------------------------------------------
// SA-IS (suffix array by induced sorting)
// s has length n and s[n-1] is the unique smallest character (sentinel).
// ---------------------------------------------------------------------------

namespace {

template <typename char_t, typename idx_t>
void sais_rec(const char_t* s, idx_t* SA, idx_t n, idx_t K) {
    if (n == 1) { SA[0] = 0; return; }
    std::vector<u8> t(n);
    t[n - 1] = 1;  // sentinel is S-type
    for (idx_t i = n - 2; i >= 0; --i)
        t[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && t[i + 1]);
    auto isLMS = [&](idx_t i) { return i > 0 && t[i] && !t[i - 1]; };

    std::vector<idx_t> bkt(K);
    auto get_buckets = [&](bool end) {
        std::fill(bkt.begin(), bkt.end(), (idx_t)0);
        for (idx_t i = 0; i < n; ++i) bkt[(idx_t)s[i]]++;
        idx_t sum = 0;
        for (idx_t i = 0; i < K; ++i) {
            sum += bkt[i];
            bkt[i] = end ? sum : sum - bkt[i];
        }
    };
    auto induce = [&]() {
        // induce L-type from sorted LMS/S positions
        get_buckets(false);
        for (idx_t i = 0; i < n; ++i) {
            idx_t j = SA[i] - 1;
            if (SA[i] > 0 && !t[j]) SA[bkt[(idx_t)s[j]]++] = j;
        }
        // induce S-type
        get_buckets(true);
        for (idx_t i = n - 1; i >= 0; --i) {
            idx_t j = SA[i] - 1;
            if (SA[i] > 0 && t[j]) SA[--bkt[(idx_t)s[j]]] = j;
        }
    };

    // Stage 1: place LMS suffixes at bucket ends, induce-sort LMS substrings.
    std::fill(SA, SA + n, (idx_t)-1);
    get_buckets(true);
    for (idx_t i = 1; i < n; ++i)
        if (isLMS(i)) SA[--bkt[(idx_t)s[i]]] = i;
    induce();

    // Compact sorted LMS positions into SA[0..n1).
    idx_t n1 = 0;
    for (idx_t i = 0; i < n; ++i)
        if (SA[i] > 0 && isLMS(SA[i])) SA[n1++] = SA[i];

    // Name LMS substrings in SA[n1..n).
    std::fill(SA + n1, SA + n, (idx_t)-1);
    idx_t name = 0, prev = -1;
    for (idx_t i = 0; i < n1; ++i) {
        idx_t pos = SA[i];
        bool diff = false;
        for (idx_t d = 0; d < n; ++d) {
            if (prev == -1 || pos + d == n - 1 || prev + d == n - 1 ||
                s[pos + d] != s[prev + d] || t[pos + d] != t[prev + d]) {
                diff = true;
                break;
            }
            if (d > 0 && (isLMS(pos + d) || isLMS(prev + d))) break;
        }
        if (diff) { ++name; prev = pos; }
        SA[n1 + pos / 2] = name - 1;
    }
    for (idx_t i = n - 1, j = n - 1; i >= n1; --i)
        if (SA[i] >= 0) SA[j--] = SA[i];

    // Stage 2: recurse on the reduced string if names are not unique.
    idx_t* SA1 = SA;
    idx_t* s1 = SA + n - n1;
    if (name < n1) {
        sais_rec<idx_t, idx_t>(s1, SA1, n1, name);
    } else {
        for (idx_t i = 0; i < n1; ++i) SA1[s1[i]] = i;
    }

    // Stage 3: induce the full SA from the sorted LMS suffixes.
    std::vector<idx_t> lms;
    lms.reserve(n1);
    for (idx_t i = 1; i < n; ++i)
        if (isLMS(i)) lms.push_back(i);
    for (idx_t i = 0; i < n1; ++i) SA1[i] = lms[SA1[i]];
    std::fill(SA + n1, SA + n, (idx_t)-1);
    get_buckets(true);
    for (idx_t i = n1 - 1; i >= 0; --i) {
        idx_t j = SA1[i];
        SA1[i] = -1;
        SA[--bkt[(idx_t)s[j]]] = j;
    }
    induce();
}

}  // namespace

extern "C" {

// Computes the suffix array of text+sentinel. `sa_out` must have n+1 slots.
// The sentinel (value 0, strictly smaller than all text bytes) is appended
// internally; text bytes must be >= 1. Returns 0 on success.
int spn_suffix_array(const u8* text, i64 n, i64* sa_out) {
    std::vector<u8> s(n + 1);
    for (i64 i = 0; i < n; ++i) {
        if (text[i] == 0) return -1;
        s[i] = text[i];
    }
    s[n] = 0;
    sais_rec<u8, i64>(s.data(), sa_out, n + 1, 256);
    return 0;
}

}  // extern "C" (reopened below; templates need C++ linkage)

// ---------------------------------------------------------------------------
// Full index build: BWT runs + thresholds + SA samples.
//
// Outputs are exposed through getters after spn_build() so Python can size
// numpy buffers from spn_num_runs().
// ---------------------------------------------------------------------------

struct SpnIndex {
    i64 n = 0;        // BWT length = text length + 1 (terminator)
    i64 r = 0;        // number of runs
    std::vector<u8> run_heads;       // [r] run characters (terminator coerced to 1,
                                     //     mirroring ms_rle_string.hpp:66-68)
    std::vector<i64> run_starts;     // [r] BWT position of each run start
    std::vector<i64> thresholds;     // [r] absolute threshold position (0 for the
                                     //     first run of each character)
    std::vector<i64> samples_start;  // [r] raw SA value at run start
    std::vector<i64> samples_last;   // [r] raw SA value at run end
};

template <typename idx_t>
static SpnIndex* spn_build_core(const u8* text, i64 text_len) {
    idx_t n = (idx_t)(text_len + 1);
    std::vector<u8> s(n);
    std::memcpy(s.data(), text, text_len);
    s[text_len] = 0;  // sentinel

    std::vector<idx_t> sa(n);
    sais_rec<u8, idx_t>(s.data(), sa.data(), n, 256);

    // BWT
    std::vector<u8> bwt(n);
    for (idx_t i = 0; i < n; ++i) {
        idx_t j = sa[i];
        u8 c = (j > 0) ? s[j - 1] : s[n - 1];
        bwt[i] = (c <= 1) ? 1 : c;  // coerce terminator to 1
    }

    // Kasai LCP: lcp[i] = LCP(suffix SA[i-1], suffix SA[i]), lcp[0] = 0.
    std::vector<idx_t> rank(n), lcp(n, 0);
    for (idx_t i = 0; i < n; ++i) rank[sa[i]] = i;
    idx_t h = 0;
    for (idx_t i = 0; i < n; ++i) {
        if (rank[i] > 0) {
            idx_t j = sa[rank[i] - 1];
            while (i + h < n && j + h < n && s[i + h] == s[j + h]) ++h;
            lcp[rank[i]] = h;
            if (h > 0) --h;
        } else {
            h = 0;
        }
    }

    SpnIndex* idx = new SpnIndex();
    idx->n = n;

    // Runs
    for (idx_t i = 0; i < n; ++i) {
        if (i == 0 || bwt[i] != bwt[i - 1]) {
            idx->run_heads.push_back(bwt[i]);
            idx->run_starts.push_back(i);
            idx->samples_start.push_back(sa[i]);
            idx->samples_last.push_back(sa[i]);
        } else {
            idx->samples_last.back() = sa[i];
        }
    }
    idx->r = (i64)idx->run_heads.size();
    idx->thresholds.assign(idx->r, 0);

    // Thresholds: for each run k with head c that is not the first run of c,
    // the threshold is the leftmost argmin of LCP over (prev_end, run_start],
    // where prev_end is the (inclusive) end of the previous run of c.
    // For the first run of a char the threshold stays 0
    // (thresholds_ds.hpp:478-491 returns 0 when run_head_rank == 0).
    {
        i64 prev_end_of_char[256];
        i64 prev_run_of_char[256];
        for (int c = 0; c < 256; ++c) prev_run_of_char[c] = -1;
        for (i64 k = 0; k < idx->r; ++k) {
            u8 c = idx->run_heads[k];
            i64 start = idx->run_starts[k];
            i64 end = (k + 1 < idx->r) ? idx->run_starts[k + 1] - 1 : n - 1;
            if (prev_run_of_char[c] >= 0) {
                i64 lo = prev_end_of_char[c] + 1;  // in [1, n)
                i64 best_pos = lo;
                i64 best = lcp[lo];
                for (i64 p = lo + 1; p <= start; ++p) {
                    if (lcp[p] < best) { best = lcp[p]; best_pos = p; }
                }
                idx->thresholds[k] = best_pos;
            }
            prev_run_of_char[c] = k;
            prev_end_of_char[c] = end;
        }
    }
    return idx;
}

extern "C" {

SpnIndex* spn_build(const u8* text, i64 text_len) {
    for (i64 i = 0; i < text_len; ++i)
        if (text[i] <= 1) return nullptr;  // 0/1 reserved (terminator coercion)
    // 32-bit index arithmetic halves construction memory (~13 B/char peak)
    // whenever the BWT fits in int32 — covers references to ~2 Gbp.
    if (text_len + 1 < (i64)INT32_MAX - 1)
        return spn_build_core<int32_t>(text, text_len);
    return spn_build_core<i64>(text, text_len);
}

i64 spn_num_runs(SpnIndex* idx) { return idx->r; }
i64 spn_bwt_len(SpnIndex* idx) { return idx->n; }

void spn_get_run_heads(SpnIndex* idx, u8* out) {
    std::memcpy(out, idx->run_heads.data(), idx->r);
}
void spn_get_run_starts(SpnIndex* idx, i64* out) {
    std::memcpy(out, idx->run_starts.data(), idx->r * sizeof(i64));
}
void spn_get_thresholds(SpnIndex* idx, i64* out) {
    std::memcpy(out, idx->thresholds.data(), idx->r * sizeof(i64));
}
void spn_get_samples_start(SpnIndex* idx, i64* out) {
    std::memcpy(out, idx->samples_start.data(), idx->r * sizeof(i64));
}
void spn_get_samples_last(SpnIndex* idx, i64* out) {
    std::memcpy(out, idx->samples_last.data(), idx->r * sizeof(i64));
}
void spn_free(SpnIndex* idx) { delete idx; }

}  // extern "C" (reopened below)

// ---------------------------------------------------------------------------
// Prefix-free parsing (functional equivalent of Big-BWT's newscan.x /
// pscan.x, invoked by the reference at /root/reference/src/spumoni.cpp:442-472
// with window w=10 and modulus hash_mod=100).
//
// A Karp-Rabin rolling hash over the last `w` characters marks a phrase
// boundary whenever hash % mod == 0; consecutive phrases OVERLAP by the
// w-character trigger window, so the parsing of T is prefix-free over the
// trigger-string set and T reconstructs as phrase_0 ++ phrase_1[w:] ++ ...
// The scanned string is Dollar(=2) ++ T ++ Dollar^w, mirroring the PFP
// special symbols of /root/reference/include/common.hpp:54-56 (Dollar=2,
// EndOfWord=1, EndOfDict=0 — text bytes must be >= 3 after remapping).
//
// This is the memory-lean front half of the large-reference build path: the
// parse (~n/avg_phrase ids) plus the dictionary (distinct phrases only) are
// the inputs to a PFP-based BWT/threshold induction that replaces in-memory
// SA-IS when the reference exceeds the SA-IS budget.
// ---------------------------------------------------------------------------

struct SpnParse {
    std::vector<u8>  dict_concat;  // phrases in lex order, 0x01 after each
    std::vector<i64> dict_off;     // [d] start offset of each phrase
    std::vector<i64> dict_len;     // [d] phrase length (without separator)
    std::vector<i64> occ;          // [d] occurrence count in the parse
    std::vector<i32> parse;        // [k] lex rank (1-based) of each phrase
};

static const u64 KR_PRIME = 1999999973ULL;  // Big-BWT's published KR modulus

extern "C" {

SpnParse* spn_pfp_parse(const u8* text, i64 n, int w, int mod) {
    // virtual scan string S = Dollar ++ text ++ Dollar^w (never materialized)
    i64 ns = n + 1 + w;
    auto at = [&](i64 i) -> u8 {
        return (i == 0 || i > n) ? (u8)2 : text[i - 1];
    };
    // b^(w-1) mod q for removing the outgoing character
    u64 bw = 1;
    for (int i = 0; i < w - 1; ++i) bw = (bw * 256) % KR_PRIME;

    // pass 1: phrase boundaries; phrases keyed by content hash into a map
    std::unordered_map<std::string, i32> ids;
    std::vector<std::string> phrases;          // in first-seen order
    std::vector<i32> parse_tmp;                // first-seen ids
    std::string cur;
    cur.push_back(at(0));
    u64 h = 0;
    auto close_phrase = [&]() {
        auto it = ids.find(cur);
        i32 id;
        if (it == ids.end()) {
            id = (i32)phrases.size();
            ids.emplace(cur, id);
            phrases.push_back(cur);
        } else {
            id = it->second;
        }
        parse_tmp.push_back(id);
    };
    for (i64 i = 1; i < ns; ++i) {
        u8 c = at(i);
        cur.push_back(c);
        if (i >= w) {
            if (i > w) {
                // remove char that left the window: S[i-w]
                u64 out = at(i - w);
                h = (h + KR_PRIME * 256 - out * bw % KR_PRIME) % KR_PRIME;
            }
            h = (h * 256 + c) % KR_PRIME;
            if (i == w) {
                // initialize full window hash
                h = 0;
                for (i64 j = i - w + 1; j <= i; ++j)
                    h = (h * 256 + at(j)) % KR_PRIME;
            }
            bool trigger = (h % (u64)mod == 0) && (i + w < ns);
            if (trigger || i == ns - 1) {
                close_phrase();
                if (i != ns - 1) {
                    // next phrase starts with the w-char trigger window
                    cur.assign(cur.end() - w, cur.end());
                }
            }
        }
    }

    // lex-sort the dictionary; remap parse ids to 1-based lex ranks
    SpnParse* p = new SpnParse();
    i64 d = (i64)phrases.size();
    std::vector<i32> order(d);
    for (i64 i = 0; i < d; ++i) order[i] = (i32)i;
    std::sort(order.begin(), order.end(), [&](i32 a, i32 b) {
        return phrases[a] < phrases[b];
    });
    std::vector<i32> rank(d);
    for (i64 i = 0; i < d; ++i) rank[order[i]] = (i32)i;

    p->dict_off.reserve(d);
    p->dict_len.reserve(d);
    p->occ.assign(d, 0);
    for (i64 i = 0; i < d; ++i) {
        const std::string& ph = phrases[order[i]];
        p->dict_off.push_back((i64)p->dict_concat.size());
        p->dict_len.push_back((i64)ph.size());
        p->dict_concat.insert(p->dict_concat.end(), ph.begin(), ph.end());
        p->dict_concat.push_back(1);  // EndOfWord (common.hpp:55)
    }
    p->dict_concat.push_back(0);      // EndOfDict (common.hpp:56)
    p->parse.reserve(parse_tmp.size());
    for (i32 id : parse_tmp) {
        i32 rk = rank[id];
        p->parse.push_back(rk + 1);   // 1-based like Big-BWT parses
        p->occ[rk]++;
    }
    return p;
}

i64 spn_parse_num_phrases(SpnParse* p) { return (i64)p->dict_off.size(); }
i64 spn_parse_len(SpnParse* p) { return (i64)p->parse.size(); }
i64 spn_parse_dict_bytes(SpnParse* p) { return (i64)p->dict_concat.size(); }
void spn_parse_get_dict(SpnParse* p, u8* out) {
    std::memcpy(out, p->dict_concat.data(), p->dict_concat.size());
}
void spn_parse_get_offsets(SpnParse* p, i64* off, i64* len, i64* occ) {
    std::memcpy(off, p->dict_off.data(), p->dict_off.size() * sizeof(i64));
    std::memcpy(len, p->dict_len.data(), p->dict_len.size() * sizeof(i64));
    std::memcpy(occ, p->occ.data(), p->occ.size() * sizeof(i64));
}
void spn_parse_get_parse(SpnParse* p, i32* out) {
    std::memcpy(out, p->parse.data(), p->parse.size() * sizeof(i32));
}
void spn_parse_free(SpnParse* p) { delete p; }

}  // extern "C" (reopened below)

extern "C" {

// ---------------------------------------------------------------------------
// CPU query engine over dense per-character run tables.
//
// Implements pml_pointers::_query (compute_ms_pml.cpp:237-286) and
// ms_pointers::_query (:570-623) plus the ms_t extension loop (:802-810),
// with bwt.rank/select/run_of_position realized as one binary search per step
// over the runs of the query character.
// ---------------------------------------------------------------------------

struct SpnQuery {
    i64 n = 0;            // BWT length
    i64 r = 0;
    i64 F[256];           // F[c] = # of BWT chars < c
    i64 cnt[256];         // number_of_letter(c)
    i64 char_off[257];    // per-char slice of the run tables below
    std::vector<i64> c_start;   // [r] run start position (grouped by char, sorted)
    std::vector<i64> c_len;     // [r] run length
    std::vector<i64> c_cum;     // [r] # of char occurrences in earlier runs of same char
    std::vector<i64> c_thr;     // [r] absolute threshold of this run
    std::vector<i64> c_ssamp;   // [r] (SA[run_start]-1) mod n   ("samples_start")
    std::vector<i64> c_esamp;   // [r] (SA[run_end]-1) mod n     ("samples_last")
    std::vector<i64> c_sdoc;    // [r] doc id of run-start sample (optional)
    std::vector<i64> c_edoc;    // [r] doc id of run-end sample (optional)
    bool has_doc = false;
    i64 last_run_sample = 0;    // SA[n-1] (seed for the MS recurrence)
    i64 last_run_edoc = 0;      // end_runs_doc of the last run
    i64 first_run_sdoc = 0;     // start_runs_doc of run 0 (cnt[c]==0 fallback)
    std::vector<u8> text;       // indexed text (for MS extension)
};

// Builds a query engine from builder outputs. samples are RAW SA values here;
// the (sa-1) mod n conversion is applied internally. doc arrays may be null.
SpnQuery* spn_query_new(i64 n, i64 r, const u8* run_heads, const i64* run_starts,
                        const i64* thresholds, const i64* samples_start,
                        const i64* samples_last, const i64* start_doc,
                        const i64* end_doc, const u8* text, i64 text_len) {
    SpnQuery* q = new SpnQuery();
    q->n = n;
    q->r = r;
    if (text && text_len > 0) q->text.assign(text, text + text_len);

    std::vector<i64> run_len(r);
    for (i64 k = 0; k < r; ++k)
        run_len[k] = ((k + 1 < r) ? run_starts[k + 1] : n) - run_starts[k];

    i64 count[256] = {0};
    i64 runs_of_char[256] = {0};
    for (i64 k = 0; k < r; ++k) {
        count[run_heads[k]] += run_len[k];
        runs_of_char[run_heads[k]]++;
    }
    for (int c = 0; c < 256; ++c) q->cnt[c] = count[c];
    i64 acc = 0;
    for (int c = 0; c < 256; ++c) { q->F[c] = acc; acc += count[c]; }

    q->char_off[0] = 0;
    for (int c = 0; c < 256; ++c)
        q->char_off[c + 1] = q->char_off[c] + runs_of_char[c];

    q->c_start.resize(r); q->c_len.resize(r); q->c_cum.resize(r); q->c_thr.resize(r);
    q->c_ssamp.resize(r); q->c_esamp.resize(r);
    q->has_doc = (start_doc != nullptr && end_doc != nullptr);
    if (q->has_doc) { q->c_sdoc.resize(r); q->c_edoc.resize(r); }

    i64 fill[256];
    i64 cum[256] = {0};
    for (int c = 0; c < 256; ++c) fill[c] = q->char_off[c];
    for (i64 k = 0; k < r; ++k) {
        u8 c = run_heads[k];
        i64 idx = fill[c]++;
        q->c_start[idx] = run_starts[k];
        q->c_len[idx] = run_len[k];
        q->c_cum[idx] = cum[c];
        cum[c] += run_len[k];
        q->c_thr[idx] = thresholds[k];
        q->c_ssamp[idx] = (samples_start[k] > 0) ? samples_start[k] - 1 : n - 1;
        q->c_esamp[idx] = (samples_last[k] > 0) ? samples_last[k] - 1 : n - 1;
        if (q->has_doc) { q->c_sdoc[idx] = start_doc[k]; q->c_edoc[idx] = end_doc[k]; }
    }
    q->last_run_sample = samples_last[r - 1];  // raw SA[n-1]
    if (q->has_doc) {
        q->last_run_edoc = end_doc[r - 1];
        q->first_run_sdoc = start_doc[0];
    }
    return q;
}

void spn_query_free(SpnQuery* q) { delete q; }

namespace {

// One PML query (compute_ms_pml.cpp:237-286). out_docs may be null.
void query_pml_one(const SpnQuery* q, const u8* read, i64 m, i64* out,
                   i64* out_docs) {
    i64 pos = q->n - 1;
    i64 length = 0;
    i64 doc = q->last_run_edoc;
    for (i64 i = m - 1; i >= 0; --i) {
        u8 c = read[i];
        if (q->cnt[c] == 0) {
            // compute_ms_pml.cpp:303 — the PML doc variant keeps the previous
            // doc id here, so only (length, pos) change.
            length = 0;
            pos = q->F[c];
        } else {
            i64 lo = q->char_off[c], hi = q->char_off[c + 1];
            // k = last run of c with start <= pos (or lo-1)
            i64 k = std::upper_bound(q->c_start.data() + lo, q->c_start.data() + hi,
                                     pos) - q->c_start.data() - 1;
            if (k >= lo && pos < q->c_start[k] + q->c_len[k]) {
                // bwt[pos] == c : extend
                ++length;
                pos = q->F[c] + q->c_cum[k] + (pos - q->c_start[k]);
            } else {
                i64 rnk = (k >= lo) ? q->c_cum[k] + q->c_len[k] : 0;
                length = 0;
                bool jump_down = false;
                if (k + 1 < hi) {  // rnk < cnt[c]: a next run of c exists
                    i64 thr = q->c_thr[k + 1];
                    if (pos >= thr) {
                        jump_down = true;
                        if (out_docs) doc = q->c_sdoc[k + 1];
                    }
                }
                if (jump_down) {
                    pos = q->F[c] + rnk;
                } else {
                    if (out_docs) doc = q->c_edoc[k];
                    pos = q->F[c] + rnk - 1;
                }
            }
        }
        out[i] = length;
        if (out_docs) out_docs[i] = doc;
    }
}

// One MS-pointer query (compute_ms_pml.cpp:570-623).
void query_ms_one(const SpnQuery* q, const u8* read, i64 m, i64* out_ptrs,
                  i64* out_docs) {
    i64 pos = q->n - 1;
    i64 sample = q->last_run_sample;  // SA[n-1]
    i64 doc = q->last_run_edoc;
    for (i64 i = m - 1; i >= 0; --i) {
        u8 c = read[i];
        if (q->cnt[c] == 0) {
            // compute_ms_pml.cpp:639-643: doc <- start_runs_doc[run_of(0)],
            // i.e. the start doc of run 0.
            sample = 0;
            pos = q->F[c];
            if (out_docs) doc = q->first_run_sdoc;
        } else {
            i64 lo = q->char_off[c], hi = q->char_off[c + 1];
            i64 k = std::upper_bound(q->c_start.data() + lo, q->c_start.data() + hi,
                                     pos) - q->c_start.data() - 1;
            if (k >= lo && pos < q->c_start[k] + q->c_len[k]) {
                // Note: after a cnt==0 reset the reference's unsigned sample--
                // underflows to 2^64-1, 2^64-2, ... (compute_ms_pml.cpp:582).
                // We carry the equivalent negative values; the extension below
                // treats them as out-of-bounds exactly like the huge unsigned
                // values, and the CLI prints them as unsigned 64-bit for
                // byte parity.
                --sample;
                pos = q->F[c] + q->c_cum[k] + (pos - q->c_start[k]);
            } else {
                i64 rnk = (k >= lo) ? q->c_cum[k] + q->c_len[k] : 0;
                bool jump_down = false;
                if (k + 1 < hi) {
                    i64 thr = q->c_thr[k + 1];
                    if (pos >= thr) {
                        jump_down = true;
                        sample = q->c_ssamp[k + 1];
                        if (out_docs) doc = q->c_sdoc[k + 1];
                    }
                }
                if (jump_down) {
                    pos = q->F[c] + rnk;
                } else {
                    sample = q->c_esamp[k];
                    if (out_docs) doc = q->c_edoc[k];
                    pos = q->F[c] + rnk - 1;
                }
            }
        }
        out_ptrs[i] = sample;
        if (out_docs) out_docs[i] = doc;
    }
}

// MS extension: pointers -> lengths via text comparison (compute_ms_pml.cpp:802-810).
void extend_ms_one(const SpnQuery* q, const u8* read, i64 m, const i64* ptrs,
                   i64* out_lens) {
    i64 tlen = (i64)q->text.size();
    i64 l = 0;
    for (i64 i = 0; i < m; ++i) {
        i64 pos = ptrs[i];
        while (i + l < m && pos >= 0 && pos + l < tlen &&
               (i < 1 || pos != ptrs[i - 1] + 1) &&
               read[i + l] == q->text[pos + l])
            ++l;
        out_lens[i] = l;
        l = (l == 0) ? 0 : l - 1;
    }
}

void parallel_over_reads(i64 nreads, int threads,
                         const std::function<void(i64)>& fn) {
    if (threads <= 1) {
        for (i64 i = 0; i < nreads; ++i) fn(i);
        return;
    }
    std::atomic<i64> next(0);
    std::vector<std::thread> pool;
    for (int t = 0; t < threads; ++t)
        pool.emplace_back([&]() {
            for (;;) {
                i64 i = next.fetch_add(1);
                if (i >= nreads) break;
                fn(i);
            }
        });
    for (auto& th : pool) th.join();
}

}  // namespace

// Batched queries. reads = concatenated bytes; offsets has nreads+1 entries.
// Outputs are written at the same offsets. out_docs may be null.
void spn_query_pml_batch(SpnQuery* q, const u8* reads, const i64* offsets,
                         i64 nreads, i64* out, i64* out_docs, int threads) {
    parallel_over_reads(nreads, threads, [&](i64 i) {
        i64 b = offsets[i], e = offsets[i + 1];
        query_pml_one(q, reads + b, e - b, out + b,
                      out_docs ? out_docs + b : nullptr);
    });
}

void spn_query_ms_batch(SpnQuery* q, const u8* reads, const i64* offsets,
                        i64 nreads, i64* out_ptrs, i64* out_lens, i64* out_docs,
                        int threads) {
    parallel_over_reads(nreads, threads, [&](i64 i) {
        i64 b = offsets[i], e = offsets[i + 1];
        query_ms_one(q, reads + b, e - b, out_ptrs + b,
                     out_docs ? out_docs + b : nullptr);
        if (out_lens)
            extend_ms_one(q, reads + b, e - b, out_ptrs + b, out_lens + b);
    });
}

}  // extern "C"
