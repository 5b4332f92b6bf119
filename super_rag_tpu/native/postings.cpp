// Native inverted-postings builder: group 480M (term, impact, doc) triples
// by term and keep the top-P impact-ordered run per term.
//
// The host-side lexical-compaction hot path (SURVEY.md 2.9: "C++ only
// where a host-side component is genuinely native (e.g. tokenizer /
// postings builder)").  The numpy path (ops/bm25_inverted.py
// build_inverted) lexsorts the full flat triple list — O(E log E) over
// E = N*L entries (~2 minutes at the 10M x 48 north-star scale on one
// core).  Here: one counting pass, one bucket-scatter pass, then a
// per-term std::partial_sort to depth P — O(E + E log P).
//
// MUST be bit-identical to the numpy path: lexsort((-impact, term)) is
// stable, so ties (equal term, equal impact) keep flatten order.  The
// comparator (impact desc, flat-index asc) is the same total order, so
// partial_sort selects exactly the same prefix.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).
// Build: g++ -O3 -march=native -shared -fPIC postings.cpp -o libpostings.so

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct Entry {
    float impact;
    uint32_t flat;  // flat index into [n*slots]; doc = flat / slots
};

}  // namespace

extern "C" {

// terms:   [n*slots] int32, pad >= vocab (skipped)
// impact:  [n*slots] float32
// out_ids: [(vocab+1)*P] int32, caller-filled with -1
// out_imp: [(vocab+1)*P] float32, caller-filled with 0
// returns 0 on success
int build_postings(const int32_t* terms, const float* impact,
                   int64_t n, int64_t slots, int64_t vocab, int64_t P,
                   int32_t* out_ids, float* out_imp) {
    const int64_t total = n * slots;
    if (total > INT64_C(4294967295)) return 1;  // flat index is u32

    std::vector<int64_t> count(static_cast<size_t>(vocab) + 1, 0);
    for (int64_t i = 0; i < total; ++i) {
        const int32_t t = terms[i];
        if (t >= 0 && t < vocab) ++count[t];
    }
    std::vector<int64_t> offset(static_cast<size_t>(vocab) + 1, 0);
    int64_t acc = 0;
    for (int64_t t = 0; t < vocab; ++t) {
        offset[t] = acc;
        acc += count[t];
    }
    std::vector<Entry> buckets(static_cast<size_t>(acc));
    std::vector<int64_t> cursor(offset.begin(), offset.end());
    for (int64_t i = 0; i < total; ++i) {
        const int32_t t = terms[i];
        if (t >= 0 && t < vocab) {
            Entry& e = buckets[static_cast<size_t>(cursor[t]++)];
            e.impact = impact[i];
            e.flat = static_cast<uint32_t>(i);
        }
    }
    const auto cmp = [](const Entry& a, const Entry& b) {
        if (a.impact != b.impact) return a.impact > b.impact;
        return a.flat < b.flat;  // stable tie-break = flatten order
    };
    for (int64_t t = 0; t < vocab; ++t) {
        const int64_t c = count[t];
        if (c == 0) continue;
        Entry* first = buckets.data() + offset[t];
        const int64_t keep = c < P ? c : P;
        if (c > keep) {
            std::partial_sort(first, first + keep, first + c, cmp);
        } else {
            std::sort(first, first + c, cmp);
        }
        int32_t* ids_row = out_ids + t * P;
        float* imp_row = out_imp + t * P;
        for (int64_t r = 0; r < keep; ++r) {
            ids_row[r] = static_cast<int32_t>(first[r].flat / slots);
            imp_row[r] = first[r].impact;
        }
    }
    return 0;
}

}  // extern "C"
