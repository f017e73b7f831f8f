// CTC prefix beam search (the reference's fast_ctc_decode beam_search
// role, bonito basecall.py:100-105).  Semantic contract is
// models/bonito.py::beam_search_decode — same candidate construction
// order, stable sort, and first-max selection, so results match the
// Python implementation (which stays as the fallback).  The per-timestep
// Python dict walk costs seconds per long read; this is ~100x.

#include <cmath>
#include <cstdint>
#include <vector>
#include <algorithm>

namespace {
struct Beam {
    std::vector<int32_t> seq;
    double pb;   // probability mass ending in blank
    double pnb;  // probability mass ending in a non-blank
};
}  // namespace

extern "C" int64_t gt_ctc_beam(
    const float* log_probs,  // [T, C] row-major
    int64_t t_len, int64_t n_class,
    int64_t beam_size, double threshold,
    int32_t* out_labels, int64_t cap) {
    std::vector<Beam> beams;
    beams.push_back({{}, 1.0, 0.0});
    std::vector<Beam> next;
    std::vector<int32_t> live;
    std::vector<int32_t> cand;

    auto add = [&](const std::vector<int32_t>& seq, double pb, double pnb) {
        for (auto& b : next) {
            if (b.seq == seq) { b.pb += pb; b.pnb += pnb; return; }
        }
        next.push_back({seq, pb, pnb});
    };

    for (int64_t t = 0; t < t_len; t++) {
        const float* row = log_probs + t * n_class;
        live.clear();
        for (int64_t c = 0; c < n_class; c++) {
            if (std::exp((double)row[c]) >= threshold) live.push_back((int32_t)c);
        }
        next.clear();
        for (const auto& bm : beams) {
            const int32_t last = bm.seq.empty() ? -1 : bm.seq.back();
            for (int32_t c : live) {
                const double p = std::exp((double)row[c]);
                if (c == 0) {  // blank extends every prefix unchanged
                    add(bm.seq, (bm.pb + bm.pnb) * p, 0.0);
                } else if (c == last) {
                    add(bm.seq, 0.0, bm.pnb * p);  // repeat collapses
                    cand = bm.seq;
                    cand.push_back(c);
                    add(cand, 0.0, bm.pb * p);  // blank-separated
                } else {
                    cand = bm.seq;
                    cand.push_back(c);
                    add(cand, 0.0, (bm.pb + bm.pnb) * p);
                }
            }
        }
        // stable sort by total mass desc (ties keep construction order,
        // matching Python's sorted() over dict insertion order)
        std::stable_sort(next.begin(), next.end(),
                         [](const Beam& a, const Beam& b) {
                             return a.pb + a.pnb > b.pb + b.pnb;
                         });
        if ((int64_t)next.size() > beam_size) next.resize(beam_size);
        if (next.empty()) {  // every class pruned: keep the root prefix
            next.push_back({{}, 1.0, 0.0});
        }
        beams.swap(next);
    }
    // first max (strictly-greater replacement == Python's max over order)
    size_t best = 0;
    for (size_t i = 1; i < beams.size(); i++) {
        if (beams[i].pb + beams[i].pnb > beams[best].pb + beams[best].pnb)
            best = i;
    }
    const auto& seq = beams[best].seq;
    if ((int64_t)seq.size() > cap) return -1;
    for (size_t i = 0; i < seq.size(); i++) out_labels[i] = seq[i];
    return (int64_t)seq.size();
}
