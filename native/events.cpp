// Nanopore event detection (scrappie/f5c semantics), native fast path.
//
// Exact transcription of the framework's pinned oracle
// (genomicsbench_palisade_tpu/ops/oracle/events.py, cited to
// benchmarks/abea/src/events.c): double prefix sums, windowed t-stat
// with the C's mixed float/double arithmetic, the short/long two-track
// peak detector, and CADLAG event assembly.  The Python peak detector is
// a per-sample loop; this runs it at C speed for production read sets.

#include <cmath>
#include <cstdint>
#include <cfloat>
#include <vector>

namespace {

constexpr int W1 = 3;
constexpr int W2 = 6;
constexpr float THRESH1 = 1.4f;
constexpr float THRESH2 = 9.0f;
constexpr float PEAK_HEIGHT = 0.2f;

void sums_sumsq(const float* d, int64_t n, std::vector<double>& sum,
                std::vector<double>& sumsq) {
    sum.assign(n + 1, 0.0);
    sumsq.assign(n + 1, 0.0);
    for (int64_t i = 0; i < n; i++) {
        sum[i + 1] = sum[i] + d[i];
        // the C squares in FLOAT before the double accumulation
        // (events.c:300 `data[i] * data[i]` is an f32 multiply)
        sumsq[i + 1] = sumsq[i] + (double)(d[i] * d[i]);
    }
}

std::vector<float> tstat(const std::vector<double>& sum,
                         const std::vector<double>& sumsq, int64_t n, int w) {
    std::vector<float> t(n, 0.0f);
    if (n < 2 * w || w < 2) return t;
    const float wf = (float)w;
    for (int64_t i = w; i <= n - w; i++) {
        double sum1 = sum[i], sumsq1 = sumsq[i];
        if (i > w) {
            sum1 -= sum[i - w];
            sumsq1 -= sumsq[i - w];
        }
        float sum2 = (float)(sum[i + w] - sum[i]);
        float sumsq2 = (float)(sumsq[i + w] - sumsq[i]);
        float mean1 = (float)(sum1 / wf);
        float mean2 = sum2 / wf;
        float cv = (float)(sumsq1 / wf - (double)(mean1 * mean1) +
                           (double)(sumsq2 / wf) - (double)(mean2 * mean2));
        cv = cv > FLT_MIN ? cv : FLT_MIN;
        float dm = mean2 - mean1;
        t[i] = (float)(std::fabs((double)dm) / std::sqrt((double)(cv / wf)));
    }
    return t;
}

struct Det {
    const float* signal;
    float threshold;
    int window_length;
    int64_t masked_to = 0;
    int64_t peak_pos = -1;
    float peak_value = FLT_MAX;
    bool valid_peak = false;
};

std::vector<int64_t> peaks_of(const std::vector<float>& t1,
                              const std::vector<float>& t2, int64_t n) {
    Det dets[2] = {
        {t1.data(), THRESH1, W1},
        {t2.data(), THRESH2, W2},
    };
    std::vector<int64_t> peaks;
    for (int64_t i = 0; i < n; i++) {
        for (int k = 0; k < 2; k++) {
            Det& d = dets[k];
            if (d.masked_to >= i) continue;
            float cur = d.signal[i];
            if (d.peak_pos == -1) {
                if (cur < d.peak_value) {
                    d.peak_value = cur;
                } else if (cur - d.peak_value > PEAK_HEIGHT) {
                    d.peak_value = cur;
                    d.peak_pos = i;
                }
            } else {
                if (cur > d.peak_value) {
                    d.peak_value = cur;
                    d.peak_pos = i;
                }
                if (k == 0 && d.peak_value > d.threshold) {
                    dets[1].masked_to = d.peak_pos + d.window_length;
                    dets[1].peak_pos = -1;
                    dets[1].peak_value = FLT_MAX;
                    dets[1].valid_peak = false;
                }
                if (d.peak_value - cur > PEAK_HEIGHT &&
                    d.peak_value > d.threshold)
                    d.valid_peak = true;
                if (d.valid_peak && (i - d.peak_pos) > d.window_length / 2) {
                    peaks.push_back(d.peak_pos);
                    d.peak_pos = -1;
                    d.peak_value = cur;
                    d.valid_peak = false;
                }
            }
        }
    }
    return peaks;
}

}  // namespace

extern "C" {

// Detect events over raw[0..n).  Writes up to cap events into the output
// arrays (start u64, length/mean/stdv f32); returns the event count (or
// the required count if it exceeds cap — caller retries with a larger
// buffer).
int64_t gt_detect_events(const float* raw, int64_t n, uint64_t* start,
                         float* length, float* mean, float* stdv,
                         int64_t cap) {
    std::vector<double> sum, sumsq;
    sums_sumsq(raw, n, sum, sumsq);
    auto t1 = tstat(sum, sumsq, n, W1);
    auto t2 = tstat(sum, sumsq, n, W2);
    auto peaks = peaks_of(t1, t2, n);
    std::vector<int64_t> bounds;
    bounds.push_back(0);
    for (int64_t p : peaks)
        if (p > 0 && p < n) bounds.push_back(p);
    bounds.push_back(n);
    int64_t n_ev = (int64_t)bounds.size() - 1;
    if (n_ev > cap) return n_ev;
    for (int64_t j = 0; j < n_ev; j++) {
        int64_t s = bounds[j], e = bounds[j + 1];
        float len = (float)(e - s);
        float mn = (float)(sum[e] - sum[s]) / len;
        float dsq = (float)(sumsq[e] - sumsq[s]);
        float var = dsq / len - mn * mn;
        start[j] = (uint64_t)s;
        length[j] = len;
        mean[j] = mn;
        stdv[j] = std::sqrt(var > 0.0f ? var : 0.0f);
    }
    return n_ev;
}

}  // extern "C"
