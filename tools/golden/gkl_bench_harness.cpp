// Same-VM perf baseline for the reference's GKL AVX PairHMM
// (tools/GKL/src/main/native/pairhmm — the library the phmm driver
// links, benchmarks/phmm/Makefile:36).  Reads the phmm benchmark's
// batch test-file format (PairHMMUnitTest.cpp:118-594: "num_reads
// num_haps", 5 strings per read, 1 per hap), forms the read x hap
// cross product, and times the reference's float-first/double-fallback
// likelihood loop (IntelPairHmmCSource.cpp:61-85) best-of-reps.
//
// Usage: gkl_bench <testfile> [reps]
// Prints: "pairs=<n> cells=<c> best_s=<s> gcups=<g> fallback=<k> sum=<x>"
#include <chrono>
#include <cmath>
#include <cstdio>
#include <fstream>
#include <string>
#include <vector>

#include "avx_impl.h"
#include "pairhmm_common.h"
#include "Context.h"

static double now_s() {
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
}

struct Read { std::string rs, q, i, d, c; };

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s <testfile> [reps]\n", argv[0]);
        return 2;
    }
    const int reps = argc > 2 ? atoi(argv[2]) : 3;
    ConvertChar::init();
    Context<float> ctxf;
    Context<double> ctxd;

    // parse all batches up front (the driver reads then computes; only
    // the compute loop is the kernel region, PairHMMUnitTest.cpp:560-594)
    std::vector<Read> reads;
    std::vector<std::string> haps;
    std::vector<std::pair<int, int>> pairs;  // (read idx, hap idx)
    {
        std::ifstream in(argv[1]);
        int nr, nh;
        while (in >> nr >> nh) {
            const int r0 = (int)reads.size(), h0 = (int)haps.size();
            for (int r = 0; r < nr; r++) {
                Read rd;
                in >> rd.rs >> rd.q >> rd.i >> rd.d >> rd.c;
                // normalize quals like read_batch (PairHMMUnitTest.cpp:
                // 174-177): subtract 33; q floored at 6
                for (auto* s : {&rd.q, &rd.i, &rd.d, &rd.c})
                    for (char& ch : *s) ch = (char)(ch - 33);
                for (char& ch : rd.q) if (ch < 6) ch = 6;
                reads.push_back(rd);
            }
            for (int h = 0; h < nh; h++) {
                std::string hp;
                in >> hp;
                haps.push_back(hp);
            }
            for (int r = 0; r < nr; r++)
                for (int h = 0; h < nh; h++)
                    pairs.emplace_back(r0 + r, h0 + h);
        }
    }
    long long cells = 0;
    for (auto& pr : pairs)
        cells += (long long)reads[pr.first].rs.size()
                 * (long long)haps[pr.second].size();

    double best = 1e30, sum = 0;
    long long n_fallback = 0;
    for (int rep = 0; rep < reps; rep++) {
        sum = 0;
        n_fallback = 0;
        double t0 = now_s();
        for (auto& pr : pairs) {
            const Read& rd = reads[pr.first];
            const std::string& hp = haps[pr.second];
            testcase tc;
            tc.rslen = (int)rd.rs.size();
            tc.haplen = (int)hp.size();
            tc.rs = rd.rs.c_str();
            tc.hap = hp.c_str();
            tc.q = rd.q.c_str();
            tc.i = rd.i.c_str();
            tc.d = rd.d.c_str();
            tc.c = rd.c.c_str();
            float rf = compute_fp_avxs(&tc);
            double out;
            if (rf < MIN_ACCEPTED) {
                n_fallback++;
                double rd2 = compute_fp_avxd(&tc);
                out = log10(rd2) - ctxd.LOG10_INITIAL_CONSTANT;
            } else {
                out = (double)(log10f(rf) - ctxf.LOG10_INITIAL_CONSTANT);
            }
            sum += out;
        }
        double dt = now_s() - t0;
        if (dt < best) best = dt;
    }
    printf("pairs=%zu cells=%lld best_s=%.4f gcups=%.3f fallback=%lld "
           "sum=%.6f\n",
           pairs.size(), cells, best, (double)cells / best / 1e9,
           n_fallback, sum);
    return 0;
}
