// Golden-fixture generator: runs the reference GKL PairHMM float/double
// kernels on testcases read from stdin, prints log10 likelihoods.
// Input per line: rs hap q i d c   (strings; quals are raw printable chars)
#include <cstdio>
#include <cstring>
#include <cmath>
#include <string>
#include <iostream>
#include "avx_impl.h"
#include "pairhmm_common.h"
#include "Context.h"

int main() {
    ConvertChar::init();
    Context<float> ctxf; Context<double> ctxd;
    std::string rs, hap, q, i, d, c;
    while (std::cin >> rs >> hap >> q >> i >> d >> c) {
        testcase tc;
        tc.rslen = rs.size(); tc.haplen = hap.size();
        tc.rs = rs.c_str(); tc.hap = hap.c_str();
        tc.q = q.c_str(); tc.i = i.c_str(); tc.d = d.c_str(); tc.c = c.c_str();
        float rf = compute_fp_avxs(&tc);
        double out;
        if (rf < MIN_ACCEPTED) {
            double rd = compute_fp_avxd(&tc);
            out = log10(rd) - ctxd.LOG10_INITIAL_CONSTANT;
        } else {
            out = (double)(log10f(rf) - ctxf.LOG10_INITIAL_CONSTANT);
        }
        printf("%.17g %.9e\n", out, rf);
    }
    return 0;
}
