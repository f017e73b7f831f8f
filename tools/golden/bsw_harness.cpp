// Golden-fixture generator for banded SWA: reads "h0 ref query" triples
// (sequences as digit strings, e.g. 0123), prints the 6 outputs of
// scalarBandedSWA with the bsw driver's default parameters.
#include <cstdio>
#include <cstring>
#include <string>
#include <iostream>
#include "bandedSWA.h"

static void fill_scmat(int a, int b, int ambig, int8_t mat[25]) {
    int i, j, k;
    for (i = k = 0; i < 4; ++i) {
        for (j = 0; j < 4; ++j) mat[k++] = i == j ? a : -b;
        mat[k++] = ambig;
    }
    for (j = 0; j < 5; ++j) mat[k++] = ambig;
}

int main() {
    int8_t mat[25];
    fill_scmat(1, 4, -1, mat);
    BandedPairWiseSW bsw(6, 1, 6, 1, 100, 5, mat, 1, 4, 1);
    int h0; std::string ref, qer;
    while (std::cin >> h0 >> ref >> qer) {
        uint8_t r[4096], q[4096];
        for (size_t i = 0; i < ref.size(); i++) r[i] = ref[i] - '0';
        for (size_t i = 0; i < qer.size(); i++) q[i] = qer[i] - '0';
        int qle, tle, gtle, gscore, max_off;
        int score = bsw.scalarBandedSWA(qer.size(), q, ref.size(), r, 100,
                                        h0, &qle, &tle, &gtle, &gscore, &max_off);
        printf("%d %d %d %d %d %d\n", score, qle, tle, gtle, gscore, max_off);
    }
    return 0;
}
