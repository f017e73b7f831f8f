// Golden-fixture generator for f5c adaptive banded event alignment:
// drives the reference's own event detection (events.c getevents),
// scaling estimation (align.c estimate_scalings_using_mom) and banded
// align (align.c:169) on synthetic signal + sequence inputs.
//
// Usage: abea_golden <model.tsv> <cases.txt>
//   model.tsv — "kmer level_mean level_stdv" per line (k=6)
//   cases.txt — per read, two lines: sequence; then n followed by n raw
//               signal samples (floats)
// Output per read:
//   R <read_index> <n_events>
//   EV <start> <length_hex> <mean_hex> <stdv_hex>   (per event, %a floats)
//   SC <scale_hex> <shift_hex>
//   N <num_aligned_pairs>
//   A <ref_pos> <read_pos>                          (per aligned pair)
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

// f5c.h pulls C++ headers, and g++ builds align.c/events.c as C++ too,
// so no linkage wrappers are needed
#include "f5c.h"
#include "f5cmisc.h"

event_table getevents(size_t nsample, float* rawptr);

static uint32_t kmer_rank(const char* kmer, uint32_t k) {
    // lexicographic rank, A=0 C=1 G=2 T=3 (nanopolish convention used by
    // the pore-model table)
    uint32_t r = 0;
    for (uint32_t i = 0; i < k; i++) {
        int code;
        switch (kmer[i]) {
            case 'A': code = 0; break;
            case 'C': code = 1; break;
            case 'G': code = 2; break;
            default: code = 3;
        }
        r = r * 4 + code;
    }
    return r;
}

int main(int argc, char** argv) {
    if (argc != 3) {
        fprintf(stderr, "usage: %s <model.tsv> <cases.txt>\n", argv[0]);
        return 2;
    }
    const uint32_t K = 6;
    std::vector<model_t> models(1 << (2 * K));
    {
        std::ifstream mf(argv[1]);
        std::string line;
        while (std::getline(mf, line)) {
            if (line.empty() || line[0] == '#' || line.rfind("kmer", 0) == 0)
                continue;
            std::istringstream ss(line);
            std::string kmer;
            double mean, stdv;
            ss >> kmer >> mean >> stdv;
            if (kmer.size() != K) continue;
            model_t& m = models[kmer_rank(kmer.c_str(), K)];
            m.level_mean = (float)mean;
            m.level_stdv = (float)stdv;
#ifdef CACHED_LOG
            // f5c.h defines CACHED_LOG: emission reads the cached log stdv
            m.level_log_stdv = (float)log((double)m.level_stdv);
#endif
        }
    }

    std::ifstream cf(argv[2]);
    std::string seq;
    int read_index = 0;
    while (cf >> seq) {
        size_t n;
        cf >> n;
        std::vector<float> raw(n);
        for (size_t i = 0; i < n; i++) cf >> raw[i];

        event_table et = getevents(n, raw.data());
        printf("R %d %zu\n", read_index++, (size_t)et.n);
        for (size_t i = 0; i < et.n; i++)
            printf("EV %llu %a %a %a\n",
                   (unsigned long long)et.event[i].start, et.event[i].length,
                   et.event[i].mean, et.event[i].stdv);

        scalings_t sc = estimate_scalings_using_mom(
            (char*)seq.c_str(), (int32_t)seq.size(), models.data(), et);
        printf("SC %a %a\n", sc.scale, sc.shift);

        std::vector<AlignedPair> pairs(et.n * 2 + 16);
        int32_t npairs = align(pairs.data(), (char*)seq.c_str(),
                               (int32_t)seq.size(), et, models.data(), sc,
                               /*sample_rate=*/4000.0f);
        if (npairs < 0) npairs = 0;  // QC-rejected read
        printf("N %d\n", npairs);
        for (int32_t i = 0; i < npairs; i++)
            printf("A %d %d\n", pairs[i].ref_pos, pairs[i].read_pos);
        free(et.event);
    }
    return 0;
}
