// Same-VM perf baseline for the reference's spoa SISD convex-NW engine
// (tools/spoa/src/sisd_alignment_engine.cpp:659-907 through the poa
// driver's exact per-batch flow, msa_spoa_omp.cpp:352-460) — the
// timing twin of poa_harness.cpp: no per-alignment printing, reps with
// best-of wall time, one consensus checksum line.
//
// Usage: poa_bench <batches.fasta> [reps]
// Prints: "windows=<n> seqs=<n> best_s=<s> seqs_per_s=<r> consensus_bytes=<c>"
#include <chrono>
#include <cstdio>
#include <fstream>
#include <memory>
#include <string>
#include <vector>

#include "sisd_alignment_engine.hpp"
#include "simd_alignment_engine.hpp"
#include "spoa/spoa.hpp"

namespace spoa {
// force the SISD engine — the one the reference driver exercises
std::unique_ptr<AlignmentEngine> createSimdAlignmentEngine(
    AlignmentType, AlignmentSubtype, std::int8_t, std::int8_t, std::int8_t,
    std::int8_t, std::int8_t, std::int8_t) {
    return nullptr;
}
}  // namespace spoa

static double now_s() {
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
}

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s <batches.fasta> [reps]\n", argv[0]);
        return 2;
    }
    const int reps = argc > 2 ? atoi(argv[2]) : 3;
    std::int8_t m = 2, x = -4, o1 = -4, e1 = -2, o2 = -24, e2 = -1;
    std::int8_t oe1 = o1 + e1, oe2 = o2 + e2;

    std::ifstream in(argv[1]);
    std::vector<std::vector<std::string>> batches;
    std::string line;
    bool expect_header = true;
    while (std::getline(in, line)) {
        if (line.empty()) continue;
        if (expect_header) {
            if (line.size() > 1 && line[1] == '0') batches.emplace_back();
            expect_header = false;
        } else {
            batches.back().push_back(line);
            expect_header = true;
        }
    }
    long long total_seqs = 0;
    for (auto& b : batches) total_seqs += (long long)b.size();

    double best = 1e30;
    long long cons_bytes = 0;
    for (int rep = 0; rep < reps; rep++) {
        auto engine = spoa::createAlignmentEngine(
            spoa::AlignmentType::kNW, m,
            encrypt_plaintext_integer_to_ciphertext(m), x,
            encrypt_plaintext_integer_to_ciphertext(x), oe1,
            encrypt_plaintext_integer_to_ciphertext(oe1), e1,
            encrypt_plaintext_integer_to_ciphertext(e1), oe2,
            encrypt_plaintext_integer_to_ciphertext(oe2), e2,
            encrypt_plaintext_integer_to_ciphertext(e2));
        cons_bytes = 0;
        double t0 = now_s();
        for (size_t i = 0; i < batches.size(); i++) {
            auto graph = spoa::createGraph();
            for (const auto& seq : batches[i]) {
                auto alignment = engine->align(seq, graph);
                vecCT enc_seq;
                for (char ch : seq)
                    enc_seq.push_back(
                        encrypt_plaintext_integer_to_ciphertext(ch));
                graph->add_alignment(alignment, seq, enc_seq);
            }
            vecCT cons = graph->generate_consensus();
            for (CT c : cons) {
                long long v = decrypt_ciphertext_to_plaintext_vector(c)[0];
                if (v == 0) break;
                cons_bytes += v;
            }
        }
        double dt = now_s() - t0;
        if (dt < best) best = dt;
    }
    printf("windows=%zu seqs=%lld best_s=%.4f seqs_per_s=%.1f "
           "consensus_bytes=%lld\n",
           batches.size(), total_seqs, best, (double)total_seqs / best,
           cons_bytes);
    return 0;
}
