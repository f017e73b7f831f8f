// Golden-fixture generator for spoa partial-order alignment: drives the
// reference's own spoa library (tools/spoa built with the plaintext HE
// stub) through the poa driver's exact per-batch flow
// (msa_spoa_omp.cpp:352-460): createGraph -> align (kNW convex, m=2 x=-4
// o1=-4 e1=-2 o2=-24 e2=-1) -> add_alignment -> generate_consensus.
//
// Usage: poa_golden <batches.fasta> [nw|sw|ov]
//   driver format: alternating ">name"/sequence lines; a header whose
//   second character is '0' starts a new batch (msa_spoa_omp.cpp:115).
//   The optional engine type selects AlignmentType kNW/kSW/kOV
//   (alignment_engine.hpp:19-24); the driver itself hardcodes kNW, the
//   other two pin the library's remaining capability surface.
// Output: "C <batch_id> <consensus>" per batch.
#include <cstdio>
#include <fstream>
#include <iostream>
#include <memory>
#include <string>
#include <vector>

#include "spoa/spoa.hpp"
#include "sisd_alignment_engine.hpp"
#include "simd_alignment_engine.hpp"

namespace spoa {
// force the SISD engine — the one the reference driver exercises
std::unique_ptr<AlignmentEngine> createSimdAlignmentEngine(
    AlignmentType, AlignmentSubtype, std::int8_t, std::int8_t, std::int8_t,
    std::int8_t, std::int8_t, std::int8_t) {
    return nullptr;
}
}  // namespace spoa

int main(int argc, char** argv) {
    if (argc != 2 && argc != 3) {
        fprintf(stderr, "usage: %s <batches.fasta> [nw|sw|ov]\n", argv[0]);
        return 2;
    }
    spoa::AlignmentType type = spoa::AlignmentType::kNW;
    if (argc == 3) {
        std::string t = argv[2];
        if (t == "sw") type = spoa::AlignmentType::kSW;
        else if (t == "ov") type = spoa::AlignmentType::kOV;
        else if (t != "nw") { fprintf(stderr, "bad type %s\n", argv[2]); return 2; }
    }
    std::int8_t m = 2, x = -4, o1 = -4, e1 = -2, o2 = -24, e2 = -1;
    std::int8_t oe1 = o1 + e1, oe2 = o2 + e2;
    auto engine = spoa::createAlignmentEngine(
        type, m,
        encrypt_plaintext_integer_to_ciphertext(m), x,
        encrypt_plaintext_integer_to_ciphertext(x), oe1,
        encrypt_plaintext_integer_to_ciphertext(oe1), e1,
        encrypt_plaintext_integer_to_ciphertext(e1), oe2,
        encrypt_plaintext_integer_to_ciphertext(oe2), e2,
        encrypt_plaintext_integer_to_ciphertext(e2));

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

    for (size_t i = 0; i < batches.size(); i++) {
        auto graph = spoa::createGraph();
        for (size_t j = 0; j < batches[i].size(); j++) {
            const auto& seq = batches[i][j];
            auto alignment = engine->align(seq, graph);
            printf("AL %zu %zu %zu", i, j, alignment.size());
            for (const auto& pr : alignment)
                printf(" %d,%d", pr.first, pr.second);
            printf("\n");
            vecCT enc_seq;
            for (char ch : seq)
                enc_seq.push_back(encrypt_plaintext_integer_to_ciphertext(ch));
            graph->add_alignment(alignment, seq, enc_seq);
        }
        vecCT cons = graph->generate_consensus();
        std::string out;
        for (CT c : cons) {
            long long v = decrypt_ciphertext_to_plaintext_vector(c)[0];
            if (v == 0) break;
            out += (char)v;
        }
        printf("C %zu %s\n", i, out.c_str());
    }
    return 0;
}
