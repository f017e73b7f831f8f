// Golden-fixture generator for the Flye k-mer counter: drives the
// reference's own SequenceContainer + VertexIndex/KmerCounter
// (benchmarks/kmer-cnt/vertex_index.cpp:515-659, built with the plaintext
// HE stub) and dumps the full counter state.
//
// Usage: kmer_golden <reads.fasta> <k> <minReadLength>
// Output:
//   TOTAL <numKmers> HASH <hashSize>
//   K <packed_standard_form> <freq>     (one per distinct k-mer in reads)
// pull the std library in BEFORE the access hack so its internals are
// unaffected (include guards make the later re-includes no-ops)
#include <algorithm>
#include <atomic>
#include <cassert>
#include <chrono>
#include <cinttypes>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <fstream>
#include <functional>
#include <iomanip>
#include <iostream>
#include <list>
#include <map>
#include <memory>
#include <mutex>
#include <queue>
#include <random>
#include <set>
#include <sstream>
#include <stack>
#include <stdexcept>
#include <string>
#include <thread>
#include <unordered_map>
#include <unordered_set>
#include <vector>
#include <zlib.h>

#define private public  // reach VertexIndex::_kmerCounter for the dump
#include "vertex_index.h"
#include "sequence_container.h"
#undef private
#include "config.h"

int main(int argc, char** argv) {
    if (argc != 4) {
        fprintf(stderr, "usage: %s <reads.fasta> <k> <minReadLength>\n",
                argv[0]);
        return 2;
    }
    Parameters::get().kmerSize = atoi(argv[2]);
    Parameters::get().numThreads = 1;
    Parameters::get().minimumOverlap = 0;
    Parameters::get().unevenCoverage = false;
    int minReadLength = atoi(argv[3]);

    // parse the FASTA here and insert via the public addSequence API
    // (which adds forward + complement twins, sequence_container.cpp:150)
    // instead of loadFromFile: the fork's readFasta goes through packed
    // 16384-slot ciphertext vectors the scalar stub can't represent.
    // The length filter matches loadFromFile (strictly > minReadLength,
    // sequence_container.cpp:115).
    SequenceContainer reads;
    {
        std::ifstream in(argv[1]);
        std::string line, header, seqstr;
        auto flush = [&]() {
            if (!header.empty() &&
                seqstr.length() > (size_t)minReadLength)
                reads.addSequence(DnaSequence(seqstr), header);
        };
        while (std::getline(in, line)) {
            if (!line.empty() && line.back() == '\r') line.pop_back();
            if (line.empty()) continue;
            if (line[0] == '>') {
                flush();
                header = line.substr(1);
                seqstr.clear();
            } else {
                seqstr += line;
            }
        }
        flush();
    }
    reads.buildPositionIndex();

    VertexIndex vertexIndex(reads, /*sampleRate=*/1);
    vertexIndex.countKmers();
    KmerCounter& counter = vertexIndex._kmerCounter;

    printf("TOTAL %zu HASH %zu\n", (size_t)counter._numKmers,
           counter._hashCounter.size());

    // enumerate distinct standard-form k-mers appearing in the container
    // (fwd + revcomp twins) and dump their frequencies
    std::map<size_t, size_t> freqs;
    for (const auto& seq : reads.iterSeqs()) {
        for (auto kmerPos : IterKmers(seq.sequence)) {
            Kmer kmer = kmerPos.kmer;
            kmer.standardForm();
            size_t repr = kmer.numRepr();
            if (!freqs.count(repr)) freqs[repr] = counter.getFreq(kmer);
        }
    }
    for (const auto& kv : freqs)
        printf("K %zu %zu\n", kv.first, kv.second);
    return 0;
}
