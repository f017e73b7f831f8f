// Same-VM perf baseline for the reference's Flye k-mer counter: times
// ONLY VertexIndex::countKmers (the reference driver's own "Kernel
// time" bracket, benchmarks/kmer-cnt/kmer_cnt.cpp:252-287 — gettimeofday
// around countKmers), after the same SequenceContainer load +
// buildPositionIndex the driver does outside the timer.  No freq dump
// (the golden harness's per-kmer map dump is fixture plumbing, not the
// reference code path).
//
// Usage: kmer_bench <reads.fasta> <k> <minReadLength> [reps]
// Prints: "reads=<n> bases=<b> best_s=<s> mbases_per_s=<r> total=<t> hash=<h>"
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

#define private public  // reach VertexIndex::_kmerCounter for the metrics
#include "vertex_index.h"
#include "sequence_container.h"
#undef private
#include "config.h"

static double now_s() {
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
}

int main(int argc, char** argv) {
    if (argc < 4) {
        fprintf(stderr, "usage: %s <reads.fasta> <k> <minReadLength> "
                        "[reps]\n", argv[0]);
        return 2;
    }
    Parameters::get().kmerSize = atoi(argv[2]);
    Parameters::get().numThreads = 1;
    Parameters::get().minimumOverlap = 0;
    Parameters::get().unevenCoverage = false;
    int minReadLength = atoi(argv[3]);
    const int reps = argc > 4 ? atoi(argv[4]) : 2;

    SequenceContainer reads;
    long long bases = 0, n_reads = 0;
    {
        std::ifstream in(argv[1]);
        std::string line, header, seqstr;
        auto flush = [&]() {
            if (!header.empty() && seqstr.length() > (size_t)minReadLength) {
                reads.addSequence(DnaSequence(seqstr), header);
                bases += (long long)seqstr.length();
                n_reads++;
            }
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

    double best = 1e30;
    size_t total = 0, hash = 0;
    for (int rep = 0; rep < reps; rep++) {
        VertexIndex vertexIndex(reads, /*sampleRate=*/1);
        double t0 = now_s();
        vertexIndex.countKmers();
        double dt = now_s() - t0;
        if (dt < best) best = dt;
        total = (size_t)vertexIndex._kmerCounter._numKmers;
        hash = vertexIndex._kmerCounter._hashCounter.size();
    }
    printf("reads=%lld bases=%lld best_s=%.3f mbases_per_s=%.3f "
           "total=%zu hash=%zu\n",
           n_reads, bases, best, (double)bases / best / 1e6, total, hash);
    return 0;
}
