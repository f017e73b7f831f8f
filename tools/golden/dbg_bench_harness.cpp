// Same-VM perf baseline for the Platypus local de Bruijn assembler
// (benchmarks/dbg/debruijn.cpp): per window, the reference's own graph
// build (createDeBruijnGraph + loadReferenceIntoGraph +
// loadBAMDataIntoGraph, the assembleReadsAndDetectVariants body,
// :1389-1433) plus the per-seed variant-path DFS the golden fixtures
// pin (getVariantPathsThroughGraphFromNode, :1147-1230) — the same
// work our dbg_window_native does.  Timed over many windows,
// best-of-reps.
//
// Usage: dbg_bench <cases.txt> [reps]
//   cases.txt: nWindows, then per window the dbg_harness case format
//   ("refStart minQual kmerSize" / refSeq / nReads / seq+quals lines)
// Prints: "windows=<n> ref_bases=<b> best_s=<s> mbref_per_s=<r> paths=<p>"
#define main dbg_reference_main
#include "debruijn.cpp"
#undef main

#include <chrono>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

static double now_s() {
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
}

struct WinCase {
    int refStart, minQual, kmerSize;
    std::string refSeq;
    std::vector<alignedRead> reads;
};

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s <cases.txt> [reps]\n", argv[0]);
        return 2;
    }
    const int reps = argc > 2 ? atoi(argv[2]) : 3;
    std::ifstream in(argv[1]);
    int nWindows;
    in >> nWindows;
    std::vector<WinCase> wins(nWindows);
    long long ref_bases = 0;
    for (auto& w : wins) {
        in >> w.refStart >> w.minQual >> w.kmerSize >> w.refSeq;
        int nReads;
        in >> nReads;
        in.ignore();
        w.reads.resize(nReads);
        for (int i = 0; i < nReads; i++) {
            std::string seq, quals;
            std::getline(in, seq);
            std::getline(in, quals);
            alignedRead& r = w.reads[i];
            memset(&r, 0, sizeof(r));
            snprintf(r.qname, MAX_READNAME_LEN, "r%d", i);
            r.flag = 0;
            r.pos = w.refStart;
            r.mapq = 50;
            strncpy(r.seq, seq.c_str(), MAX_READ_LEN - 1);
            r.rlen = (uint32_t)seq.size();
            std::istringstream qs(quals);
            int q, j = 0;
            while (qs >> q && j < (int)r.rlen) r.qual[j++] = (uint8_t)q;
        }
        ref_bases += (long long)w.refSeq.size();
    }

    double best = 1e30;
    long long paths_total = 0;
    for (int rep = 0; rep < reps; rep++) {
        paths_total = 0;
        double t0 = now_s();
        for (auto& w : wins) {
            const int nBuckets = 5000;
            const int minWeight = 2 * w.minQual;
            DeBruijnGraph* graph = createDeBruijnGraph(w.kmerSize, nBuckets);
            loadReferenceIntoGraph(graph, (char*)w.refSeq.c_str(),
                                   w.refStart, w.kmerSize);
            loadBAMDataIntoGraph(graph, w.reads.data(),
                                 w.reads.data() + w.reads.size(), 1, 0,
                                 w.minQual, w.kmerSize);
            NodeDict* dict = graph->nodes;
            for (int b = 0; b < dict->nBuckets; b++) {
                for (int s = 0;
                     dict->buckets[b] && s < dict->bucketSize[b]; s++) {
                    Node* node = dict->buckets[b][s];
                    if (!node || node->colours != REF_AND_READ) continue;
                    for (int e = 0; e < node->nEdges; e++) {
                        Edge* edge = node->edges[e];
                        Node* succ = edge->endNode;
                        if (!(edge->weight >= minWeight
                              || succ->colours == REF_AND_READ
                              || succ->colours == REF))
                            continue;
                        Path* seed = createPath(w.kmerSize);
                        addNodeToPath(seed, node, 0.0);
                        addNodeToPath(seed, succ, edge->weight);
                        PathStack* fin = getVariantPathsThroughGraphFromNode(
                            graph, seed, minWeight);
                        if (fin == NULL) continue;
                        paths_total += (long long)(fin->top + 1);
                        destroyPathStack(fin);
                    }
                }
            }
            destroyDeBruijnGraph(graph);
        }
        double dt = now_s() - t0;
        if (dt < best) best = dt;
    }
    printf("windows=%d ref_bases=%lld best_s=%.3f mbref_per_s=%.3f "
           "paths=%lld\n",
           nWindows, ref_bases, best, (double)ref_bases / best / 1e6,
           paths_total);
    return 0;
}
