// Golden-fixture generator for the Platypus local de Bruijn assembler:
// drives the reference's own graph build (benchmarks/dbg/debruijn.cpp
// createDeBruijnGraph / loadReferenceIntoGraph / loadBAMDataIntoGraph)
// on synthetic windows and dumps the resulting colored graph.
//
// The graph structs are internal to debruijn.cpp, so the reference TU is
// textually included (its main renamed away); nothing is copied.
//
// Usage: dbg_golden <case.txt>
//   case.txt: "refStart minQual kmerSize" / refSeq / nReads /
//             per read: seq line, then space-separated quals line
// Output (unordered; the generator sorts):
//   N <kmer> <colours> <position> <weight>
//   E <from_kmer> <to_kmer> <weight>
//   CYCLES <0|1>
#define main dbg_reference_main
#include "debruijn.cpp"
#undef main

#include <fstream>
#include <sstream>
#include <string>
#include <vector>

int main(int argc, char** argv) {
    if (argc != 2) {
        fprintf(stderr, "usage: %s <case.txt>\n", argv[0]);
        return 2;
    }
    std::ifstream in(argv[1]);
    int refStart, minQual, kmerSize;
    in >> refStart >> minQual >> kmerSize;
    std::string refSeq;
    in >> refSeq;
    int nReads;
    in >> nReads;
    in.ignore();
    std::vector<alignedRead> reads(nReads);
    for (int i = 0; i < nReads; i++) {
        std::string seq, quals;
        std::getline(in, seq);
        std::getline(in, quals);
        alignedRead& r = reads[i];
        memset(&r, 0, sizeof(r));
        snprintf(r.qname, MAX_READNAME_LEN, "r%d", i);
        r.flag = 0;
        r.pos = refStart;
        r.mapq = 50;
        strncpy(r.seq, seq.c_str(), MAX_READ_LEN - 1);
        r.rlen = (uint32_t)seq.size();
        std::istringstream qs(quals);
        int q, j = 0;
        while (qs >> q && j < (int)r.rlen) r.qual[j++] = (uint8_t)q;
    }

    const int nBuckets = 5000;
    DeBruijnGraph* graph = createDeBruijnGraph(kmerSize, nBuckets);
    loadReferenceIntoGraph(graph, (char*)refSeq.c_str(), refStart, kmerSize);
    loadBAMDataIntoGraph(graph, reads.data(), reads.data() + nReads,
                         /*assembleBadReads=*/1, /*assembleBrokenPairs=*/0,
                         minQual, kmerSize);

    NodeDict* dict = graph->nodes;
    for (int b = 0; b < dict->nBuckets; b++) {
        for (int s = 0; dict->buckets[b] && s < dict->bucketSize[b]; s++) {
            Node* node = dict->buckets[b][s];
            if (!node) continue;  // bucketSize is CAPACITY; NULL = empty
            printf("N %.*s %d %d %g\n", node->kmerSize, node->sequence,
                   node->colours, node->position, node->weight);
            for (int e = 0; e < node->nEdges; e++) {
                Edge* edge = node->edges[e];
                printf("E %.*s %.*s %g\n", node->kmerSize, node->sequence,
                       edge->endNode->kmerSize, edge->endNode->sequence,
                       edge->weight);
            }
        }
    }
    int minWeight = 2 * minQual;  // minReads * minQual (debruijn.cpp:1401)

    // Variant-path extraction via the reference's OWN bounded DFS
    // (getVariantPathsThroughGraphFromNode, debruijn.cpp:1147-1230; the
    // benchmark driver ships it unused).  Called on a bare REF_AND_READ
    // node it degenerates (no length guard at :1186), so the pinned
    // convention is one invocation per qualifying seed edge
    // [start, succ] using the function's own extension filter (:1217).
    // Output per seed (order-independent across seeds; within a seed the
    // reference's finish order):
    //   B <start_kmer> <succ_kmer> EXPLODED        (NULL return)
    //   B <start_kmer> <succ_kmer> <nPaths>
    //   b <kmer> <kmer> ...                        (one line per path)
    for (int b2 = 0; b2 < dict->nBuckets; b2++) {
        for (int s2 = 0; dict->buckets[b2] && s2 < dict->bucketSize[b2]; s2++) {
            Node* node = dict->buckets[b2][s2];
            if (!node || node->colours != REF_AND_READ) continue;
            for (int e = 0; e < node->nEdges; e++) {
                Edge* edge = node->edges[e];
                Node* succ = edge->endNode;
                if (!(edge->weight >= minWeight || succ->colours == REF_AND_READ
                      || succ->colours == REF))
                    continue;
                Path* seed = createPath(kmerSize);
                addNodeToPath(seed, node, 0.0);
                addNodeToPath(seed, succ, edge->weight);
                PathStack* fin = getVariantPathsThroughGraphFromNode(
                    graph, seed, minWeight);
                if (fin == NULL) {
                    printf("B %.*s %.*s EXPLODED\n", node->kmerSize,
                           node->sequence, succ->kmerSize, succ->sequence);
                    continue;
                }
                printf("B %.*s %.*s %d\n", node->kmerSize, node->sequence,
                       succ->kmerSize, succ->sequence, fin->top + 1);
                for (int p = 0; p <= fin->top; p++) {
                    Path* path = fin->elements[p];
                    printf("b");
                    for (int q = 0; q < path->nNodes; q++)
                        printf(" %.*s", path->nodes->elements[q]->kmerSize,
                               path->nodes->elements[q]->sequence);
                    printf("\n");
                }
                destroyPathStack(fin);
            }
        }
    }

    printf("CYCLES %d\n",
           detectCyclesInGraph_Recursive(graph, minWeight) ? 1 : 0);
    return 0;
}
