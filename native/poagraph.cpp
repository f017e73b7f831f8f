// ctypes entry points for the POA graph (struct lives in poagraph.h,
// shared with poaalign.cpp's native convex align engine).

#include "poagraph.h"

using gtpoa::PEdge;
using gtpoa::PNode;
using gtpoa::PoaG;

extern "C" void* gt_poa_new() { return new PoaG(); }
extern "C" void gt_poa_free(void* g) { delete static_cast<PoaG*>(g); }

extern "C" void gt_poa_add_alignment(void* gp, const int32_t* aln_nid,
                                     const int32_t* aln_pos, int64_t aln_len,
                                     const char* seq, int64_t seq_len) {
    static_cast<PoaG*>(gp)->add_alignment(aln_nid, aln_pos, aln_len, seq,
                                          seq_len);
}

extern "C" int64_t gt_poa_n_nodes(void* gp) {
    return (int64_t)static_cast<PoaG*>(gp)->nodes.size();
}

extern "C" int64_t gt_poa_consensus(void* gp, char* out, int64_t cap) {
    auto* g = static_cast<PoaG*>(gp);
    if (g->rank.empty()) return 0;
    g->traverse_heaviest_bundle();
    if ((int64_t)g->consensus.size() > cap) return -1;
    for (size_t i = 0; i < g->consensus.size(); i++)
        out[i] = g->decoder[g->nodes[g->consensus[i]].code];
    return (int64_t)g->consensus.size();
}

// rank-space arrays for the device aligner (graph_to_arrays equivalent).
// Returns 0 ok, 1 node overflow (n > n_cap), 2 pred overflow (> p_cap).
extern "C" int32_t gt_poa_arrays(void* gp, int64_t n_cap, int64_t p_cap,
                                 uint8_t* code_char, int32_t* preds,
                                 int32_t* npreds, uint8_t* out_empty,
                                 int32_t* rank_out, int64_t* n_out) {
    auto* g = static_cast<PoaG*>(gp);
    const int64_t n = (int64_t)g->nodes.size();
    *n_out = n;
    if (n > n_cap) return 1;
    std::vector<int32_t> node_rank(n);
    for (int64_t r = 0; r < n; r++) node_rank[g->rank[r]] = (int32_t)r;
    for (int64_t r = 0; r < n; r++) {
        const int32_t nid = g->rank[r];
        const PNode& nd = g->nodes[nid];
        code_char[r] = (uint8_t)g->decoder[nd.code];
        if ((int64_t)nd.in_e.size() > p_cap) return 2;
        for (size_t p = 0; p < nd.in_e.size(); p++)
            preds[r * p_cap + (int64_t)p] =
                node_rank[g->edges[nd.in_e[p]].begin] + 1;
        npreds[r] = (int32_t)nd.in_e.size();
        out_empty[r] = nd.out_e.empty() ? 1 : 0;
        rank_out[r] = nid;
    }
    return 0;
}

extern "C" int64_t gt_poa_n_edges(void* gp) {
    return (int64_t)static_cast<PoaG*>(gp)->edges.size();
}

// full-structure export (node chars by id, edges, rank) so the rare
// p_cap-overflow fallback can rebuild the Python spec graph
extern "C" void gt_poa_export(void* gp, uint8_t* node_char, int32_t* ebegin,
                              int32_t* eend, int64_t* eweight,
                              int32_t* rank_out) {
    auto* g = static_cast<PoaG*>(gp);
    for (size_t i = 0; i < g->nodes.size(); i++)
        node_char[i] = (uint8_t)g->decoder[g->nodes[i].code];
    for (size_t e = 0; e < g->edges.size(); e++) {
        ebegin[e] = g->edges[e].begin;
        eend[e] = g->edges[e].end;
        eweight[e] = g->edges[e].total_weight;
    }
    for (size_t r = 0; r < g->rank.size(); r++) rank_out[r] = g->rank[r];
}
