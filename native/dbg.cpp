// Colored de Bruijn window assembly (Platypus-style, benchmarks/dbg).
// Semantic contract is ops/dbg.py (itself cited to debruijn.cpp): same
// node/edge colour+weight merging, the reference's len-k-1 loop bound,
// the k+1-window min-quality read filter, and the bounded bubble DFS
// with identical iteration order (nodes in insertion order, edges in
// creation order, stack-pop path order).  Returns node count + bubble
// path sequences; the Python graph stays the full-featured spec/API.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int32_t REF = 1, READ = 2, REF_AND_READ = 3;

struct Edge { int32_t succ; double weight; };

struct Node {
    int32_t colours;
    int64_t position;
    double weight;
    std::vector<Edge> edges;
};

struct Graph {
    int64_t k;
    std::unordered_map<std::string, int32_t> id_of;
    std::vector<Node> nodes;          // insertion order == Python dict order
    std::vector<std::string> kmers;

    int32_t insert_or_update(const std::string& kmer, int32_t colours,
                             int64_t position, double weight) {
        auto it = id_of.find(kmer);
        if (it == id_of.end()) {
            int32_t id = (int32_t)nodes.size();
            id_of.emplace(kmer, id);
            nodes.push_back({colours, position, weight, {}});
            kmers.push_back(kmer);
            return id;
        }
        nodes[it->second].colours |= colours;
        nodes[it->second].weight += weight;
        return it->second;
    }

    void add_edge(const std::string& k1, const std::string& k2,
                  int32_t colours, int64_t pos1, int64_t pos2,
                  double node_weight, double edge_weight) {
        int32_t a = insert_or_update(k1, colours, pos1, node_weight);
        int32_t b = insert_or_update(k2, colours, pos2, node_weight);
        for (auto& e : nodes[a].edges) {
            if (e.succ == b) { e.weight += edge_weight; return; }
        }
        nodes[a].edges.push_back({b, edge_weight});
    }
};

struct Handle {
    int64_t n_nodes = 0;
    std::vector<std::string> bubbles;  // path sequences
    int64_t seq_bytes = 0;
};

}  // namespace

extern "C" void* gt_dbg_window(
    const char* ref, int64_t ref_len, int64_t ref_start,
    const char* reads, const int64_t* read_off,  // [n_reads+1]
    const uint8_t* quals,                        // same offsets as reads
    const int32_t* flags, int64_t n_reads,
    int64_t k, int64_t min_qual, int64_t min_reads) {
    Graph g{k, {}, {}, {}};
    std::string k1, k2;
    // load_reference: the reference's exact len-k-1 bound
    for (int64_t i = 0; i < ref_len - k - 1; i++) {
        k1.assign(ref + i, k);
        k2.assign(ref + i + 1, k);
        g.add_edge(k1, k2, REF, ref_start + i, ref_start + i + 1, 1.0, 1.0);
    }
    // load_read: k+1-window min quality >= min_qual, no Ns in the window
    for (int64_t r = 0; r < n_reads; r++) {
        if (flags[r] & 0x200) continue;  // BAM_FQCFAIL
        const char* s = reads + read_off[r];
        const uint8_t* q = quals + read_off[r];
        const int64_t len = read_off[r + 1] - read_off[r];
        for (int64_t i = 0; i < len - k - 1; i++) {
            int64_t this_min = 255;
            bool ok = true;
            for (int64_t j = i; j <= i + k; j++) {
                if (q[j] < this_min) this_min = q[j];
                if (s[j] == 'N') { ok = false; break; }
            }
            if (ok && this_min >= min_qual) {
                k1.assign(s + i, k);
                k2.assign(s + i + 1, k);
                g.add_edge(k1, k2, READ, -1, -1, (double)this_min,
                           (double)this_min);
            }
        }
    }

    auto* h = new Handle();
    h->n_nodes = (int64_t)g.nodes.size();

    // bubble DFS: per REF_AND_READ node in insertion order, the
    // reference's getVariantPathsThroughGraphFromNode run on each
    // qualifying 2-node seed [start, succ] (ops/dbg.py
    // variant_paths_from_seed; pinned by tools/golden/dbg_harness.cpp
    // which executes the reference's own function per seed)
    const double min_weight = (double)(min_reads * min_qual);
    std::vector<std::vector<int32_t>> stack, finished;
    for (int32_t start = 0; start < (int32_t)g.nodes.size(); start++) {
        if (g.nodes[start].colours != REF_AND_READ) continue;
        for (const auto& se : g.nodes[start].edges) {
            const Node& snxt = g.nodes[se.succ];
            if (!(se.weight >= min_weight || snxt.colours == REF_AND_READ
                  || snxt.colours == REF))
                continue;
            stack.clear();
            finished.clear();
            stack.push_back({start, se.succ});
            bool exploded = false;
            while (!stack.empty()) {
                std::vector<int32_t> path = std::move(stack.back());
                stack.pop_back();
                if ((int64_t)stack.size() > 20
                    || (int64_t)finished.size() > 20) {
                    exploded = true;  // reference returns NULL
                    break;
                }
                bool dup = false;  // cycle within the path
                for (size_t a = 0; a < path.size() && !dup; a++)
                    for (size_t b = a + 1; b < path.size(); b++)
                        if (path[a] == path[b]) { dup = true; break; }
                if (dup) continue;
                const Node& end = g.nodes[path.back()];
                if (end.colours == REF_AND_READ) {
                    finished.push_back(path);
                } else if (end.colours == REF) {
                    continue;
                } else {
                    for (const auto& e : end.edges) {
                        const Node& nxt = g.nodes[e.succ];
                        if (e.weight >= min_weight
                            || nxt.colours == REF_AND_READ
                            || nxt.colours == REF) {
                            std::vector<int32_t> p2 = path;
                            p2.push_back(e.succ);
                            stack.push_back(std::move(p2));
                        }
                    }
                }
            }
            if (exploded || finished.empty()) continue;
            for (const auto& path : finished) {
                std::string seq;
                seq.reserve(path.size() + k);
                for (size_t i = 0; i + 1 < path.size(); i++)
                    seq.push_back(g.kmers[path[i]][0]);
                seq += g.kmers[path.back()];
                h->seq_bytes += (int64_t)seq.size() + 1;
                h->bubbles.push_back(std::move(seq));
            }
        }
    }
    return h;
}

extern "C" int64_t gt_dbg_n_nodes(void* hp) {
    return static_cast<Handle*>(hp)->n_nodes;
}

extern "C" int64_t gt_dbg_n_bubbles(void* hp) {
    return (int64_t)static_cast<Handle*>(hp)->bubbles.size();
}

extern "C" int64_t gt_dbg_seq_bytes(void* hp) {
    return static_cast<Handle*>(hp)->seq_bytes;
}

extern "C" void gt_dbg_copy(void* hp, char* seqs) {
    auto* h = static_cast<Handle*>(hp);
    for (const auto& s : h->bubbles) {
        std::memcpy(seqs, s.data(), s.size());
        seqs += s.size();
        *seqs++ = '\n';
    }
}

extern "C" void gt_dbg_free(void* hp) { delete static_cast<Handle*>(hp); }
