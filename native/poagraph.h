// POA graph (spoa Graph) — shared between poagraph.cpp (ctypes graph
// entry points) and poaalign.cpp (native convex align engine).
// Semantic contract is ops/oracle/poa.py::PoaGraph (itself cited to
// tools/spoa/src/graph.cpp): identical node/edge creation order,
// aligned-node group handling, DFS topological order, and consensus
// tie-breaks — including the Python negative-index quirk
// (scores[preds[nid]] with preds[nid] == -1 reads scores[n-1]).
// The Python graph stays the spec; tests assert native == Python on
// full multi-round consensus runs.
#pragma once

#include <cstdint>
#include <cstring>
#include <vector>

namespace gtpoa {

struct PNode {
    int32_t code;
    std::vector<int32_t> in_e, out_e, aligned;
};

struct PEdge { int32_t begin, end; int64_t total_weight; };

struct PoaG {
    std::vector<PNode> nodes;
    std::vector<PEdge> edges;
    int32_t coder[256];
    std::vector<char> decoder;
    int64_t num_sequences = 0;
    std::vector<int32_t> rank;       // rank_to_node_id
    std::vector<int32_t> consensus;

    PoaG() { std::memset(coder, -1, sizeof(coder)); }

    int32_t add_node(int32_t code) {
        nodes.push_back({code, {}, {}, {}});
        return (int32_t)nodes.size() - 1;
    }

    void add_edge(int32_t begin, int32_t end, int64_t weight) {
        for (int32_t ei : nodes[begin].out_e) {
            if (edges[ei].end == end) { edges[ei].total_weight += weight; return; }
        }
        int32_t ei = (int32_t)edges.size();
        edges.push_back({begin, end, weight});
        nodes[begin].out_e.push_back(ei);
        nodes[end].in_e.push_back(ei);
    }

    int32_t add_chain(const int32_t* codes, const int64_t* weights,
                      int64_t begin, int64_t end) {
        if (begin == end) return -1;
        int32_t first = add_node(codes[begin]);
        for (int64_t i = begin + 1; i < end; i++) {
            int32_t nid = add_node(codes[i]);
            add_edge(nid - 1, nid, weights[i - 1] + weights[i]);
        }
        return first;
    }

    void topological_sort() {
        rank.clear();
        const int64_t n = (int64_t)nodes.size();
        std::vector<uint8_t> marks(n, 0), check_aligned(n, 1);
        std::vector<int32_t> stack;
        for (int64_t i = 0; i < n; i++) {
            if (marks[i] != 0) continue;
            stack.assign(1, (int32_t)i);
            while (!stack.empty()) {
                const int32_t nid = stack.back();
                bool valid = true;
                if (marks[nid] != 2) {
                    for (int32_t ei : nodes[nid].in_e) {
                        const int32_t b = edges[ei].begin;
                        if (marks[b] != 2) { stack.push_back(b); valid = false; }
                    }
                    if (check_aligned[nid]) {
                        for (int32_t aid : nodes[nid].aligned) {
                            if (marks[aid] != 2) {
                                stack.push_back(aid);
                                check_aligned[aid] = 0;
                                valid = false;
                            }
                        }
                    }
                    if (valid) {
                        marks[nid] = 2;
                        if (check_aligned[nid]) {
                            rank.push_back(nid);
                            for (int32_t aid : nodes[nid].aligned)
                                rank.push_back(aid);
                        }
                    } else {
                        marks[nid] = 1;
                    }
                }
                if (valid) {
                    // pop THIS nid (it may no longer be back() after pushes)
                    // — Python pops the top only when valid, and valid
                    // implies nothing was pushed this iteration
                    stack.pop_back();
                }
            }
        }
    }

    void add_alignment(const int32_t* aln_nid, const int32_t* aln_pos,
                       int64_t aln_len, const char* seq, int64_t seq_len) {
        if (seq_len == 0) return;
        std::vector<int64_t> weights(seq_len, 1);
        std::vector<int32_t> codes(seq_len);
        for (int64_t i = 0; i < seq_len; i++) {
            const unsigned char ch = (unsigned char)seq[i];
            if (coder[ch] == -1) {
                coder[ch] = (int32_t)decoder.size();
                decoder.push_back((char)ch);
            }
            codes[i] = coder[ch];
        }
        if (aln_len == 0) {
            add_chain(codes.data(), weights.data(), 0, seq_len);
            num_sequences++;
            topological_sort();
            return;
        }
        std::vector<int64_t> valid_pos;
        for (int64_t t = 0; t < aln_len; t++)
            if (aln_pos[t] != -1) valid_pos.push_back(aln_pos[t]);
        if (valid_pos.empty()) {  // all-gap alignment: chain like empty
            add_chain(codes.data(), weights.data(), 0, seq_len);
            num_sequences++;
            topological_sort();
            return;
        }
        const int64_t tmp = (int64_t)nodes.size();
        int32_t begin_node_id =
            add_chain(codes.data(), weights.data(), 0, valid_pos.front());
        int32_t head = (tmp == (int64_t)nodes.size())
                           ? -1 : (int32_t)nodes.size() - 1;
        const int32_t tail = add_chain(codes.data(), weights.data(),
                                       valid_pos.back() + 1, seq_len);
        int64_t prev_weight = head == -1 ? 0 : weights[valid_pos.front() - 1];

        for (int64_t t = 0; t < aln_len; t++) {
            const int32_t nid = aln_nid[t];
            const int64_t j = aln_pos[t];
            if (j == -1) continue;
            const unsigned char letter = (unsigned char)seq[j];
            int32_t new_id;
            if (nid == -1) {
                new_id = add_node(coder[letter]);
            } else if (decoder[nodes[nid].code] == (char)letter) {
                new_id = nid;
            } else {
                int32_t aligned_to = -1;
                for (int32_t aid : nodes[nid].aligned) {
                    if (decoder[nodes[aid].code] == (char)letter) {
                        aligned_to = aid;
                        break;
                    }
                }
                if (aligned_to == -1) {
                    new_id = add_node(coder[letter]);
                    for (int32_t aid : nodes[nid].aligned) {
                        nodes[new_id].aligned.push_back(aid);
                        nodes[aid].aligned.push_back(new_id);
                    }
                    nodes[new_id].aligned.push_back(nid);
                    nodes[nid].aligned.push_back(new_id);
                } else {
                    new_id = aligned_to;
                }
            }
            if (begin_node_id == -1) begin_node_id = new_id;
            if (head != -1) add_edge(head, new_id, prev_weight + weights[j]);
            head = new_id;
            prev_weight = weights[j];
        }
        if (tail != -1)
            add_edge(head, tail, prev_weight + weights[valid_pos.back() + 1]);
        num_sequences++;
        topological_sort();
    }

    // scores[idx] with Python negative indexing (idx == -1 -> last)
    static int64_t at(const std::vector<int64_t>& v, int64_t idx) {
        return idx < 0 ? v[v.size() + idx] : v[idx];
    }

    int32_t branch_completion(std::vector<int64_t>& scores,
                              std::vector<int32_t>& preds, int64_t r0) {
        const int32_t nid0 = rank[r0];
        for (int32_t ei : nodes[nid0].out_e) {
            const int32_t end = edges[ei].end;
            for (int32_t oei : nodes[end].in_e)
                if (edges[oei].begin != nid0) scores[edges[oei].begin] = -1;
        }
        int64_t max_score = 0;
        int32_t max_id = 0;
        for (int64_t r = r0 + 1; r < (int64_t)rank.size(); r++) {
            const int32_t nid = rank[r];
            scores[nid] = -1;
            preds[nid] = -1;
            for (int32_t ei : nodes[nid].in_e) {
                const PEdge& e = edges[ei];
                if (scores[e.begin] == -1) continue;
                if (scores[nid] < e.total_weight
                    || (scores[nid] == e.total_weight
                        && at(scores, preds[nid]) <= scores[e.begin])) {
                    scores[nid] = e.total_weight;
                    preds[nid] = e.begin;
                }
            }
            if (preds[nid] != -1) scores[nid] += scores[preds[nid]];
            if (max_score < scores[nid]) {
                max_score = scores[nid];
                max_id = nid;
            }
        }
        return max_id;
    }

    void traverse_heaviest_bundle() {
        const int64_t n = (int64_t)nodes.size();
        std::vector<int32_t> preds(n, -1);
        std::vector<int64_t> scores(n, -1);
        int32_t max_id = 0;
        for (int32_t nid : rank) {
            for (int32_t ei : nodes[nid].in_e) {
                const PEdge& e = edges[ei];
                if (scores[nid] < e.total_weight
                    || (scores[nid] == e.total_weight
                        && at(scores, preds[nid]) <= scores[e.begin])) {
                    scores[nid] = e.total_weight;
                    preds[nid] = e.begin;
                }
            }
            if (preds[nid] != -1) scores[nid] += scores[preds[nid]];
            if (scores[max_id] < scores[nid]) max_id = nid;
        }
        if (!nodes[max_id].out_e.empty()) {
            std::vector<int64_t> id_to_rank(n, 0);
            for (int64_t r = 0; r < (int64_t)rank.size(); r++)
                id_to_rank[rank[r]] = r;
            while (!nodes[max_id].out_e.empty())
                max_id = branch_completion(scores, preds, id_to_rank[max_id]);
        }
        consensus.clear();
        while (preds[max_id] != -1) {
            consensus.push_back(max_id);
            max_id = preds[max_id];
        }
        consensus.push_back(max_id);
        for (size_t a = 0, b = consensus.size() - 1; a < b; a++, b--)
            std::swap(consensus[a], consensus[b]);
    }
};

// convex graph alignment (poaalign.cpp): fills out (node_id, seq_pos)
// pairs, returns pair count, or -1 when cap is too small.
// type: 0=nw 1=sw 2=ov; params in oracle order (m, n, g, e, q, c).
int64_t convex_align(PoaG& g, const char* seq, int64_t seq_len,
                     int32_t m, int32_t n, int32_t go, int32_t ge,
                     int32_t qo, int32_t qe, int32_t type,
                     int32_t* out_nid, int32_t* out_pos, int64_t cap);

}  // namespace gtpoa
