// Flye minimizer selection + counting (kmer.h:208-264 yieldMinimizers /
// vertex_index.cpp:391-431 buildIndexMinimizers).  Semantic contract is
// ops/oracle/kmer.py::yield_minimizers / build_minimizer_index — same
// monotone-deque walk (strict pops on push, window eviction, equal-hash
// front dedup, emit-on-front-change) and canonical counting, exact u64
// integer arithmetic.  The Python deque walk is the fallback/spec.

#include <cstdint>
#include <deque>
#include <unordered_map>
#include <vector>

namespace {

constexpr uint64_t M1 = 0x9E3779B97F4A7C15ULL;
constexpr uint64_t M2 = 0xBF58476D1CE4E5B9ULL;
constexpr uint64_t M3 = 0x94D049BB133111EBULL;

inline uint64_t kmer_hash(uint64_t z) {
    z += M1;
    z = (z ^ (z >> 30)) * M2;
    z = (z ^ (z >> 27)) * M3;
    return z ^ (z >> 31);
}

inline uint64_t revcomp_code(uint64_t code, int64_t k) {
    uint64_t rc = 0;
    for (int64_t i = 0; i < k; i++) {
        rc = (rc << 2) | (3 - (code & 3));
        code >>= 2;
    }
    return rc;
}

struct Ent { int64_t pos; uint64_t fwd, h; };

struct Handle {
    std::unordered_map<uint64_t, int64_t> counter;
};

}  // namespace

extern "C" void* gt_minimizers_count(
    const uint8_t* codes,     // concatenated 2-bit read codes
    const int64_t* offsets,   // [n_reads] start of each read
    const int64_t* lengths,   // [n_reads]
    int64_t n_reads, int64_t k, int64_t window, int64_t min_read_length) {
    auto* h = new Handle();
    std::deque<Ent> q;
    const uint64_t mask = (k >= 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
    for (int64_t r = 0; r < n_reads; r++) {
        const int64_t len = lengths[r];
        if (len < min_read_length) continue;
        const uint8_t* s = codes + offsets[r];
        // the reference's k-mer iterator stops one short of the final
        // window (oracle kmer_codes: n = len - k, NOT len - k + 1)
        const int64_t n_kmers = len - k;
        if (n_kmers <= 0) continue;
        uint64_t fwd = 0, rc = 0;
        for (int64_t i = 0; i < k - 1; i++) {
            fwd = ((fwd << 2) | s[i]) & mask;
            rc = (rc >> 2) | ((uint64_t)(3 - s[i]) << (2 * (k - 1)));
        }
        q.clear();
        int64_t last_emit_pos = -1;
        for (int64_t pos = 0; pos < n_kmers; pos++) {
            fwd = ((fwd << 2) | s[pos + k - 1]) & mask;
            rc = (rc >> 2) | ((uint64_t)(3 - s[pos + k - 1]) << (2 * (k - 1)));
            const uint64_t std_code = fwd < rc ? fwd : rc;
            if (window == 1) {
                const uint64_t rcf = revcomp_code(fwd, k);
                h->counter[fwd < rcf ? fwd : rcf]++;
                continue;
            }
            const uint64_t hh = kmer_hash(std_code);
            while (!q.empty() && q.back().h > hh) q.pop_back();
            q.push_back({pos, fwd, hh});
            if (q.front().pos <= pos - window) {
                while (q.front().pos <= pos - window) q.pop_front();
                while (q.size() >= 2 && q[0].h == q[1].h) q.pop_front();
            }
            if (last_emit_pos != q.front().pos) {
                last_emit_pos = q.front().pos;
                const uint64_t f = q.front().fwd;
                const uint64_t rcf = revcomp_code(f, k);
                h->counter[f < rcf ? f : rcf]++;
            }
        }
    }
    return h;
}

extern "C" int64_t gt_minimizers_size(void* hp) {
    return (int64_t)static_cast<Handle*>(hp)->counter.size();
}

extern "C" void gt_minimizers_copy(void* hp, uint64_t* keys, int64_t* counts) {
    auto* h = static_cast<Handle*>(hp);
    int64_t i = 0;
    for (const auto& kv : h->counter) {
        keys[i] = kv.first;
        counts[i] = kv.second;
        i++;
    }
}

extern "C" void gt_minimizers_free(void* hp) {
    delete static_cast<Handle*>(hp);
}
