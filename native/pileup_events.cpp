// medaka pileup event extraction (benchmarks/pileup/medaka_counts.c
// counting loop).  Semantic contract is ops/pileup.py::_read_events_fast
// / read_events: same per-cigar-op expansion (M/=/X bases, insertions
// anchored after M or D, deletion rows, qstrat clamp), batched over all
// records in one call.  The (vectorized-numpy) Python path remains the
// spec and the weibull path.

#include <cstddef>
#include <cstdint>
#include <vector>

namespace {

struct Handle {
    std::vector<int64_t> pos, minor, feat, qstrat, ins_pos, ins_len;
    std::vector<int32_t> rec_id;
};

}  // namespace

extern "C" void* gt_pileup_events(
    const uint8_t* seq, const uint8_t* qual, const int64_t* seq_off,
    const uint32_t* cigar, const int64_t* cigar_off,
    const int64_t* rpos, const uint8_t* rev, int64_t n_records,
    const int64_t* num2countbase,  // [32] lookup (python's table, -1 skip)
    int64_t del_feat_fwd, int64_t del_feat_rev, int64_t num_homop) {
    auto* h = new Handle();
    // BAM cigar op nibbles: MIDNSHP=X -> 0..8
    for (int64_t r = 0; r < n_records; r++) {
        const uint8_t* s = seq + seq_off[r];
        const uint8_t* q = qual + seq_off[r];
        int64_t rp = rpos[r];
        int64_t qp = 0;
        const int64_t rev_off = rev[r] ? 16 : 0;
        const int64_t del_feat = rev[r] ? del_feat_rev : del_feat_fwd;
        const int64_t c0 = cigar_off[r], c1 = cigar_off[r + 1];

        auto emit = [&](int64_t q_idx, int64_t r_pos, int64_t minor_val) {
            const int64_t bi = num2countbase[s[q_idx] + rev_off];
            if (bi == -1) return;
            int64_t qs = 0;
            if (num_homop > 1) {
                qs = q[q_idx];
                if (qs > num_homop) qs = num_homop;
                qs -= 1;
                if (qs < 0) qs = 0;
            }
            h->pos.push_back(r_pos);
            h->minor.push_back(minor_val);
            h->feat.push_back(bi);
            h->qstrat.push_back(qs);
            h->rec_id.push_back((int32_t)r);
        };

        for (int64_t ci = c0; ci < c1; ci++) {
            const uint32_t w = cigar[ci];
            const int64_t op = w & 0xF;
            const int64_t ln = w >> 4;
            if (op == 0 || op == 7 || op == 8) {  // M, =, X
                for (int64_t t = 0; t < ln; t++) emit(qp + t, rp + t, 0);
                if (ci + 1 < c1 && (cigar[ci + 1] & 0xF) == 1) {  // I next
                    const int64_t ili = cigar[ci + 1] >> 4;
                    const int64_t anchor_r = rp + ln - 1;
                    const int64_t anchor_q = qp + ln - 1;
                    h->ins_pos.push_back(anchor_r);
                    h->ins_len.push_back(ili);
                    for (int64_t j = 1; j <= ili; j++)
                        emit(anchor_q + j, anchor_r, j);
                }
                rp += ln;
                qp += ln;
            } else if (op == 2) {  // D
                for (int64_t t = 0; t < ln; t++) {
                    h->pos.push_back(rp + t);
                    h->minor.push_back(0);
                    h->feat.push_back(del_feat);
                    h->qstrat.push_back(0);
                    h->rec_id.push_back((int32_t)r);
                }
                if (ci + 1 < c1 && (cigar[ci + 1] & 0xF) == 1) {
                    h->ins_pos.push_back(rp + ln - 1);
                    h->ins_len.push_back(cigar[ci + 1] >> 4);
                }
                rp += ln;
            } else if (op == 1 || op == 4) {  // I, S consume query
                qp += ln;
            } else if (op == 3) {  // N consumes reference
                rp += ln;
            }
            // H, P consume nothing
        }
    }
    return h;
}

extern "C" int64_t gt_pileup_n_events(void* hp) {
    return (int64_t)static_cast<Handle*>(hp)->pos.size();
}

extern "C" int64_t gt_pileup_n_ins(void* hp) {
    return (int64_t)static_cast<Handle*>(hp)->ins_pos.size();
}

extern "C" void gt_pileup_copy(void* hp, int64_t* pos, int64_t* minor,
                               int64_t* feat, int64_t* qstrat,
                               int32_t* rec_id, int64_t* ins_pos,
                               int64_t* ins_len) {
    auto* h = static_cast<Handle*>(hp);
    auto cp = [](auto& v, auto* dst) {
        for (std::size_t i = 0; i < v.size(); i++) dst[i] = v[i];
    };
    cp(h->pos, pos);
    cp(h->minor, minor);
    cp(h->feat, feat);
    cp(h->qstrat, qstrat);
    cp(h->rec_id, rec_id);
    cp(h->ins_pos, ins_pos);
    cp(h->ins_len, ins_len);
}

extern "C" void gt_pileup_free(void* hp) { delete static_cast<Handle*>(hp); }
