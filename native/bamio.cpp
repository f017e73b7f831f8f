// Native BAM reader: BGZF inflate + record field extraction into columnar
// arrays (the framework's htslib replacement for the pileup/dbg input
// path; the reference links htslib, e.g. benchmarks/pileup/medaka_counts.c
// :330-340 and benchmarks/dbg/debruijn.cpp:1473-1500).
//
// Exposed via ctypes (io/native.py): gt_bam_open parses the whole file,
// gt_bam_* getters report array sizes, gt_bam_copy_out fills caller-
// allocated numpy buffers, gt_bam_free releases the handle.

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct BamData {
    std::string error;
    // references
    std::vector<std::string> ref_names;  // joined with '\n' on copy-out
    std::vector<int64_t> ref_lens;
    // per record
    std::vector<int32_t> ref_id, pos, mapq, flag;
    std::vector<int64_t> name_off, cigar_off, seq_off;  // exclusive prefix
    std::string names;                  // concatenated, no separators
    std::vector<uint32_t> cigar;        // raw BAM cigar words
    std::vector<uint8_t> seq_nt16;      // unpacked 4-bit codes
    std::vector<uint8_t> qual;          // same offsets as seq
    std::vector<int32_t> span;          // reference span (region opens)
};

template <typename T>
T rd_fwd(const std::vector<uint8_t>& d, size_t off) {
    T v;
    std::memcpy(&v, d.data() + off, sizeof(T));
    return v;
}

// append one record (block body at d+s, length block_size) to bd
void push_record(BamData* bd, const std::vector<uint8_t>& d, size_t s) {
    bd->ref_id.push_back(rd_fwd<int32_t>(d, s));
    bd->pos.push_back(rd_fwd<int32_t>(d, s + 4));
    uint8_t l_read_name = d[s + 8];
    bd->mapq.push_back(d[s + 9]);
    uint16_t n_cigar = rd_fwd<uint16_t>(d, s + 12);
    bd->flag.push_back(rd_fwd<uint16_t>(d, s + 14));
    int32_t l_seq = rd_fwd<int32_t>(d, s + 16);
    size_t off = s + 32;
    bd->name_off.push_back((int64_t)bd->names.size());
    bd->names.append((const char*)d.data() + off, l_read_name - 1);
    off += l_read_name;
    bd->cigar_off.push_back((int64_t)bd->cigar.size());
    int64_t span = 0;
    for (uint16_t c = 0; c < n_cigar; c++) {
        uint32_t w = rd_fwd<uint32_t>(d, off + 4ull * c);
        bd->cigar.push_back(w);
        const uint32_t op = w & 0xF;
        // M, D, N, =, X consume reference
        if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
            span += (int64_t)(w >> 4);
    }
    bd->span.push_back((int32_t)span);
    off += 4ull * n_cigar;
    const size_t sbase = bd->seq_nt16.size();
    bd->seq_off.push_back((int64_t)sbase);
    size_t nb = ((size_t)l_seq + 1) / 2;
    bd->seq_nt16.resize(sbase + (size_t)l_seq);
    uint8_t* sq = bd->seq_nt16.data() + sbase;
    const uint8_t* packed = d.data() + off;
    for (int32_t i = 0; i + 1 < l_seq; i += 2) {
        const uint8_t b = packed[i >> 1];
        sq[i] = b >> 4;
        sq[i + 1] = b & 0xF;
    }
    if (l_seq & 1) sq[l_seq - 1] = packed[(l_seq - 1) >> 1] >> 4;
    off += nb;
    bd->qual.insert(bd->qual.end(), d.begin() + off, d.begin() + off + l_seq);
}

bool bgzf_inflate_all(const uint8_t* data, size_t n, std::vector<uint8_t>& out,
                      std::string& err) {
    size_t pos = 0;
    std::vector<uint8_t> buf(1 << 16);
    while (pos + 18 <= n) {
        if (data[pos] != 0x1f || data[pos + 1] != 0x8b) {
            err = "bad BGZF magic";
            return false;
        }
        uint16_t xlen;
        std::memcpy(&xlen, data + pos + 10, 2);
        size_t extra = pos + 12;
        size_t bsize = 0;
        size_t end = extra + xlen;
        while (extra + 4 <= end) {
            uint8_t si1 = data[extra], si2 = data[extra + 1];
            uint16_t slen;
            std::memcpy(&slen, data + extra + 2, 2);
            if (si1 == 'B' && si2 == 'C' && slen == 2) {
                uint16_t bs;
                std::memcpy(&bs, data + extra + 4, 2);
                bsize = (size_t)bs + 1;
            }
            extra += 4 + slen;
        }
        if (!bsize) {
            err = "missing BSIZE";
            return false;
        }
        size_t cdata_off = pos + 12 + xlen;
        size_t cdata_len = bsize - xlen - 19 - 1;  // total - header(12+xlen) - crc/isize(8)
        // (12 + xlen) header + cdata + 8 trailer = bsize
        cdata_len = bsize - (12 + xlen) - 8;
        uint32_t isize;
        std::memcpy(&isize, data + pos + bsize - 4, 4);
        size_t start = out.size();
        out.resize(start + isize);
        if (isize) {
            z_stream zs{};
            if (inflateInit2(&zs, -15) != Z_OK) {
                err = "inflateInit2 failed";
                return false;
            }
            zs.next_in = const_cast<Bytef*>(data + cdata_off);
            zs.avail_in = (uInt)cdata_len;
            zs.next_out = out.data() + start;
            zs.avail_out = isize;
            int rc = inflate(&zs, Z_FINISH);
            inflateEnd(&zs);
            if (rc != Z_STREAM_END) {
                err = "inflate failed rc=" + std::to_string(rc);
                return false;
            }
        }
        pos += bsize;
    }
    return true;
}

template <typename T>
T rd(const std::vector<uint8_t>& d, size_t off) {
    T v;
    std::memcpy(&v, d.data() + off, sizeof(T));
    return v;
}

}  // namespace

extern "C" {

void* gt_bam_open(const char* path) {
    auto* bd = new BamData();
    FILE* f = std::fopen(path, "rb");
    if (!f) {
        delete bd;
        return nullptr;
    }
    std::fseek(f, 0, SEEK_END);
    long fsize = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> raw(fsize);
    if (std::fread(raw.data(), 1, fsize, f) != (size_t)fsize) {
        std::fclose(f);
        delete bd;
        return nullptr;
    }
    std::fclose(f);

    std::vector<uint8_t> d;
    if (!bgzf_inflate_all(raw.data(), raw.size(), d, bd->error) ||
        d.size() < 8 || std::memcmp(d.data(), "BAM\1", 4) != 0) {
        delete bd;
        return nullptr;
    }
    size_t pos = 4;
    int32_t l_text = rd<int32_t>(d, pos);
    pos += 4 + (size_t)l_text;
    int32_t n_ref = rd<int32_t>(d, pos);
    pos += 4;
    for (int32_t i = 0; i < n_ref; i++) {
        int32_t l_name = rd<int32_t>(d, pos);
        bd->ref_names.emplace_back((const char*)d.data() + pos + 4, l_name - 1);
        bd->ref_lens.push_back(rd<int32_t>(d, pos + 4 + l_name));
        pos += 8 + (size_t)l_name;
    }
    while (pos + 4 <= d.size()) {
        int32_t block_size = rd<int32_t>(d, pos);
        size_t s = pos + 4;
        push_record(bd, d, s);
        pos = s + (size_t)block_size;
    }
    // terminal offsets
    bd->name_off.push_back((int64_t)bd->names.size());
    bd->cigar_off.push_back((int64_t)bd->cigar.size());
    bd->seq_off.push_back((int64_t)bd->seq_nt16.size());
    return bd;
}

// Region open: decode only the .bai-bounded window and keep only
// records overlapping [beg, end) on ref_id (the io/bam.py
// read_bam_region contract: same stop conditions, same overlap rule
// pos + max(ref_span, 1) > beg), optionally pre-filtering by flag
// mask / min mapq (medaka FILTER_FLAGS + mapq gate run natively).
// voff_lo/voff_hi are .bai virtual offsets ((coffset<<16)|uoffset).
// Streaming BGZF: blocks inflate one at a time from coffset(voff_lo),
// so memory and IO stay region-sized.
void* gt_bam_open_region(const char* path, uint64_t voff_lo,
                         uint64_t voff_hi, int32_t ref_id, int64_t beg,
                         int64_t end, int32_t filter_flags,
                         int32_t min_mapq) {
    auto* bd = new BamData();
    FILE* f = std::fopen(path, "rb");
    if (!f) {
        delete bd;
        return nullptr;
    }
    uint64_t coff = voff_lo >> 16;
    size_t skip = (size_t)(voff_lo & 0xFFFF);  // intra-block byte offset
    std::fseek(f, (long)coff, SEEK_SET);

    std::vector<uint8_t> d;        // inflated bytes (window so far)
    std::vector<uint64_t> vbase;   // virtual offset at d position
    std::vector<size_t> dbase;     // inflated offset of each block start
    std::vector<uint8_t> raw(1 << 16);
    size_t pos = skip;
    bool done = false;
    uint64_t cur_coff = coff;
    auto inflate_next = [&]() -> bool {  // appends one BGZF block to d
        uint8_t hdr[12];  // gzip fixed header (10) + XLEN (2)
        if (std::fread(hdr, 1, 12, f) != 12) return false;
        if (hdr[0] != 0x1f || hdr[1] != 0x8b) return false;
        uint16_t xlen;
        std::memcpy(&xlen, hdr + 10, 2);
        std::vector<uint8_t> extra(xlen);
        if (std::fread(extra.data(), 1, xlen, f) != xlen) return false;
        size_t bsize = 0;
        for (size_t e = 0; e + 4 <= xlen;) {
            uint16_t slen;
            std::memcpy(&slen, extra.data() + e + 2, 2);
            if (extra[e] == 'B' && extra[e + 1] == 'C' && slen == 2) {
                uint16_t bs;
                std::memcpy(&bs, extra.data() + e + 4, 2);
                bsize = (size_t)bs + 1;
            }
            e += 4 + slen;
        }
        if (!bsize) return false;
        size_t cdata_len = bsize - (12 + xlen) - 8;
        if (raw.size() < cdata_len + 8) raw.resize(cdata_len + 8);
        if (std::fread(raw.data(), 1, cdata_len + 8, f) != cdata_len + 8)
            return false;
        uint32_t isize;
        std::memcpy(&isize, raw.data() + cdata_len + 4, 4);
        size_t start = d.size();
        vbase.push_back(cur_coff << 16);
        dbase.push_back(start);
        d.resize(start + isize);
        if (isize) {
            z_stream zs{};
            if (inflateInit2(&zs, -15) != Z_OK) return false;
            zs.next_in = raw.data();
            zs.avail_in = (uInt)cdata_len;
            zs.next_out = d.data() + start;
            zs.avail_out = isize;
            int rc = inflate(&zs, Z_FINISH);
            inflateEnd(&zs);
            if (rc != Z_STREAM_END) return false;
        }
        cur_coff += bsize;
        return isize > 0 || bsize > 28;  // EOF block: 28-byte empty
    };
    auto ensure = [&](size_t need) -> bool {
        while (d.size() < need) {
            if (!inflate_next()) return false;
        }
        return true;
    };
    while (!done) {
        if (!ensure(pos + 4)) break;
        int32_t block_size = rd<int32_t>(d, pos);
        if (!ensure(pos + 4 + (size_t)block_size)) break;
        // virtual offset of THIS record start (for the voff_hi stop)
        size_t bi = dbase.size();
        while (bi > 0 && dbase[bi - 1] > pos) bi--;
        const uint64_t voff = vbase[bi - 1] | (uint64_t)(pos - dbase[bi - 1]);
        const size_t s = pos + 4;
        const int32_t rid = rd<int32_t>(d, s);
        const int32_t p0 = rd<int32_t>(d, s + 4);
        if (rid != ref_id || (int64_t)p0 >= end) {
            if (rid > ref_id || (rid == ref_id && (int64_t)p0 >= end)
                || rid < 0)
                break;
            pos = s + (size_t)block_size;
            continue;
        }
        const uint16_t fl = rd_fwd<uint16_t>(d, s + 14);
        const uint8_t mq = d[s + 9];
        if (!(filter_flags && (fl & filter_flags))
            && mq >= (uint8_t)min_mapq) {
            const size_t before = bd->ref_id.size();
            push_record(bd, d, s);
            // overlap rule: pos + max(ref_span, 1) > beg
            int64_t sp = bd->span.back() > 0 ? bd->span.back() : 1;
            if ((int64_t)p0 + sp <= beg) {
                // roll back the non-overlapping record
                bd->ref_id.resize(before);
                bd->pos.resize(before);
                bd->mapq.resize(before);
                bd->flag.resize(before);
                bd->names.resize((size_t)bd->name_off.back());
                bd->cigar.resize((size_t)bd->cigar_off.back());
                bd->seq_nt16.resize((size_t)bd->seq_off.back());
                bd->qual.resize((size_t)bd->seq_off.back());
                bd->name_off.resize(before);
                bd->cigar_off.resize(before);
                bd->seq_off.resize(before);
                bd->span.resize(before);
            }
        }
        if (voff > voff_hi) done = true;
        pos = s + (size_t)block_size;
    }
    std::fclose(f);
    bd->name_off.push_back((int64_t)bd->names.size());
    bd->cigar_off.push_back((int64_t)bd->cigar.size());
    bd->seq_off.push_back((int64_t)bd->seq_nt16.size());
    return bd;
}

int64_t gt_bam_n_records(void* h) { return (int64_t)((BamData*)h)->ref_id.size(); }
int64_t gt_bam_n_refs(void* h) { return (int64_t)((BamData*)h)->ref_names.size(); }
int64_t gt_bam_names_bytes(void* h) { return (int64_t)((BamData*)h)->names.size(); }
int64_t gt_bam_cigar_words(void* h) { return (int64_t)((BamData*)h)->cigar.size(); }
int64_t gt_bam_seq_bytes(void* h) { return (int64_t)((BamData*)h)->seq_nt16.size(); }

int64_t gt_bam_refnames_bytes(void* h) {
    auto* bd = (BamData*)h;
    size_t n = 0;
    for (auto& s : bd->ref_names) n += s.size() + 1;  // '\n' separated
    return (int64_t)n;
}

void gt_bam_copy_refs(void* h, char* names_out, int64_t* lens_out) {
    auto* bd = (BamData*)h;
    size_t o = 0;
    for (size_t i = 0; i < bd->ref_names.size(); i++) {
        std::memcpy(names_out + o, bd->ref_names[i].data(), bd->ref_names[i].size());
        o += bd->ref_names[i].size();
        names_out[o++] = '\n';
        lens_out[i] = bd->ref_lens[i];
    }
}

void gt_bam_copy_out(void* h, int32_t* ref_id, int32_t* pos, int32_t* mapq,
                     int32_t* flag, int64_t* name_off, char* names,
                     int64_t* cigar_off, uint32_t* cigar, int64_t* seq_off,
                     uint8_t* seq, uint8_t* qual) {
    auto* bd = (BamData*)h;
    auto cp = [](auto& v, auto* p) { std::memcpy(p, v.data(), v.size() * sizeof(v[0])); };
    cp(bd->ref_id, ref_id);
    cp(bd->pos, pos);
    cp(bd->mapq, mapq);
    cp(bd->flag, flag);
    cp(bd->name_off, name_off);
    std::memcpy(names, bd->names.data(), bd->names.size());
    cp(bd->cigar_off, cigar_off);
    cp(bd->cigar, cigar);
    cp(bd->seq_off, seq_off);
    cp(bd->seq_nt16, seq);
    cp(bd->qual, qual);
}

void gt_bam_copy_span(void* h, int32_t* out) {
    auto* bd = (BamData*)h;
    std::memcpy(out, bd->span.data(), bd->span.size() * sizeof(int32_t));
}

void gt_bam_free(void* h) { delete (BamData*)h; }

}  // extern "C"
