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
};

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
        bd->ref_id.push_back(rd<int32_t>(d, s));
        bd->pos.push_back(rd<int32_t>(d, s + 4));
        uint8_t l_read_name = d[s + 8];
        bd->mapq.push_back(d[s + 9]);
        uint16_t n_cigar = rd<uint16_t>(d, s + 12);
        bd->flag.push_back(rd<uint16_t>(d, s + 14));
        int32_t l_seq = rd<int32_t>(d, s + 16);
        size_t off = s + 32;
        bd->name_off.push_back((int64_t)bd->names.size());
        bd->names.append((const char*)d.data() + off, l_read_name - 1);
        off += l_read_name;
        bd->cigar_off.push_back((int64_t)bd->cigar.size());
        for (uint16_t c = 0; c < n_cigar; c++)
            bd->cigar.push_back(rd<uint32_t>(d, off + 4ull * c));
        off += 4ull * n_cigar;
        bd->seq_off.push_back((int64_t)bd->seq_nt16.size());
        size_t nb = ((size_t)l_seq + 1) / 2;
        for (int32_t i = 0; i < l_seq; i++) {
            uint8_t b = d[off + (size_t)i / 2];
            bd->seq_nt16.push_back((i & 1) ? (b & 0xF) : (b >> 4));
        }
        off += nb;
        bd->qual.insert(bd->qual.end(), d.begin() + off, d.begin() + off + l_seq);
        pos = s + (size_t)block_size;
    }
    // terminal offsets
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

void gt_bam_free(void* h) { delete (BamData*)h; }

}  // extern "C"
