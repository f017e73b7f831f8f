// Golden-fixture generator for the FM-index SMEM search: drives the
// reference's own FMI_search (built with the plaintext HE stub) through the
// fmi driver's exact 3-phase orchestration (fmi.cpp:241-345) and dumps all
// SMEMs plus index metadata.
//
// Usage: fmi_golden <prefix> <seq.txt> <reads.txt> <batch_size> <minSeedLen>
//   seq.txt   — one line, ACGT only (no ambiguity so .pac packing is exact)
//   reads.txt — one read per line, ACGT only
// Writes <prefix>.pac then runs build_index() + load_index() in-process
// (the fork's on-disk block layout embeds C++ object headers, so build and
// load must share one binary).  Output lines:
//   IDX <ref_len> <count0> .. <count4> <sentinel_index>
//   HCP <fnv64 of cp_occ cp_count+one_hot>   HSA <fnv64 of sa arrays>
//   B <batch_id> <num_smem1> <num_smem2> <num_smem3>
//   S <rid> <m> <n> <k> <l> <s>        (sorted, one per SMEM)
#include <cassert>
#include <cinttypes>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#define private public  // reach cp_occ/sa/count for the stub hooks + hashes
#include "FMI_search.h"
#undef private

static uint64_t fnv64(uint64_t h, const void* data, size_t n) {
    const unsigned char* p = (const unsigned char*)data;
    for (size_t i = 0; i < n; i++) {
        h ^= p[i];
        h *= 1099511628211ULL;
    }
    return h;
}

static void write_pac(const std::string& path, const std::string& seq) {
    // bwa .pac convention (pac2nt/pac_seq_len, FMI_search.cpp:96-127):
    // base i at bits (3-(i&3))*2 of byte i>>2; if len%4==0 append a zero
    // byte; final byte stores len%4.
    std::vector<uint8_t> buf((seq.size() + 3) / 4, 0);
    for (size_t i = 0; i < seq.size(); i++) {
        int code;
        switch (seq[i]) {
            case 'A': code = 0; break;
            case 'C': code = 1; break;
            case 'G': code = 2; break;
            case 'T': code = 3; break;
            default:
                fprintf(stderr, "non-ACGT base in seq\n");
                exit(1);
        }
        buf[i >> 2] |= code << ((3 - (i & 3)) << 1);
    }
    FILE* f = fopen(path.c_str(), "wb");
    fwrite(buf.data(), 1, buf.size(), f);
    uint8_t rem = seq.size() % 4;
    if (rem == 0) fputc(0, f);
    fputc(rem, f);
    fclose(f);
}

int main(int argc, char** argv) {
    if (argc != 6) {
        fprintf(stderr,
                "usage: %s <prefix> <seq.txt> <reads.txt> <batch> <minSeed>\n",
                argv[0]);
        return 2;
    }
    const char* prefix = argv[1];
    std::ifstream seqf(argv[2]);
    std::string seq;
    std::getline(seqf, seq);
    std::ifstream readf(argv[3]);
    std::vector<std::string> reads;
    for (std::string line; std::getline(readf, line);)
        if (!line.empty()) reads.push_back(line);
    int batch_size = atoi(argv[4]);
    int minSeedLen = atoi(argv[5]);

    write_pac(std::string(prefix) + ".pac", seq);
    {
        // minimal single-contig bntseq metadata for bns_restore
        // (bwa .ann/.amb text formats; no holes, no .alt file)
        FILE* fa = fopen((std::string(prefix) + ".ann").c_str(), "w");
        fprintf(fa, "%lld %d %u\n", (long long)seq.size(), 1, 11u);
        fprintf(fa, "0 golden (null)\n");
        fprintf(fa, "0 %lld 0\n", (long long)seq.size());
        fclose(fa);
        FILE* fb = fopen((std::string(prefix) + ".amb").c_str(), "w");
        fprintf(fb, "%lld %d %d\n", (long long)seq.size(), 1, 0);
        fclose(fb);
    }

    {
        FMI_search builder(prefix);
        builder.build_index();
    }

    FMI_search* fmi = new FMI_search(prefix);
    // the fork reads packed-ciphertext shards for these during the
    // load-time sentinel walk; serve them from the live index instead
    g_cp_occ_one_hot_hook = [&](int64_t i, int64_t j) -> int64_t {
        return (int64_t)fmi->cp_occ[i].one_hot_bwt_str[j];
    };
    g_cp_occ_cp_count_hook = [&](int64_t i, int64_t j) -> int64_t {
        return fmi->cp_occ[i].cp_count[j];
    };
    g_sa_ls_word_hook = [&](int64_t i) -> int64_t {
        return fmi->sa_ls_word[i];
    };
    g_sa_ms_byte_hook = [&](int64_t i) -> int64_t {
        return fmi->sa_ms_byte[i];
    };
    fmi->load_index();

    int64_t ref_len = fmi->reference_seq_len;
    printf("IDX %" PRId64 " %" PRId64 " %" PRId64 " %" PRId64 " %" PRId64
           " %" PRId64 " %" PRId64 "\n",
           ref_len, fmi->count[0], fmi->count[1], fmi->count[2], fmi->count[3],
           fmi->count[4],
           decrypt_ciphertext_to_plaintext_vector(fmi->sentinel_index_enc)[0]);

    uint64_t hcp = 14695981039346656037ULL;
    int64_t n_blocks = (ref_len >> CP_SHIFT) + 1;
    for (int64_t i = 0; i < n_blocks; i++) {
        hcp = fnv64(hcp, fmi->cp_occ[i].cp_count, 4 * sizeof(int64_t));
        hcp = fnv64(hcp, fmi->cp_occ[i].one_hot_bwt_str, 4 * sizeof(uint64_t));
    }
    uint64_t hsa = 14695981039346656037ULL;
    int64_t n_sa = (ref_len >> SA_COMPX) + 1;
    hsa = fnv64(hsa, fmi->sa_ms_byte, n_sa * sizeof(int8_t));
    hsa = fnv64(hsa, fmi->sa_ls_word, n_sa * sizeof(uint32_t));
    printf("HCP %016" PRIx64 " HSA %016" PRIx64 "\n", hcp, hsa);

    // ---- encode reads on the driver's fixed max_readlength grid
    int numReads = (int)reads.size();
    int max_readlength = 0;
    for (auto& r : reads)
        if ((int)r.size() > max_readlength) max_readlength = (int)r.size();
    std::vector<uint8_t> enc_qdb((size_t)numReads * max_readlength, 4);
    std::vector<int32_t> query_cum_len_ar(numReads);
    bseq1_t* seqs = (bseq1_t*)calloc(numReads, sizeof(bseq1_t));
    for (int i = 0; i < numReads; i++) {
        query_cum_len_ar[i] = i * max_readlength;
        seqs[i].l_seq = (int)reads[i].size();
        for (size_t r = 0; r < reads[i].size(); r++) {
            int code;
            switch (reads[i][r]) {
                case 'A': code = 0; break;
                case 'C': code = 1; break;
                case 'G': code = 2; break;
                case 'T': code = 3; break;
                default: code = 4;
            }
            enc_qdb[(size_t)i * max_readlength + r] = code;
        }
    }

    // ---- the driver's per-batch 3-phase loop (fmi.cpp:241-345)
    const int splitWidth = 10;
    const int maxMemIntv = 20;
    const double splitFactor = 1.5;
    int split_len = (int)(minSeedLen * splitFactor + .499);

    int64_t cap = (int64_t)numReads * (max_readlength + 2) * 40 + 4096;
    std::vector<SMEM> matchArray(cap);
    // sized like the driver's matchArrayAlloc arrays: the reseed filter
    // writes up to num_smem1 entries, which can exceed numReads
    std::vector<int32_t> min_intv_array(cap);
    std::vector<int32_t> rid_array(cap);
    std::vector<int16_t> query_pos_array(cap);

    int64_t myTotalSmems = 0;
    for (int64_t i = 0; i < numReads; i += batch_size) {
        int32_t batch_count = batch_size;
        if (i + batch_count > numReads) batch_count = numReads - i;
        for (int32_t j = 0; j < batch_count; j++) {
            min_intv_array[j] = 1;
            rid_array[j] = j;
        }
        int batch_id = i / batch_size;
        int64_t num_smem1 = 0, num_smem2 = 0, num_smem3 = 0;
        fmi->getSMEMsAllPosOneThread(
            enc_qdb.data() + i * max_readlength, min_intv_array.data(),
            rid_array.data(), batch_count, batch_size, seqs + i,
            query_cum_len_ar.data(), max_readlength, minSeedLen,
            &matchArray[myTotalSmems], &num_smem1);
        int64_t pos = 0;
        for (int64_t j = 0; j < num_smem1; j++) {
            SMEM* sp = &matchArray[myTotalSmems + j];
            int start = sp->m, end = sp->n + 1;
            if (end - start < split_len || sp->s > splitWidth) continue;
            rid_array[pos] = sp->rid;
            query_pos_array[pos] = (end + start) >> 1;
            min_intv_array[pos] = sp->s + 1;
            pos++;
        }
        fmi->getSMEMsOnePosOneThread(
            enc_qdb.data() + i * max_readlength, query_pos_array.data(),
            min_intv_array.data(), rid_array.data(), pos, pos, seqs + i,
            query_cum_len_ar.data(), max_readlength, minSeedLen,
            &matchArray[myTotalSmems + num_smem1], &num_smem2);
        for (int32_t j = 0; j < batch_count; j++)
            min_intv_array[j] = maxMemIntv;
        num_smem3 = fmi->bwtSeedStrategyAllPosOneThread(
            enc_qdb.data() + i * max_readlength, min_intv_array.data(),
            batch_count, seqs + i, query_cum_len_ar.data(), minSeedLen + 1,
            &matchArray[myTotalSmems + num_smem1 + num_smem2]);
        int64_t totalSmem = num_smem1 + num_smem2 + num_smem3;
        assert(myTotalSmems + totalSmem <= cap);
        printf("B %d %" PRId64 " %" PRId64 " %" PRId64 "\n", batch_id,
               num_smem1, num_smem2, num_smem3);
        for (int64_t j = 0; j < totalSmem; j++)
            matchArray[myTotalSmems + j].rid += i;
        int64_t numTotal[1] = {totalSmem};
        fmi->sortSMEMs(&matchArray[myTotalSmems], numTotal, batch_count,
                       max_readlength, 1);
        for (int64_t j = 0; j < totalSmem; j++) {
            SMEM* sp = &matchArray[myTotalSmems + j];
            printf("S %u %u %u %" PRId64 " %" PRId64 " %" PRId64 "\n", sp->rid,
                   sp->m, sp->n, sp->k, sp->l, sp->s);
        }
        myTotalSmems += totalSmem;
    }
    printf("TOTAL %" PRId64 "\n", myTotalSmems);
    return 0;
}
