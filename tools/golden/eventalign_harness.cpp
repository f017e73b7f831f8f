// Golden-fixture generator for the f5c eventalign-mode postprocessing:
// drives the reference's OWN per-read chain past the banded align —
// postalign + recalibrate_model (align.c:550-763), the QC gates
// (f5c.c scaling_single :1263-1330), realign_read's segment-wise profile
// HMM against the reference sequence (eventalign.c:1942 ->
// align_read_to_ref :1263 -> profile_hmm_align :703), summarize_alignment
// (:1580) and emit_event_alignment_tsv (:1853) — on synthetic reads whose
// BAM is written by this framework's own io/bam.py (doubling as a writer
// cross-check, like the pileup generator).
//
// Usage: eventalign_golden <model.tsv> <cases.txt> <reads.bam>
//   model.tsv — "kmer level_mean level_stdv" per line (k=6)
//   cases.txt — first line: reference/genome sequence; then per read three
//               lines: qname; fastq read sequence; n + n signal samples
//   reads.bam — alignments of those reads (qname matching), htslib-readable
// Output:
//   READ <read_idx> <qname> <flag_status>           (every candidate read)
//   SCALE <shift_hex> <scale_hex> <var_hex> <events_per_base_hex>
//   SUMMARY <num_events> <num_steps> <num_skips> <num_stays>
//           <sum_duration_hex> <sum_z_hex> <nm> <ref_span>
//   TSV <verbatim emit_event_alignment_tsv line>    (per alignment row)
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

#include "f5c.h"
#include "f5cmisc.h"
#include "error.h"

#include <htslib/sam.h>

event_table getevents(size_t nsample, float* rawptr);

static uint32_t kmer_rank6(const char* kmer, uint32_t k) {
    uint32_t r = 0;
    for (uint32_t i = 0; i < k; i++) {
        int code;
        switch (kmer[i]) {
            case 'A': code = 0; break;
            case 'C': code = 1; break;
            case 'G': code = 2; break;
            default: code = 3;
        }
        r = r * 4 + code;
    }
    return r;
}

int main(int argc, char** argv) {
    if (argc != 4) {
        fprintf(stderr, "usage: %s <model.tsv> <cases.txt> <reads.bam>\n",
                argv[0]);
        return 2;
    }
    const uint32_t K = 6;
    std::vector<model_t> models(1 << (2 * K));
    {
        std::ifstream mf(argv[1]);
        std::string line;
        while (std::getline(mf, line)) {
            if (line.empty() || line[0] == '#' || line.rfind("kmer", 0) == 0)
                continue;
            std::istringstream ss(line);
            std::string kmer;
            double mean, stdv;
            ss >> kmer >> mean >> stdv;
            if (kmer.size() != K) continue;
            model_t& m = models[kmer_rank6(kmer.c_str(), K)];
            m.level_mean = (float)mean;
            m.level_stdv = (float)stdv;
#ifdef CACHED_LOG
            m.level_log_stdv = (float)log((double)m.level_stdv);
#endif
        }
    }

    std::string genome;
    std::map<std::string, std::pair<std::string, std::vector<float>>> reads;
    {
        std::ifstream cf(argv[2]);
        cf >> genome;
        int n_reads;
        cf >> n_reads;
        for (int i = 0; i < n_reads; i++) {
            std::string qname, seq;
            size_t n;
            cf >> qname >> seq >> n;
            std::vector<float> raw(n);
            for (size_t j = 0; j < n; j++) cf >> raw[j];
            reads[qname] = {seq, raw};
        }
    }

    samFile* fp = sam_open(argv[3], "r");
    if (!fp) { fprintf(stderr, "bad bam\n"); return 1; }
    bam_hdr_t* hdr = sam_hdr_read(fp);
    bam1_t* rec = bam_init1();
    const float sample_rate = 4000.0f;
    const int min_mapq = 20;  // init_opt (f5c.c:1766)
    int64_t read_index = 0;

    while (sam_read1(fp, hdr, rec) >= 0) {
        int64_t read_idx = read_index;  // consumed even by skipped records
        read_index += 1;                // (f5c.c:713-715)
        if ((rec->core.flag & BAM_FUNMAP) != 0 || rec->core.qual < min_mapq)
            continue;
        if (rec->core.flag & BAM_FSECONDARY) continue;

        std::string qname = bam_get_qname(rec);
        auto it = reads.find(qname);
        if (it == reads.end()) continue;
        const std::string& seq = it->second.first;
        std::vector<float> raw = it->second.second;

        event_table et = getevents(raw.size(), raw.data());
        scalings_t sc = estimate_scalings_using_mom(
            (char*)seq.c_str(), (int32_t)seq.size(), models.data(), et);

        std::vector<AlignedPair> pairs(et.n * 2 + 16);
        int32_t npairs = align(pairs.data(), (char*)seq.c_str(),
                               (int32_t)seq.size(), et, models.data(), sc,
                               sample_rate);

        // --- scaling_single (f5c.c:1263-1330) ---
        int status = 0;
        int32_t n_kmers = (int32_t)seq.size() - KMER_SIZE + 1;
        std::vector<index_pair_t> b2e(n_kmers);
        double events_per_base = 0;
        if (npairs > 0) {
            std::vector<event_alignment_t> alignment(npairs);
            int32_t n_alignment = postalign(
                alignment.data(), b2e.data(), &events_per_base,
                (char*)seq.c_str(), n_kmers, pairs.data(), npairs);
            bool calibrated = recalibrate_model(
                models.data(), et, &sc, alignment.data(), n_alignment, 1);
            if (!calibrated || sc.var > MIN_CALIBRATION_VAR)
                status |= FAILED_CALIBRATION;
            else if (events_per_base > 5.0)
                status |= FAILED_QUALITY_CHK;
        } else {
            status |= FAILED_ALIGNMENT;
        }
        printf("READ %lld %s %d\n", (long long)read_idx, qname.c_str(),
               status);
        if (status) { free(et.event); continue; }
        printf("SCALE %a %a %a %a\n", sc.shift, sc.scale, sc.var,
               events_per_base);

        // --- eventalign output path (f5c.c:1382-1387, :1677) ---
        std::string ref_segment = genome.substr(
            rec->core.pos, bam_endpos(rec) - rec->core.pos);
        std::vector<event_alignment_t> result;
        EventalignSummary summary;
        // summary_fp non-NULL so realign_read fills the summary
        realign_read(&result, &summary, stderr, (char*)ref_segment.c_str(),
                     hdr, rec, (int32_t)seq.size(), read_idx,
                     /*region_start=*/-1, /*region_end=*/-1,
                     &et, models.data(), b2e.data(), sc, events_per_base,
                     sample_rate);
        printf("SUMMARY %d %d %d %d %a %a %d %d\n", summary.num_events,
               summary.num_steps, summary.num_skips, summary.num_stays,
               summary.sum_duration, summary.sum_z_score,
               summary.alignment_edit_distance, summary.reference_span);
        // prefix every TSV row so the fixture splits cleanly
        char* contig = hdr->target_name[rec->core.tid];
        FILE* mem = tmpfile();
        emit_event_alignment_tsv(mem, 0, &et, models.data(), sc, result,
                                 /*print_read_names=*/0, /*scale_events=*/0,
                                 /*write_samples=*/0, read_idx,
                                 (char*)qname.c_str(), contig, sample_rate);
        rewind(mem);
        char linebuf[4096];
        while (fgets(linebuf, sizeof linebuf, mem))
            printf("TSV %s", linebuf);
        fclose(mem);
        free(et.event);
    }
    bam_destroy1(rec);
    bam_hdr_destroy(hdr);
    sam_close(fp);
    return 0;
}
