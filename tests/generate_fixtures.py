#!/usr/bin/env python
"""Regenerate the reference-binary golden fixtures in tests/fixtures/.

Each harness in tools/golden/ compiles the reference suite's OWN plaintext
kernels (from the read-only checkout at /root/reference) against the
plaintext HE stub in tools/golden/stub/, runs them on small seeded random
inputs, and records the outputs as committed JSON fixtures.  The fixtures
— not the harness binaries — are what the test suite consumes, so this
script only needs to run when adding cases or bumping a harness.

Build technique: the reference files use relative includes
("../../../palisade_header.h"), so we lay out a per-file SYMLINK FARM in a
temp dir whose root holds the plaintext stub; `..` traversal stays inside
the farm because every directory is real (only files are symlinks).

Usage: python tests/generate_fixtures.py [fmi kmer poa abea pileup dbg ...]
(no args = all).
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import tempfile

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = pathlib.Path(os.environ.get("GENOMICSBENCH_REF", "/root/reference"))
GOLDEN = REPO / "tools" / "golden"
STUB = GOLDEN / "stub"
FIXTURES = REPO / "tests" / "fixtures"

CXX = os.environ.get("CXX", "g++")
# NO -march=native here: FP-sensitive kernels (abea) must match the
# reference Makefiles' plain -O2 builds (no FMA contraction); integer
# kernels opt into -march=native via extra_flags
BASE_FLAGS = [
    "-O2", "-std=c++17", "-w",
    "-include", str(STUB / "golden_preinclude.h"),
    f"-I{STUB}",
]


def make_farm(tmp: pathlib.Path, rel_dirs: list[str],
              stub_local: list[str] = ()) -> pathlib.Path:
    """Create the symlink farm: real directories, per-file symlinks, with
    the plaintext stub as the farm-root palisade_header.h.  Directories in
    stub_local carry their own palisade_header copy — replace it with the
    stub there too."""
    farm = tmp / "farm"
    farm.mkdir(parents=True, exist_ok=True)
    (farm / "palisade_header.h").symlink_to(STUB / "palisade_header.h")
    for rel in rel_dirs:
        d = farm / rel
        d.mkdir(parents=True, exist_ok=True)
        for f in sorted((REF / rel).iterdir()):
            if f.is_file() and not (
                    rel in stub_local
                    and f.name in ("palisade_header.h",
                                   "palisade_header.cpp")):
                (d / f.name).symlink_to(f)
        if rel in stub_local:
            (d / "palisade_header.h").symlink_to(STUB / "palisade_header.h")
    return farm


def build(tmp: pathlib.Path, out: str, sources: list[str],
          include_dirs: list[str] | None = None,
          extra_flags: list[str] | None = None,
          libs: list[str] | None = None) -> pathlib.Path:
    exe = tmp / out
    cmd = [CXX, *BASE_FLAGS, *(extra_flags or [])]
    for inc in include_dirs or []:
        cmd.append(f"-I{inc}")
    cmd += [*sources, "-o", str(exe), *(libs or ["-lz"])]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return exe


def _rand_dna(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def _mutate(rng, s, n_mut):
    s = list(s)
    for _ in range(n_mut):
        p = int(rng.integers(0, len(s)))
        s[p] = "ACGT"[int(rng.integers(0, 4))]
    return "".join(s)


# --------------------------------------------------------------------------
# fmi: FMI_search 3-phase SMEM seeding (fmi.cpp:241-345 orchestration)
# --------------------------------------------------------------------------

def gen_fmi(n_cases: int = 25) -> None:
    with tempfile.TemporaryDirectory() as td:
        tmp = pathlib.Path(td)
        farm = make_farm(tmp, ["tools/bwa-mem2/src"])
        src = farm / "tools/bwa-mem2/src"
        exe = build(
            tmp, "fmi_golden",
            [str(GOLDEN / "fmi_harness.cpp"),
             str(src / "FMI_search.cpp"), str(src / "utils.cpp"),
             str(src / "read_index_ele.cpp"), str(src / "bntseq.cpp"),
             str(src / "memcpy_bwamem.cpp")],
            include_dirs=[str(src)],
            extra_flags=["-march=native"],
        )
        cases = []
        rng = np.random.default_rng(20260817)
        for ci in range(n_cases):
            glen = int(rng.integers(800, 8000))
            seq = _rand_dna(rng, glen)
            n_reads = int(rng.integers(4, 33))
            reads = []
            for _ in range(n_reads):
                kind = rng.random()
                n = int(rng.integers(24, min(152, glen)))
                if kind < 0.75:  # genomic substring with mutations
                    s = int(rng.integers(0, glen - n))
                    reads.append(_mutate(rng, seq[s:s + n],
                                         int(rng.integers(0, 4))))
                elif kind < 0.9:  # reverse complement
                    s = int(rng.integers(0, glen - n))
                    rc = seq[s:s + n].translate(str.maketrans("ACGT", "TGCA"))
                    reads.append(rc[::-1])
                else:  # random (mostly misses)
                    reads.append(_rand_dna(rng, n))
            batch = int(rng.choice([4, 8, 16, 32]))
            min_seed = int(rng.choice([10, 15, 19, 19, 25]))
            run = tmp / f"case{ci}"
            run.mkdir()
            (run / "seq.txt").write_text(seq + "\n")
            (run / "reads.txt").write_text("\n".join(reads) + "\n")
            out = subprocess.run(
                [str(exe), str(run / "ref"), str(run / "seq.txt"),
                 str(run / "reads.txt"), str(batch), str(min_seed)],
                check=True, capture_output=True, text=True).stdout
            idx_line = hcp = hsa = None
            batches, smems, total = [], [], None
            for line in out.splitlines():
                parts = line.split()
                if not parts:
                    continue
                if parts[0] == "IDX":
                    idx_line = [int(x) for x in parts[1:]]
                elif parts[0] == "HCP":
                    hcp, hsa = parts[1], parts[3]
                elif parts[0] == "B":
                    batches.append([int(x) for x in parts[2:]])
                elif parts[0] == "S":
                    smems.append([int(x) for x in parts[1:]])
                elif parts[0] == "TOTAL":
                    total = int(parts[1])
            assert idx_line is not None and total == len(smems)
            cases.append(dict(
                seq=seq, reads=reads, batch=batch, min_seed_len=min_seed,
                ref_len=idx_line[0], count=idx_line[1:6],
                sentinel_index=idx_line[6], hash_cp=hcp, hash_sa=hsa,
                batch_counts=batches, smems=smems, total=total,
            ))
        out_path = FIXTURES / "fmi_golden.json"
        out_path.write_text(json.dumps(
            dict(generator="tools/golden/fmi_harness.cpp",
                 reference="tools/bwa-mem2/src/FMI_search.cpp (plaintext "
                           "semantics, HE stub)",
                 cases=cases)))
        print(f"fmi: wrote {len(cases)} cases, "
              f"{sum(c['total'] for c in cases)} SMEMs -> {out_path}")


# --------------------------------------------------------------------------
# kmer-cnt: Flye KmerCounter flat-CAS + cuckoo spill
# (vertex_index.cpp:515-659)
# --------------------------------------------------------------------------

def gen_kmer(n_cases: int = 25) -> None:
    with tempfile.TemporaryDirectory() as td:
        tmp = pathlib.Path(td)
        farm = make_farm(tmp, ["benchmarks/kmer-cnt",
                               "benchmarks/kmer-cnt/libcuckoo"],
                         stub_local=["benchmarks/kmer-cnt"])
        src = farm / "benchmarks/kmer-cnt"
        exe = build(
            tmp, "kmer_golden",
            [str(GOLDEN / "kmer_harness.cpp"),
             str(src / "vertex_index.cpp"),
             str(src / "sequence_container.cpp"), str(src / "sequence.cpp")],
            include_dirs=[str(src), str(src / "libcuckoo")],
            extra_flags=["-pthread", "-march=native"],
            libs=["-lz", "-lpthread"],
        )
        cases = []
        rng = np.random.default_rng(20260818)
        for ci in range(n_cases):
            k = int(rng.choice([11, 13, 15, 17]))
            min_rl = int(rng.choice([0, 50, 100, 150]))
            n_reads = int(rng.integers(3, 16))
            reads = []
            unit = _rand_dna(rng, int(rng.integers(20, 40)))
            for _ in range(n_reads):
                kind = rng.random()
                if kind < 0.3:  # tandem repeats drive counts past 15
                    reads.append(unit * int(rng.integers(4, 20)))
                elif kind < 0.4:  # boundary-length read (filter edge)
                    reads.append(_rand_dna(rng, min_rl) if min_rl else
                                 _rand_dna(rng, int(rng.integers(30, 60))))
                else:
                    reads.append(_rand_dna(rng, int(rng.integers(60, 500))))
            fa = tmp / f"case{ci}.fa"
            fa.write_text("".join(f">r{i}\n{s}\n"
                                  for i, s in enumerate(reads)))
            out = subprocess.run(
                [str(exe), str(fa), str(k), str(min_rl)],
                check=True, capture_output=True, text=True).stdout
            total = hashsz = None
            freqs = {}
            for line in out.splitlines():
                parts = line.split()
                if not parts:
                    continue
                if parts[0] == "TOTAL":
                    total, hashsz = int(parts[1]), int(parts[3])
                elif parts[0] == "K":
                    freqs[parts[1]] = int(parts[2])
            assert total is not None
            cases.append(dict(reads=reads, k=k, min_read_length=min_rl,
                              total_kmers=total, hash_size=hashsz,
                              freqs=freqs))
        out_path = FIXTURES / "kmer_golden.json"
        out_path.write_text(json.dumps(
            dict(generator="tools/golden/kmer_harness.cpp",
                 reference="benchmarks/kmer-cnt/vertex_index.cpp "
                           "KmerCounter::count (plaintext semantics)",
                 cases=cases)))
        print(f"kmer: wrote {len(cases)} cases, "
              f"{sum(len(c['freqs']) for c in cases)} distinct kmers "
              f"-> {out_path}")


# --------------------------------------------------------------------------
# poa: spoa graph + convex-NW SISD engine + consensus
# (msa_spoa_omp.cpp:352-460, tools/spoa)
# --------------------------------------------------------------------------

def gen_poa(n_cases: int = 25) -> None:
    with tempfile.TemporaryDirectory() as td:
        tmp = pathlib.Path(td)
        farm = make_farm(tmp, ["tools/spoa/src", "tools/spoa/include/spoa"])
        src = farm / "tools/spoa/src"
        exe = build(
            tmp, "poa_golden",
            [str(GOLDEN / "poa_harness.cpp"),
             str(src / "alignment_engine.cpp"),
             str(src / "sisd_alignment_engine.cpp"),
             str(src / "graph.cpp"), str(src / "sequence.cpp")],
            include_dirs=[str(farm / "tools/spoa/include"), str(src)],
            extra_flags=["-march=native"], libs=[],
        )
        cases = []
        rng = np.random.default_rng(20260819)
        for ci in range(n_cases):
            n_batches = int(rng.integers(1, 4))
            batches = []
            for _ in range(n_batches):
                base = _rand_dna(rng, int(rng.integers(30, 400)))
                seqs = []
                for _ in range(int(rng.integers(2, 10))):
                    s = list(base)
                    for _ in range(int(rng.integers(0, max(2, len(base) // 12)))):
                        p = int(rng.integers(0, len(s)))
                        op = rng.random()
                        if op < 0.5:
                            s[p] = "ACGT"[int(rng.integers(0, 4))]
                        elif op < 0.75:
                            s.insert(p, "ACGT"[int(rng.integers(0, 4))])
                        elif len(s) > 10:
                            del s[p]
                    seqs.append("".join(s))
                batches.append(seqs)
            fa = tmp / f"case{ci}.fa"
            with open(fa, "w") as f:
                for bi, seqs in enumerate(batches):
                    for si, s in enumerate(seqs):
                        f.write(f">{0 if si == 0 else 1}_{bi}_{si}\n{s}\n")
            out = subprocess.run([str(exe), str(fa)], check=True,
                                 capture_output=True, text=True).stdout
            consensus = {}
            for line in out.splitlines():
                if line.startswith("C "):
                    _, bid, cons = line.split(None, 2)
                    consensus[int(bid)] = cons
            assert len(consensus) == len(batches)
            cases.append(dict(batches=batches,
                              consensus=[consensus[i]
                                         for i in range(len(batches))]))
        out_path = FIXTURES / "poa_golden.json"
        out_path.write_text(json.dumps(
            dict(generator="tools/golden/poa_harness.cpp",
                 reference="tools/spoa sisd_alignment_engine + graph "
                           "(kNW convex, driver scores)",
                 cases=cases)))
        print(f"poa: wrote {len(cases)} cases, "
              f"{sum(len(c['batches']) for c in cases)} windows -> {out_path}")


def gen_poa_swov(n_cases: int = 10) -> None:
    """kSW / kOV alignment-type goldens (alignment_engine.hpp:19-24).

    The benchmark driver hardcodes kNW (msa_spoa_omp.cpp:264); these pin
    the spoa library's remaining AlignmentType capability surface at the
    ALIGNMENT level (AL lines: exact (node_id, seq_pos) pair lists) plus
    the consensus grown from those alignments."""
    with tempfile.TemporaryDirectory() as td:
        tmp = pathlib.Path(td)
        farm = make_farm(tmp, ["tools/spoa/src", "tools/spoa/include/spoa"])
        src = farm / "tools/spoa/src"
        exe = build(
            tmp, "poa_golden",
            [str(GOLDEN / "poa_harness.cpp"),
             str(src / "alignment_engine.cpp"),
             str(src / "sisd_alignment_engine.cpp"),
             str(src / "graph.cpp"), str(src / "sequence.cpp")],
            include_dirs=[str(farm / "tools/spoa/include"), str(src)],
            extra_flags=["-march=native"], libs=[],
        )
        cases = []
        rng = np.random.default_rng(20260820)
        for ci in range(n_cases):
            base = _rand_dna(rng, int(rng.integers(30, 250)))
            seqs = []
            for si in range(int(rng.integers(2, 8))):
                s = list(base)
                for _ in range(int(rng.integers(0, max(2, len(base) // 10)))):
                    p = int(rng.integers(0, len(s)))
                    op = rng.random()
                    if op < 0.5:
                        s[p] = "ACGT"[int(rng.integers(0, 4))]
                    elif op < 0.75:
                        s.insert(p, "ACGT"[int(rng.integers(0, 4))])
                    elif len(s) > 10:
                        del s[p]
                # sw/ov differ from nw most when ends are clipped/extended
                if rng.random() < 0.5:
                    pre = _rand_dna(rng, int(rng.integers(1, 20)))
                    suf = _rand_dna(rng, int(rng.integers(1, 20)))
                    s = list(pre) + s + list(suf)
                seqs.append("".join(s))
            fa = tmp / f"case{ci}.fa"
            fa.write_text("".join(
                f">{0 if si == 0 else 1}_0_{si}\n{s}\n"
                for si, s in enumerate(seqs)))
            per_type = {}
            for t in ("sw", "ov"):
                out = subprocess.run([str(exe), str(fa), t], check=True,
                                     capture_output=True, text=True).stdout
                alns, cons = [], None
                for line in out.splitlines():
                    if line.startswith("AL "):
                        parts = line.split()
                        pairs = [[int(v) for v in pr.split(",")]
                                 for pr in parts[4:]]
                        assert len(pairs) == int(parts[3])
                        alns.append(pairs)
                    elif line.startswith("C "):
                        cons = line.split(None, 2)[2] if len(
                            line.split(None, 2)) > 2 else ""
                per_type[t] = dict(alignments=alns, consensus=cons)
            cases.append(dict(seqs=seqs, sw=per_type["sw"],
                              ov=per_type["ov"]))
        out_path = FIXTURES / "poa_swov_golden.json"
        out_path.write_text(json.dumps(
            dict(generator="tools/golden/poa_harness.cpp [sw|ov]",
                 reference="tools/spoa sisd_alignment_engine kSW/kOV "
                           "convex (driver scores)",
                 cases=cases)))
        print(f"poa_swov: wrote {len(cases)} cases -> {out_path}")


# --------------------------------------------------------------------------
# abea: f5c event detection + scaling + adaptive banded event alignment
# (benchmarks/abea/src/{events.c,align.c})
# --------------------------------------------------------------------------

def _pore_levels():
    """Deterministic synthetic 6-mer levels (matches the fixture runs)."""
    import itertools
    kmers = ["".join(p) for p in itertools.product("ACGT", repeat=6)]
    return {km: 60.0 + 80.0 * ((i * 2654435761) % 4096) / 4096.0
            for i, km in enumerate(kmers)}


def gen_abea(n_cases: int = 25) -> None:
    with tempfile.TemporaryDirectory() as td:
        tmp = pathlib.Path(td)
        farm = make_farm(tmp, ["benchmarks/abea/src"])
        src = farm / "benchmarks/abea/src"
        exe = build(
            tmp, "abea_golden",
            [str(GOLDEN / "abea_harness.cpp"), str(src / "align.c"),
             str(src / "events.c")],
            include_dirs=[str(src), str(REF / "tools/htslib")],
            # float-exact kernel: mirror the reference's plain -O2 build
            # (benchmarks/abea/Makefile:44 — no -march, no FMA contraction)
            extra_flags=["-ffp-contract=off"], libs=["-lm"],
        )
        levels = _pore_levels()
        model_tsv = tmp / "pore.tsv"
        with open(model_tsv, "w") as f:
            f.write("kmer\tlevel_mean\tlevel_stdv\n")
            for km, mean in levels.items():
                f.write(f"{km}\t{mean:.2f}\t1.50\n")
        cases = []
        rng = np.random.default_rng(20260820)
        for ci in range(n_cases):
            seq = _rand_dna(rng, int(rng.integers(80, 600)))
            sig = []
            for i in range(len(seq) - 5):
                lv = levels[seq[i : i + 6]]
                n = int(rng.integers(3, 14))
                noise = 0.8 if rng.random() < 0.8 else 6.0  # some QC-fail reads
                sig.extend(lv + rng.normal(0, noise, n))
            sig = np.asarray(sig, np.float32)
            case_txt = tmp / f"case{ci}.txt"
            with open(case_txt, "w") as f:
                f.write(seq + "\n")
                f.write(str(len(sig)) + " "
                        + " ".join(f"{x:.6f}" for x in sig) + "\n")
            out = subprocess.run(
                [str(exe), str(model_tsv), str(case_txt)],
                check=True, capture_output=True, text=True).stdout
            events, pairs, sc = [], [], None
            n_events = n_pairs = None
            for line in out.splitlines():
                parts = line.split()
                if not parts:
                    continue
                if parts[0] == "R":
                    n_events = int(parts[2])
                elif parts[0] == "EV":
                    events.append([int(parts[1]), parts[2], parts[3],
                                   parts[4]])
                elif parts[0] == "SC":
                    sc = [parts[1], parts[2]]
                elif parts[0] == "N":
                    n_pairs = int(parts[1])
                elif parts[0] == "A":
                    pairs.append([int(parts[1]), int(parts[2])])
            assert n_events == len(events) and n_pairs == len(pairs)
            cases.append(dict(
                seq=seq, signal=[f"{x:.6f}" for x in sig.tolist()],
                events=events, scale=sc[0], shift=sc[1], pairs=pairs))
        out_path = FIXTURES / "abea_golden.json"
        out_path.write_text(json.dumps(
            dict(generator="tools/golden/abea_harness.cpp",
                 reference="benchmarks/abea/src/{events.c,align.c} "
                           "(getevents, estimate_scalings_using_mom, align)",
                 cases=cases)))
        print(f"abea: wrote {len(cases)} cases, "
              f"{sum(len(c['pairs']) for c in cases)} aligned pairs "
              f"-> {out_path}")


# --------------------------------------------------------------------------
# pileup: medaka count matrices over a BAM region
# (benchmarks/pileup/medaka_counts.c)
# --------------------------------------------------------------------------

HTSLIB_CACHE = pathlib.Path("/tmp/golden_htslib_build")


def _ensure_htslib() -> pathlib.Path:
    """Out-of-tree htslib static build (bz2/curl-free) for the BAM-backed
    harnesses; cached under /tmp across generator runs."""
    if (HTSLIB_CACHE / "libhts.a").exists():
        return HTSLIB_CACHE
    import shutil
    if HTSLIB_CACHE.exists():
        shutil.rmtree(HTSLIB_CACHE)
    shutil.copytree(REF / "tools/htslib", HTSLIB_CACHE)
    (HTSLIB_CACHE / "config.h").write_text(
        "/* minimal: no bz2, no lzma, no curl */\n#define HAVE_DRAND48 1\n")
    subprocess.run(["make", "-j8", "NONCONFIGURE_OBJS=", "lib-static"],
                   cwd=HTSLIB_CACHE, check=True, capture_output=True)
    return HTSLIB_CACHE


def _build_bamidx(tmp: pathlib.Path, hts: pathlib.Path) -> pathlib.Path:
    src = tmp / "bamidx.c"
    src.write_text(
        '#include <stdio.h>\n#include "htslib/sam.h"\n'
        'int main(int argc, char** argv) {\n'
        '    if (argc != 2) return 2;\n'
        '    return sam_index_build(argv[1], 0) < 0 ? 1 : 0;\n}\n')
    exe = tmp / "bamidx"
    subprocess.run([CXX.replace("g++", "gcc"), "-O2", f"-I{hts}", str(src),
                    str(hts / "libhts.a"), "-lz", "-lm", "-lpthread", "-o",
                    str(exe)], check=True, capture_output=True)
    return exe


def _synth_bam_case(rng, ref_len):
    """Random alignments (M/I/D/S, both strands) as JSON-able dicts."""
    recs = []
    n = int(rng.integers(8, 40))
    genome = _rand_dna(rng, ref_len)
    for i in range(n):
        pos = int(rng.integers(0, max(1, ref_len - 80)))
        L = int(rng.integers(20, min(70, ref_len - pos)))
        seq = list(genome[pos : pos + L])
        cig = [["M", L]]
        r = rng.random()
        if r < 0.35 and L > 12:  # insertion
            at = int(rng.integers(4, L - 4))
            ins = _rand_dna(rng, int(rng.integers(1, 5)))
            seq = seq[:at] + list(ins) + seq[at:]
            cig = [["M", at], ["I", len(ins)], ["M", L - at]]
        elif r < 0.6 and L > 14:  # deletion
            x = int(rng.integers(4, L // 2))
            d = int(rng.integers(1, 5))
            seq = seq[:x] + seq[x + d :]
            cig = [["M", x], ["D", d], ["M", L - x - d]]
        elif r < 0.75 and L > 10:  # soft clips
            sc = int(rng.integers(1, 5))
            cig = [["S", sc], ["M", L - sc]]
        flag = 16 if rng.random() < 0.5 else 0
        qual = rng.integers(5, 50, len(seq)).tolist()
        recs.append(dict(name=f"r{i}", flag=flag, pos=pos, mapq=50,
                         cigar=cig, seq="".join(seq), qual=qual))
    recs.sort(key=lambda r: r["pos"])
    return recs


def _write_case_bam(path, ref_name, ref_len, recs):
    sys.path.insert(0, str(REPO))
    from genomicsbench_palisade_tpu.io import bam as B

    idx16 = {c: i for i, c in enumerate(B.SEQ_NT16_STR)}
    rows = [
        B.BamRecord(
            name=r["name"], flag=r["flag"], ref_id=0, pos=r["pos"],
            mapq=r["mapq"], cigar=[tuple(c) for c in r["cigar"]],
            seq_nt16=np.array([idx16[ch] for ch in r["seq"]], np.uint8),
            qual=np.array(r["qual"], np.uint8), tags={})
        for r in recs
    ]
    B.write_bam(str(path), [(ref_name, ref_len)], rows)


def gen_pileup(n_cases: int = 25) -> None:
    hts = _ensure_htslib()
    with tempfile.TemporaryDirectory() as td:
        tmp = pathlib.Path(td)
        exe = tmp / "pileup_golden"
        subprocess.run(
            [CXX.replace("g++", "gcc"), "-O3", "-std=c99", "-fopenmp", "-w",
             "-DPRINT_OUTPUT", f"-I{hts}",
             str(REF / "benchmarks/pileup/medaka_common.c"),
             str(REF / "benchmarks/pileup/medaka_counts.c"),
             str(REF / "benchmarks/pileup/medaka_bamiter.c"),
             str(hts / "libhts.a"), "-lz", "-lm", "-lpthread", "-o",
             str(exe)], check=True, capture_output=True)
        bamidx = _build_bamidx(tmp, hts)
        cases = []
        rng = np.random.default_rng(20260821)
        for ci in range(n_cases):
            ref_len = int(rng.integers(120, 1200))
            recs = _synth_bam_case(rng, ref_len)
            bam = tmp / f"case{ci}.bam"
            _write_case_bam(bam, "tig1", ref_len, recs)
            subprocess.run([str(bamidx), str(bam)], check=True)
            start = int(rng.integers(0, ref_len // 3)) + 1  # 1-based
            end = int(rng.integers(2 * ref_len // 3, ref_len))
            region = f"tig1:{start}-{end}"
            out = subprocess.run([str(exe), str(bam), region, "1"],
                                 check=True, capture_output=True,
                                 text=True).stdout
            rows, started = [], False
            for line in out.splitlines():
                if line.startswith("pos\t"):
                    started = True
                    continue
                if started:
                    p = line.strip().split("\t")
                    if len(p) >= 3 and p[0].isdigit():
                        rows.append([int(x) for x in p])
                    else:
                        started = False
            cases.append(dict(ref_len=ref_len, records=recs, region=region,
                              rows=rows))
        out_path = FIXTURES / "pileup_golden.json"
        out_path.write_text(json.dumps(
            dict(generator="tests/generate_fixtures.py gen_pileup "
                           "(reference medaka_counts + htslib, "
                           "-DPRINT_OUTPUT)",
                 reference="benchmarks/pileup/medaka_counts.c "
                           "calculate_pileup",
                 cases=cases)))
        print(f"pileup: wrote {len(cases)} cases, "
              f"{sum(len(c['rows']) for c in cases)} columns -> {out_path}")


# --------------------------------------------------------------------------
# dbg: Platypus colored de Bruijn graph build + cycle detection
# (benchmarks/dbg/debruijn.cpp)
# --------------------------------------------------------------------------

def gen_dbg(n_cases: int = 25) -> None:
    hts = _ensure_htslib()
    with tempfile.TemporaryDirectory() as td:
        tmp = pathlib.Path(td)
        farm = make_farm(tmp, ["benchmarks/dbg"],
                         stub_local=["benchmarks/dbg"])
        src = farm / "benchmarks/dbg"
        exe = tmp / "dbg_golden"
        subprocess.run(
            [CXX, "-O2", "-w", "-fopenmp", f"-I{src}", f"-I{hts}",
             str(GOLDEN / "dbg_harness.cpp"), str(src / "common.cpp"),
             str(hts / "libhts.a"), "-lz", "-lm", "-lpthread", "-o",
             str(exe)], check=True, capture_output=True)
        cases = []
        rng = np.random.default_rng(20260822)
        specs = [("random", None)] * n_cases
        # bubble-rich adversarial cases: shared SNPs carried by several
        # high-quality reads push read-only detour edges past
        # minWeight=2*minQual, so the reference's variant-path DFS finds
        # genuine k+2-node bubbles (and, in the dense tangles, explodes)
        specs += [("bubble", i) for i in range(8)]
        # corridor tangles: every read shares a non-ref 24bp anchor between
        # two private random corridors, so the DFS can enter via read i's
        # corridor and exit via read j's — n_reads^2 finished paths.
        # 4 reads -> 16 paths (rich multi-path goldens); 7 reads -> 49
        # (trips the reference's 20-cap: EXPLODED verdicts pinned too)
        specs += [("tangle", 4), ("tangle", 7)]
        # shared-entry tangle: one common corridor A fans out to 23
        # private corridor Bs — 23 finished paths from the SAME seed
        # trips the reference's finished>20 cap: EXPLODED pinned
        specs += [("tangle_shared", 23)]
        for ci, (kind, bi) in enumerate(specs):
            if kind == "random":
                ref_len = int(rng.integers(60, 600))
                ref = _rand_dna(rng, ref_len)
                min_qual = int(rng.choice([15, 20, 20, 25]))
                kmer_size = int(rng.choice([15, 15, 15, 11, 21]))
                reads = []
                for _ in range(int(rng.integers(2, 14))):
                    pos = int(rng.integers(0, max(1, ref_len - 40)))
                    L = int(rng.integers(kmer_size + 4,
                                         min(100, ref_len - pos + 20)))
                    seq = list((ref + _rand_dna(rng, 120))[pos : pos + L])
                    for _ in range(int(rng.integers(0, 4))):
                        p = int(rng.integers(0, len(seq)))
                        seq[p] = ("N" if rng.random() < 0.15 else
                                  "ACGT"[int(rng.integers(0, 4))])
                    quals = rng.integers(5, 50, len(seq)).tolist()
                    reads.append(dict(seq="".join(seq), quals=quals))
            elif kind in ("tangle", "tangle_shared"):
                min_qual = 20
                kmer_size = 15
                ref = _rand_dna(rng, 160)
                anchor = _rand_dna(rng, 24)
                shared_a = _rand_dna(rng, 8)
                reads = []
                for r in range(bi):
                    corrA = shared_a if kind == "tangle_shared" \
                        else _rand_dna(rng, 8)
                    corrB = _rand_dna(rng, 8)
                    seq = ref[:40] + corrA + anchor + corrB + ref[40:80]
                    quals = [45] * len(seq)
                    reads.append(dict(seq=seq, quals=quals))
                ref_len = len(ref)
            else:
                ref_len = int(rng.integers(140, 260))
                ref = _rand_dna(rng, ref_len)
                min_qual = 20
                kmer_size = 15
                n_snps = 1 + (bi % 3)  # 1..3 shared SNPs; 3 = dense tangle
                snps = []
                for s in range(n_snps):
                    p = int(rng.integers(40, ref_len - 40))
                    alt = "ACGT"[(("ACGT".index(ref[p])) + 1
                                  + int(rng.integers(0, 3))) % 4]
                    snps.append((p, alt))
                reads = []
                for r in range(int(rng.integers(6, 12))):
                    pos = int(rng.integers(0, 30))
                    L = min(int(rng.integers(80, 140)), ref_len - pos)
                    seq = list(ref[pos : pos + L])
                    carry = rng.random(n_snps) < 0.7
                    for (p, alt), c in zip(snps, carry):
                        if c and pos <= p < pos + L:
                            seq[p - pos] = alt
                    quals = rng.integers(25, 46, len(seq)).tolist()
                    reads.append(dict(seq="".join(seq), quals=quals))
            case_txt = tmp / f"case{ci}.txt"
            with open(case_txt, "w") as f:
                f.write(f"1000 {min_qual} {kmer_size}\n{ref}\n"
                        f"{len(reads)}\n")
                for r in reads:
                    f.write(r["seq"] + "\n")
                    f.write(" ".join(map(str, r["quals"])) + "\n")
            out = subprocess.run([str(exe), str(case_txt)], check=True,
                                 capture_output=True, text=True).stdout
            nodes, edges, cycles, seeds = {}, {}, None, []
            for line in out.splitlines():
                p = line.split()
                if p[0] == "N":
                    nodes[p[1]] = [int(p[2]), int(p[3]), float(p[4])]
                elif p[0] == "E":
                    edges[f"{p[1]}>{p[2]}"] = float(p[3])
                elif p[0] == "B":  # per-seed variant-path extraction
                    seeds.append(dict(start=p[1], succ=p[2],
                                      exploded=p[3] == "EXPLODED",
                                      paths=[]))
                elif p[0] == "b":
                    seeds[-1]["paths"].append(p[1:])
                elif p[0] == "CYCLES":
                    cycles = int(p[1])
            cases.append(dict(ref=ref, ref_start=1000, min_qual=min_qual,
                              kmer_size=kmer_size, reads=reads,
                              nodes=nodes, edges=edges, cycles=cycles,
                              seeds=seeds))
        out_path = FIXTURES / "dbg_golden.json"
        out_path.write_text(json.dumps(
            dict(generator="tools/golden/dbg_harness.cpp",
                 reference="benchmarks/dbg/debruijn.cpp graph build "
                           "(createDeBruijnGraph/loadReference/loadBAMData"
                           "/detectCycles) + per-seed variant paths "
                           "(getVariantPathsThroughGraphFromNode :1147)",
                 cases=cases)))
        print(f"dbg: wrote {len(cases)} cases, "
              f"{sum(len(c['nodes']) for c in cases)} nodes -> {out_path}")


# --------------------------------------------------------------------------
# grm: plink2 --maf + --make-grm-bin on .pgen input (scripts/run-cpu.sh:53)
# --------------------------------------------------------------------------

PLINK2_BIN = pathlib.Path(
    os.environ.get("GOLDEN_PLINK2", "/tmp/plink2_build/bin/plink2"))


def gen_grm(n_cases: int = 25) -> None:
    """Needs a plink2 binary built from benchmarks/grm/2.0 (see
    tools/golden/README.md)."""
    import base64

    assert PLINK2_BIN.exists(), (
        f"build plink2 first (make -C <copy of benchmarks/grm/2.0> plink2 "
        f"...) or set GOLDEN_PLINK2; looked at {PLINK2_BIN}")
    sys.path.insert(0, str(REPO))
    from genomicsbench_palisade_tpu.io.plink import write_bed

    cases = []
    rng = np.random.default_rng(20260823)
    with tempfile.TemporaryDirectory() as td:
        tmp = pathlib.Path(td)
        for ci in range(n_cases):
            m = int(rng.integers(40, 300))
            # plink2 --make-grm-bin refuses to impute allele freqs from
            # fewer than 50 samples
            n = int(rng.integers(50, 101))
            # mixture of frequencies incl. sub-MAF and monomorphic variants
            af = rng.choice([0.0, 0.002, 0.005, 0.009, 0.01, 0.02, 0.1,
                             0.3, 0.5], m,
                            p=[.05, .08, .08, .09, .1, .1, .2, .2, .1])
            geno = (rng.random((m, n)) < af[:, None]).astype(np.int8)
            geno += (rng.random((m, n)) < af[:, None]).astype(np.int8)
            miss = rng.random((m, n)) < 0.03
            geno[miss] = 3
            prefix = tmp / f"case{ci}"
            write_bed(str(prefix), geno)
            subprocess.run(
                [str(PLINK2_BIN), "--bfile", str(prefix), "--make-pgen",
                 "--out", str(prefix) + "_p", "--threads", "1",
                 "--memory", "1024"],
                check=True, capture_output=True)
            out = subprocess.run(
                [str(PLINK2_BIN), "--maf", "0.01",
                 "--pgen", str(prefix) + "_p.pgen",
                 "--pvar", str(prefix) + "_p.pvar",
                 "--psam", str(prefix) + "_p.psam",
                 "--make-grm-bin", "--out", str(prefix) + "_g",
                 "--threads", "1", "--memory", "1024"],
                check=True, capture_output=True, text=True)
            removed = 0
            for line in (out.stdout + out.stderr).splitlines():
                if "removed due to allele frequency threshold" in line:
                    removed = int(line.split()[0])
            grm = np.fromfile(str(prefix) + "_g.grm.bin", np.float32)
            nbin = np.fromfile(str(prefix) + "_g.grm.N.bin", np.float32)
            ids = pathlib.Path(str(prefix) + "_g.grm.id").read_text()
            cases.append(dict(
                geno=geno.tolist(),
                pgen=base64.b64encode(
                    (prefix.parent / (prefix.name + "_p.pgen")
                     ).read_bytes()).decode(),
                pvar=(prefix.parent / (prefix.name + "_p.pvar")).read_text(),
                psam=(prefix.parent / (prefix.name + "_p.psam")).read_text(),
                maf=0.01, removed=removed,
                grm_bin=[float(x) for x in grm],
                n_bin=[float(x) for x in nbin], grm_id=ids))
    out_path = FIXTURES / "grm_golden.json"
    out_path.write_text(json.dumps(
        dict(generator="tests/generate_fixtures.py gen_grm (plink2 built "
                       "from benchmarks/grm/2.0)",
             reference="plink2 --maf 0.01 --pgen/--pvar/--psam "
                       "--make-grm-bin (run-cpu.sh:53)",
             cases=cases)))
    print(f"grm: wrote {len(cases)} cases -> {out_path}")


# --------------------------------------------------------------------------
# chain at reference scale: the minimap2-acceleration scalar testbed (the
# origin of the fork's chain benchmark) on calls up to ~87k anchors
# (benchmarks/chain/src/main.cpp:100 reports n up to 87k)
# --------------------------------------------------------------------------

def _synth_chain_call(rng, n):
    """Anchors shaped like minimap2 output: colinear diagonal segments
    with jitter, segment switches, and scattered noise anchors; x
    nondecreasing."""
    xs = np.zeros(n, np.int64)
    ys = np.zeros(n, np.int64)
    x = int(rng.integers(10_000, 50_000))
    diag = int(rng.integers(-5_000, 5_000))
    i = 0
    while i < n:
        seg = int(rng.integers(50, 2_000))
        for _ in range(min(seg, n - i)):
            step = int(rng.integers(1, 60))
            x += step
            if rng.random() < 0.03:  # noise anchor off the diagonal
                y = max(0, x - diag + int(rng.integers(-30_000, 30_000)))
            else:
                y = max(0, x - diag + int(rng.integers(-40, 40)))
            xs[i] = x
            ys[i] = y
            i += 1
            if i == n:
                break
        # new chain segment: jump in x and switch diagonal
        x += int(rng.integers(0, 20_000))
        diag = int(rng.integers(-5_000, 5_000))
    return xs, ys


def gen_chain_big() -> None:
    with tempfile.TemporaryDirectory() as td:
        tmp = pathlib.Path(td)
        exe = tmp / "chain_golden"
        acc = REF / "tools/minimap2-acceleration/kernel/scalar"
        subprocess.run(
            [CXX, "-O2", "-fopenmp", "-w", f"-I{acc}/include",
             f"-I{REF}/tools/minimap2",
             *sorted(str(p) for p in (acc / "src").glob("*.cpp")),
             "-o", str(exe)], check=True, capture_output=True)
        rng = np.random.default_rng(20260824)
        sizes = [8192, 8193, 16384, 30000, 50000, 87000]
        arrays = {}
        in_txt = tmp / "calls.txt"
        with open(in_txt, "w") as f:
            for ci, n in enumerate(sizes):
                xs, ys = _synth_chain_call(rng, n)
                avg_qspan = float(np.float32(rng.uniform(18.0, 30.0)))
                f.write(f"{n} {avg_qspan:.6f} 5000 5000 500 1\n")
                for xx, yy in zip(xs, ys):
                    f.write(f"{xx} {yy}\n")
                f.write("EOR\n")
                arrays[f"x{ci}"] = xs
                arrays[f"y{ci}"] = ys
                arrays[f"qspan{ci}"] = np.float32(avg_qspan)
        out_txt = tmp / "out.txt"
        subprocess.run([str(exe), "-i", str(in_txt), "-o", str(out_txt)],
                       check=True, capture_output=True)
        with open(out_txt) as f:
            for ci in range(len(sizes)):
                n = int(f.readline())
                sc = np.zeros(n, np.int32)
                par = np.zeros(n, np.int64)
                for i in range(n):
                    a, b = f.readline().split()
                    sc[i], par[i] = int(a), int(b)
                assert f.readline().strip() == "EOR"
                arrays[f"scores{ci}"] = sc
                arrays[f"parents{ci}"] = par
        arrays["n_cases"] = np.int64(len(sizes))
        np.savez_compressed(FIXTURES / "chain_big_golden.npz", **arrays)
        print(f"chain_big: wrote {len(sizes)} cases "
              f"(n up to {max(sizes)}) -> chain_big_golden.npz")


# --------------------------------------------------------------------------
# nn-base: bonito torch checkpoint round-trip against the reference's own
# torch model (benchmarks/nn-base/bonito/basecall.py classes)
# --------------------------------------------------------------------------

def _stub(name, **attrs):
    import types

    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _bonito_weight_arrays(names_shapes, seed=20260825):
    """Deterministic weight recipe shared by generator and test: one rng
    stream over the state_dict key order."""
    rng = np.random.default_rng(seed)
    out = {}
    for name, shape in names_shapes:
        if name.endswith("num_batches_tracked"):
            out[name] = np.zeros(shape, np.int64)
        elif "running_var" in name:
            out[name] = rng.uniform(0.5, 2.0, shape).astype(np.float32)
        elif "running_mean" in name:
            out[name] = rng.normal(0, 0.3, shape).astype(np.float32)
        else:
            out[name] = rng.normal(0, 0.08, shape).astype(np.float32)
    return out


def gen_bonito() -> None:
    import importlib.util
    import tomllib

    import torch

    # basecall.py's top-level imports include GPU/IO deps absent here;
    # only the Module classes are needed
    _stub("ont_fast5_api")
    _stub("ont_fast5_api.fast5_interface", get_fast5_file=None)
    _stub("bonito_cuda_runtime", CuModel=None)
    _stub("fast_ctc_decode", beam_search=None, viterbi_search=None)
    _stub("tqdm", tqdm=lambda x, **k: x)
    _stub("scipy")
    _stub("scipy.signal", find_peaks=None)
    _stub("toml", load=lambda p: tomllib.load(open(p, "rb")))

    spec = importlib.util.spec_from_file_location(
        "ref_bonito_basecall", REF / "benchmarks/nn-base/bonito/basecall.py")
    M = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(M)

    with open(REF / "benchmarks/nn-base/models/bonito_dna_r941/config.toml",
              "rb") as f:
        config = tomllib.load(f)
    model = M.Model(config)
    model.eval()
    names_shapes = [[k, list(v.shape)] for k, v in model.state_dict().items()]
    arrays = _bonito_weight_arrays(names_shapes)
    model.load_state_dict({k: torch.tensor(v) for k, v in arrays.items()})

    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, (2, 1, 1200)).astype(np.float32)
    with torch.no_grad():
        logits = model(torch.tensor(x)).numpy()  # [B, T', C] log-softmax

    np.savez_compressed(
        FIXTURES / "bonito_golden.npz",
        input=x, logits=logits.astype(np.float32),
        names=np.array(json.dumps(names_shapes)))
    print(f"bonito: torch round-trip golden logits {logits.shape} "
          f"-> bonito_golden.npz")


# --------------------------------------------------------------------------
# nn-variant: Clair forward golden from a numpy transcription of the
# reference TF1 graph (the tf.contrib stack cannot execute under TF2)
# --------------------------------------------------------------------------

CLAIR_UNITS = 128


def _clair_var_list():
    """Ordered (name, shape) list matching the reference graph's
    variables (model.py:423-640)."""
    out = []
    for scope, n_in in (("LSTM1", 32), ("LSTM2", 256)):
        for d in ("fw", "bw"):
            base = (f"{scope}/stack_bidirectional_rnn/cell_0/"
                    f"bidirectional_rnn/{d}/cudnn_compatible_lstm_cell")
            out.append((base + "/kernel", (n_in + CLAIR_UNITS,
                                           4 * CLAIR_UNITS)))
            out.append((base + "/bias", (4 * CLAIR_UNITS,)))
    for c in range(2 * CLAIR_UNITS):
        out.append((f"L3/Unit_{c}/kernel", (33, 30)))
        out.append((f"L3/Unit_{c}/bias", (30,)))
    out.append(("L4/kernel", (30 * 256, 192)))
    out.append(("L4/bias", (192,)))
    heads = ("Y_base_change_logits", "Y_genotype_logits",
             "Y_indel_length_logits_1", "Y_indel_length_logits_2")
    outs = (21, 3, 33, 33)
    for k in range(4):
        out.append((f"L5_{k + 1}/kernel", (192, 96)))
        out.append((f"L5_{k + 1}/bias", (96,)))
    for k in range(4):
        out.append((f"Prediction/{heads[k]}/kernel", (96, outs[k])))
        out.append((f"Prediction/{heads[k]}/bias", (outs[k],)))
    return out


def _clair_variables(seed=20260826):
    rng = np.random.default_rng(seed)
    return {name: rng.normal(0, 0.08, shape).astype(np.float32)
            for name, shape in _clair_var_list()}


def _selu_np(x):
    # clair/selu.py:26-30 constants
    alpha = 1.6732632423543772848170429916717
    scale = 1.0507009873554804934193349852946
    return scale * np.where(x >= 0, x, alpha * (np.exp(np.minimum(x, 0)) - 1))


def _clair_numpy_forward(variables, x):
    """Transcription of the reference 2BiLSTM forward (model.py:423-640;
    CudnnCompatibleLSTMCell == LSTMBlockCell with forget_bias=0 and fused
    gate order (i, c, f, o))."""
    u = CLAIR_UNITS
    b = x.shape[0]
    h = x.reshape(b, 33, 32).astype(np.float64)

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    def lstm_dir(seq, kernel, bias):
        hh = np.zeros((b, u))
        cc = np.zeros((b, u))
        outs = []
        for t in range(seq.shape[1]):
            z = np.concatenate([seq[:, t, :], hh], 1) @ kernel + bias
            gi = sigmoid(z[:, :u])
            gg = np.tanh(z[:, u : 2 * u])
            gf = sigmoid(z[:, 2 * u : 3 * u])  # forget_bias = 0
            go = sigmoid(z[:, 3 * u :])
            cc = gf * cc + gi * gg
            hh = go * np.tanh(cc)
            outs.append(hh)
        return np.stack(outs, 1)

    def bilstm(seq, scope):
        base = (f"{scope}/stack_bidirectional_rnn/cell_0/"
                f"bidirectional_rnn/%s/cudnn_compatible_lstm_cell")
        fw = lstm_dir(seq, variables[base % "fw" + "/kernel"],
                      variables[base % "fw" + "/bias"])
        bw = lstm_dir(seq[:, ::-1, :], variables[base % "bw" + "/kernel"],
                      variables[base % "bw" + "/bias"])[:, ::-1, :]
        return np.concatenate([fw, bw], -1)

    h = bilstm(h, "LSTM1")
    h = bilstm(h, "LSTM2")  # [B, 33, 256]
    l3 = np.stack(
        [_selu_np(h[:, :, c] @ variables[f"L3/Unit_{c}/kernel"]
                  + variables[f"L3/Unit_{c}/bias"])
         for c in range(256)], axis=2)  # [B, 30, 256]
    l3f = l3.reshape(b, 30 * 256)
    l4 = _selu_np(l3f @ variables["L4/kernel"] + variables["L4/bias"])
    heads = ("Y_base_change_logits", "Y_genotype_logits",
             "Y_indel_length_logits_1", "Y_indel_length_logits_2")
    outs = []
    for k in range(4):
        l5 = _selu_np(l4 @ variables[f"L5_{k + 1}/kernel"]
                      + variables[f"L5_{k + 1}/bias"])
        logits = _selu_np(l5 @ variables[f"Prediction/{heads[k]}/kernel"]
                          + variables[f"Prediction/{heads[k]}/bias"])
        e = np.exp(logits - logits.max(-1, keepdims=True))
        outs.append(e / e.sum(-1, keepdims=True))
    return outs


def gen_clair() -> None:
    variables = _clair_variables()
    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, (3, 33, 8, 4)).astype(np.float32)
    gt21, genotype, il1, il2 = _clair_numpy_forward(variables, x)
    np.savez_compressed(
        FIXTURES / "clair_golden.npz", input=x,
        gt21=gt21.astype(np.float32), genotype=genotype.astype(np.float32),
        indel1=il1.astype(np.float32), indel2=il2.astype(np.float32))
    print("clair: transcription golden outputs -> clair_golden.npz")


# --------------------------------------------------------------------------
# eventalign: f5c eventalign-mode postprocessing — postalign + recalibration
# + QC + reference-space profile-HMM realign + TSV emit
# (benchmarks/abea/src/{align.c,eventalign.c}, f5c.c scaling_single)
# --------------------------------------------------------------------------

_RC = {"A": "T", "C": "G", "G": "C", "T": "A"}


def _sim_eventalign_read(rng, genome, min_len, max_len):
    """A read aligned to `genome` with M/I/D/S cigar; returns the FASTQ-
    strand sequence, BAM query (genome strand), cigar, pos, flag, NM."""
    glen = len(genome)
    seg_len = int(rng.integers(min_len, max_len))
    pos = int(rng.integers(0, glen - seg_len))
    ref_seg = genome[pos:pos + seg_len]
    q, cig, nm, i = [], [], 0, 0

    def push(op, n):
        if cig and cig[-1][0] == op:
            cig[-1][1] += n
        else:
            cig.append([op, n])

    while i < seg_len:
        r = rng.random()
        if r < 0.008 and seg_len - i > 10:
            dl = int(rng.integers(1, 6))
            push("D", dl)
            i += dl
            nm += dl
        elif r < 0.016:
            il = int(rng.integers(1, 6))
            q.extend("ACGT"[j] for j in rng.integers(0, 4, il))
            push("I", il)
            nm += il
        else:
            c = ref_seg[i]
            if rng.random() < 0.02:
                c2 = "ACGT"[int(rng.integers(0, 4))]
                nm += c2 != c
                c = c2
            q.append(c)
            push("M", 1)
            i += 1
    pre = int(rng.integers(0, 20))
    post = int(rng.integers(0, 20))
    query = _rand_dna(rng, pre) + "".join(q) + _rand_dna(rng, post)
    if pre:
        cig.insert(0, ["S", pre])
    if post:
        cig.append(["S", post])
    rev = bool(rng.random() < 0.5)
    fastq_read = ("".join(_RC[c] for c in reversed(query))
                  if rev else query)
    return fastq_read, query, [tuple(c) for c in cig], pos, (16 if rev else 0), nm


def gen_eventalign(n_cases: int = 25) -> None:
    hts = _ensure_htslib()
    with tempfile.TemporaryDirectory() as td:
        tmp = pathlib.Path(td)
        farm = make_farm(tmp, ["benchmarks/abea/src"])
        src = farm / "benchmarks/abea/src"
        # like gen_abea: plain -O2, no FMA contraction (FP-exact kernels);
        # BASE_FLAGS carries the stub include (declaration-only hdf5.h)
        exe = build(
            tmp, "eventalign_golden",
            [str(GOLDEN / "eventalign_harness.cpp"),
             str(src / "align.c"), str(src / "events.c"),
             str(src / "eventalign.c")],
            include_dirs=[str(src), str(hts)],
            extra_flags=["-ffp-contract=off"],
            libs=[str(hts / "libhts.a"), "-lz", "-lm", "-lpthread"],
        )
        levels = _pore_levels()
        model_tsv = tmp / "pore.tsv"
        with open(model_tsv, "w") as f:
            f.write("kmer\tlevel_mean\tlevel_stdv\n")
            for km, mean in levels.items():
                f.write(f"{km}\t{mean:.2f}\t1.50\n")
        sys.path.insert(0, str(REPO))
        from genomicsbench_palisade_tpu.io import bam as B

        idx16 = {c: i for i, c in enumerate(B.SEQ_NT16_STR)}
        cases = []
        rng = np.random.default_rng(20260823)
        for ci in range(n_cases):
            genome = _rand_dna(rng, int(rng.integers(1200, 3000)))
            n_reads = int(rng.integers(2, 4))
            reads, bam_rows = [], []
            for ri in range(n_reads):
                # mostly long enough to calibrate (>=200 M states); a few
                # short ones exercise FAILED_CALIBRATION
                short = rng.random() < 0.15
                fastq, query, cig, pos, flag, nm = _sim_eventalign_read(
                    rng, genome, 120 if short else 350, 220 if short else 700)
                # occasional filtered records (mapq / secondary / unmapped)
                mapq, fl = 60, flag
                r = rng.random()
                if r < 0.08:
                    mapq = 5
                elif r < 0.12:
                    fl |= 0x100
                elif r < 0.16:
                    fl |= 0x4
                sig = []
                for i in range(len(fastq) - 5):
                    lv = levels[fastq[i:i + 6]]
                    n = int(rng.integers(3, 14))
                    noise = 0.8 if rng.random() < 0.92 else 6.0
                    sig.extend(lv + rng.normal(0, noise, n))
                sig = np.asarray(sig, np.float32)
                qname = f"er{ci}_{ri}"
                reads.append(dict(
                    qname=qname, fastq=fastq, query=query,
                    cigar=[list(c) for c in cig], pos=pos, flag=fl,
                    mapq=mapq, nm=nm,
                    signal=[f"{x:.6f}" for x in sig.tolist()]))
                bam_rows.append(B.BamRecord(
                    name=qname, flag=fl, ref_id=0, pos=pos, mapq=mapq,
                    cigar=cig,
                    seq_nt16=np.array([idx16[ch] for ch in query], np.uint8),
                    qual=np.full(len(query), 30, np.uint8),
                    tags={"NM": nm}))
            bam_rows.sort(key=lambda r: r.pos)
            bam = tmp / f"case{ci}.bam"
            B.write_bam(str(bam), [("ctg1", len(genome))], bam_rows)
            case_txt = tmp / f"case{ci}.txt"
            with open(case_txt, "w") as f:
                f.write(genome + "\n")
                f.write(f"{len(reads)}\n")
                for rd in reads:
                    f.write(rd["qname"] + "\n" + rd["fastq"] + "\n")
                    f.write(str(len(rd["signal"])) + " "
                            + " ".join(rd["signal"]) + "\n")
            out = subprocess.run(
                [str(exe), str(model_tsv), str(case_txt), str(bam)],
                check=True, capture_output=True, text=True).stdout
            results, cur = [], None
            for line in out.splitlines():
                if line.startswith("READ "):
                    _, ridx, qname, status = line.split()
                    cur = dict(read_idx=int(ridx), qname=qname,
                               status=int(status), tsv=[])
                    results.append(cur)
                elif line.startswith("SCALE "):
                    cur["scale"] = line.split()[1:]
                elif line.startswith("SUMMARY "):
                    cur["summary"] = line.split()[1:]
                elif line.startswith("TSV "):
                    cur["tsv"].append(line[4:])
            cases.append(dict(genome=genome, reads=reads, results=results))
        out_path = FIXTURES / "eventalign_golden.json"
        out_path.write_text(json.dumps(
            dict(generator="tools/golden/eventalign_harness.cpp",
                 reference="benchmarks/abea/src/align.c postalign/"
                           "recalibrate_model + eventalign.c realign_read/"
                           "profile_hmm_align/emit_event_alignment_tsv + "
                           "f5c.c scaling_single QC",
                 cases=cases)))
        n_tsv = sum(len(r["tsv"]) for c in cases for r in c["results"])
        print(f"eventalign: wrote {len(cases)} cases, {n_tsv} TSV rows "
              f"-> {out_path}")


GENERATORS = {
    "bonito": gen_bonito,
    "eventalign": gen_eventalign,
    "clair": gen_clair,
    "chain_big": gen_chain_big,
    "fmi": gen_fmi,
    "kmer": gen_kmer,
    "poa": gen_poa,
    "poa_swov": gen_poa_swov,
    "abea": gen_abea,
    "pileup": gen_pileup,
    "dbg": gen_dbg,
    "grm": gen_grm,
}


def main(argv):
    names = argv or sorted(GENERATORS)
    for name in names:
        GENERATORS[name]()


if __name__ == "__main__":
    main(sys.argv[1:])
