"""Same-VM reference-binary perf baselines -> REF_BASELINE.json.

"Matching-or-beating on perf" needs reference numbers measured on THIS
machine, not the repo's HE-mode logs (1000x-slowed non-targets).  This
tool builds the reference suite's own plaintext kernels (the golden-
harness build recipes: tools/golden + tests/generate_fixtures.py symlink
farm) and times them at the committed scale-artifact shapes, then runs
or cites the framework's number for the same workload — back-to-back in
one invocation wherever both sides run on the host, because this VM's
wall clock swings +/-25% across minutes (CLAUDE.md).

Reference binaries timed:
  poa    spoa SISD convex-NW driver loop   (sisd_alignment_engine.cpp:659)
  bsw    scalarBandedSWA + AVX2 16-lane    (bandedSWA.cpp:130, :1447)
  chain  minimap2-accel scalar testbed     (kernel/scalar/src/host_kernel.cpp)
  kmer   Flye KmerCounter                  (vertex_index.cpp:515-659)
  phmm   GKL AVX PairHMM                   (IntelPairHmmCSource.cpp:61)
  abea   f5c event align banded fill       (align.c:169-548)

Usage:
  python tools/ref_baseline.py poa bsw chain kmer phmm abea   # or subset
  python tools/ref_baseline.py --all
Entries are upserted by (kernel, variant) into REF_BASELINE.json.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import re
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
REF = pathlib.Path(os.environ.get("GENOMICSBENCH_REF", "/root/reference"))
GOLDEN = REPO / "tools" / "golden"
BUILD = pathlib.Path("/tmp/ref_bl")
OUT = REPO / "REF_BASELINE.json"

sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
sys.path.insert(0, str(REPO / "tests"))


def _upsert(entry: dict) -> None:
    hist = json.loads(OUT.read_text()) if OUT.exists() else []
    hist = [e for e in hist
            if (e["kernel"], e.get("variant")) != (entry["kernel"],
                                                   entry.get("variant"))]
    hist.append(entry)
    hist.sort(key=lambda e: (e["kernel"], e.get("variant") or ""))
    OUT.write_text(json.dumps(hist, indent=1))
    print(json.dumps(entry))


def _verdict(ours: float, ref: float) -> str:
    r = ours / ref
    if r >= 1.05:
        return f"win {r:.2f}x"
    if r >= 0.95:
        return f"tie {r:.2f}x"
    return f"LOSE {r:.2f}x"


def _run(cmd, **kw):
    return subprocess.run(cmd, check=True, capture_output=True, text=True,
                          **kw)


# ---------------------------------------------------------------- poa ----
def bench_poa() -> None:
    from generate_fixtures import build, make_farm
    from poa_scale_bench import synth_windows

    from genomicsbench_palisade_tpu.ops.poa import msa_consensus_host

    BUILD.mkdir(exist_ok=True)
    exe = BUILD / "poa_bench"
    if not exe.exists():
        with tempfile.TemporaryDirectory() as td:
            tmp = pathlib.Path(td)
            farm = make_farm(tmp, ["tools/spoa/src", "tools/spoa/include/spoa"])
            src = farm / "tools/spoa/src"
            built = build(
                tmp, "poa_bench",
                [str(GOLDEN / "poa_bench_harness.cpp"),
                 str(src / "alignment_engine.cpp"),
                 str(src / "sisd_alignment_engine.cpp"),
                 str(src / "graph.cpp"), str(src / "sequence.cpp")],
                include_dirs=[str(farm / "tools/spoa/include"), str(src)],
                extra_flags=["-march=native"], libs=[],
            )
            shutil.copy2(built, exe)

    rng = np.random.default_rng(23)  # the POA_SCALE workload, exactly
    batches = synth_windows(rng, 64, 10, 750)
    fa = BUILD / "poa_scale.fa"
    with open(fa, "w") as f:
        for seqs in batches:
            for si, s in enumerate(seqs):
                f.write(f">{0 if si == 0 else 1}\n{s}\n")

    out = _run([str(exe), str(fa), "3"]).stdout
    m = re.search(r"seqs_per_s=([\d.]+)", out)
    ref_rate = float(m.group(1))

    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        cons = msa_consensus_host(batches)
        best = min(best, time.perf_counter() - t0)
    assert cons is not None, "native lib not built"
    ours = 640 / best
    _upsert({
        "kernel": "poa", "variant": "sisd_knw",
        "shape": "64 windows x 10 x 750 bp (POA_SCALE workload, rng 23)",
        "ref_binary": "spoa SISD convex-NW driver loop "
                      "(tools/spoa/src/sisd_alignment_engine.cpp:659-907 "
                      "via tools/golden/poa_bench_harness.cpp, "
                      "-O2 -march=native)",
        "ref_value": round(ref_rate, 1), "unit": "seqs/s", "reps": 3,
        "ours_value": round(ours, 1),
        "ours_engine": "native host convex-align (native/poaalign.cpp), "
                       "measured back-to-back this run",
        "verdict": _verdict(ours, ref_rate),
    })


# ---------------------------------------------------------------- bsw ----
def bench_bsw() -> None:
    BUILD.mkdir(exist_ok=True)
    exe = BUILD / "bsw_bench"
    if not exe.exists():
        _run(["g++", "-O2", "-std=c++17", "-w", "-mavx2",
              f"-I{REF}/tools/bwa-mem2/src",
              str(GOLDEN / "bsw_bench_harness.cpp"),
              f"{REF}/tools/bwa-mem2/src/bandedSWA.cpp",
              "-o", str(exe)])
    pairs = pathlib.Path("/tmp/bsw_scale/pairs_10606460.txt")
    if not pairs.exists():
        from bsw_scale_bench import write_pairs
        pairs = BUILD / "pairs_100k.txt"
        if not pairs.exists():
            write_pairs(pairs, 100_000, np.random.default_rng(20260823))

    ours_entry = json.loads((REPO / "BSW_SCALE.json").read_text())[-1]
    ours = float(ours_entry["pairs_per_s"])
    sums = {}
    for variant, reps in (("scalar", 3), ("avx2", 4)):
        out = _run([str(exe), str(pairs), variant, "100000",
                    str(reps)]).stdout
        rate = float(re.search(r"pairs_per_s=([\d.]+)", out).group(1))
        sums[variant] = int(re.search(r"sum_score=(\d+)", out).group(1))
        _upsert({
            "kernel": "bsw", "variant": variant,
            "shape": "100k pairs of the BSW_SCALE input "
                     "(q 96-151 / t 192-256, 8% divergence)",
            "ref_binary": ("scalarBandedSWA (bandedSWA.cpp:130-251)"
                           if variant == "scalar" else
                           "getScores16 -> smithWaterman256_16 16-lane "
                           "AVX2 (bandedSWA.cpp:1153,1447) — the "
                           "reference driver's production path")
                          + " [tools/bwa-mem2/src HE-free copy, "
                            "-O2 -mavx2]",
            "ref_value": round(rate, 1), "unit": "pairs/s", "reps": reps,
            "ours_value": round(ours, 1),
            "ours_engine": "device pallas engine end-to-end at 10.6M "
                           "pairs incl. wire (BSW_SCALE.json; "
                           "kernel-only 1.09M pairs/s)",
            "verdict": _verdict(ours, rate),
        })
    assert sums["scalar"] == sums["avx2"], \
        f"reference scalar/avx2 disagree: {sums}"


# -------------------------------------------------------------- chain ----
def bench_chain() -> None:
    BUILD.mkdir(exist_ok=True)
    exe = BUILD / "chain_bench"
    if not exe.exists():
        _run(["g++", "-O2", "-w", "-fopenmp",
              f"-I{REF}/tools/minimap2-acceleration/kernel/scalar/include",
              f"-I{REF}/tools/minimap2"]
             + sorted(str(p) for p in
                      (REF / "tools/minimap2-acceleration/kernel/scalar/src"
                       ).glob("*.cpp"))
             + ["-o", str(exe)])
    calls = pathlib.Path("/tmp/chain_scale/calls.txt")
    if not calls.exists():
        raise SystemExit("run tools/chain_scale_bench.py first "
                         "(writes /tmp/chain_scale/calls.txt)")
    ours_entry = json.loads((REPO / "CHAIN_SCALE.json").read_text())[-1]
    anchors = int(ours_entry["total_anchors"])
    best = 1e30
    env = dict(os.environ, OMP_NUM_THREADS="1")
    for _ in range(3):
        out = subprocess.run(
            [str(exe), "-i", str(calls), "-o", "/dev/null", "-t", "1"],
            check=True, capture_output=True, text=True, env=env).stderr
        best = min(best, float(
            re.search(r"Time in kernel: ([\d.]+) sec", out).group(1)))
    ref_rate = anchors / best
    ours = float(ours_entry["anchors_per_s"])
    _upsert({
        "kernel": "chain", "variant": "scalar_testbed",
        "shape": f"{anchors} anchors / 1001 calls "
                 "(the CHAIN_SCALE input, /tmp/chain_scale/calls.txt)",
        "ref_binary": "minimap2-acceleration scalar testbed chain_dp "
                      "(tools/minimap2-acceleration/kernel/scalar, "
                      "-O2, 1 thread; the origin of the fork's chain "
                      "benchmark)",
        "ref_value": round(ref_rate, 1), "unit": "anchors/s", "reps": 3,
        "ours_value": round(ours, 1),
        "ours_engine": "pallas ring-carry kernel end-to-end incl. "
                       "delta wire (CHAIN_SCALE.json)",
        "verdict": _verdict(ours, ref_rate),
    })


# --------------------------------------------------------------- kmer ----
def bench_kmer() -> None:
    """Flye KmerCounter (countKmers only — the reference's own Kernel
    time bracket, kmer_cnt.cpp:252-287) vs our native host engine on
    the SAME reads, back-to-back.  12 Mbp at the KMER_SCALE coverage
    regime (40x over one genome, 10 kb reads) — the reference counter
    runs ~0.15 Mbases/s, so full KMER_SCALE (1.06 Gbp) would be ~2 h."""
    from generate_fixtures import build, make_farm
    from kmer_scale_bench import synth_reads

    from genomicsbench_palisade_tpu.ops.kmer import count_kmers_host

    BUILD.mkdir(exist_ok=True)
    exe = BUILD / "kmer_bench"
    if not exe.exists():
        with tempfile.TemporaryDirectory() as td:
            tmp = pathlib.Path(td)
            farm = make_farm(tmp, ["benchmarks/kmer-cnt",
                                   "benchmarks/kmer-cnt/libcuckoo"],
                             stub_local=["benchmarks/kmer-cnt"])
            src = farm / "benchmarks/kmer-cnt"
            built = build(
                tmp, "kmer_bench",
                [str(GOLDEN / "kmer_bench_harness.cpp"),
                 str(src / "vertex_index.cpp"),
                 str(src / "sequence_container.cpp"),
                 str(src / "sequence.cpp")],
                include_dirs=[str(src), str(src / "libcuckoo")],
                extra_flags=["-pthread", "-march=native"],
                libs=["-lz", "-lpthread"],
            )
            shutil.copy2(built, exe)

    bases = 12_000_000
    rng = np.random.default_rng(20260825)
    # 1 Mbp genome = 12x coverage (closest synth_reads granularity to
    # KMER_SCALE's 42x; same hash/flat split shape)
    reads = synth_reads(rng, bases, read_len=10_000, genome_mbp=1)
    fa = BUILD / "kmer_12mbp.fa"
    if not fa.exists():
        with open(fa, "w") as f:
            for i, r in enumerate(reads):
                f.write(f">r{i}\n")
                f.write("".join("ACGT"[c] for c in r) + "\n")
    out = _run([str(exe), str(fa), "17", "5000", "2"]).stdout
    m = re.search(
        r"bases=(\d+) best_s=([\d.]+) mbases_per_s=([\d.]+) "
        r"total=(\d+) hash=(\d+)", out)
    ref_rate = float(m.group(3))
    ref_total, ref_hash = int(m.group(4)), int(m.group(5))

    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        got = count_kmers_host(reads)
        best = min(best, time.perf_counter() - t0)
    assert got is not None, "native lib not built"
    assert got["total_kmers"] == ref_total, (got, ref_total)
    assert got["hash_size"] == ref_hash, (got, ref_hash)
    ours = bases / best / 1e6
    _upsert({
        "kernel": "kmer", "variant": "flye_counter",
        "shape": "12 Mbp (10 kb reads over a 1 Mbp genome, k=17, "
                 "minLen 5000; KMER_SCALE regime scaled down — the "
                 "reference counter needs ~2 h for the full 1.06 Gbp)",
        "ref_binary": "Flye KmerCounter countKmers only "
                      "(benchmarks/kmer-cnt/vertex_index.cpp:515-659, "
                      "-O2 -march=native, 1 thread; metrics asserted "
                      "identical to ours)",
        "ref_value": round(ref_rate, 2), "unit": "Mbases/s", "reps": 2,
        "ours_value": round(ours, 2),
        "ours_engine": "native host hash engine (native/kmercnt.cpp), "
                       "same reads back-to-back this run; device "
                       "engine 8.3 at 1.06 Gbp (KMER_SCALE.json)",
        "verdict": _verdict(ours, ref_rate),
    })


# --------------------------------------------------------------- phmm ----
def bench_phmm() -> None:
    """GKL AVX PairHMM (the library the reference phmm driver links)
    on the PHMM_SCALE testfile.  Ours comes from PHMM_SCALE.json —
    run tools/phmm_scale_bench.py first."""
    BUILD.mkdir(exist_ok=True)
    exe = BUILD / "gkl_bench"
    gkl = REF / "tools/GKL/src/main/native/pairhmm"
    if not exe.exists():
        _run(["g++", "-O2", "-w", "-mavx", f"-I{gkl}",
              str(GOLDEN / "gkl_bench_harness.cpp"),
              f"{gkl}/avx_impl.cc", f"{gkl}/pairhmm_common.cc",
              "-o", str(exe)])
    tf = pathlib.Path("/tmp/phmm_scale/testfile.txt")
    if not tf.exists():
        raise SystemExit("run tools/phmm_scale_bench.py first")
    ours_entry = json.loads((REPO / "PHMM_SCALE.json").read_text())[-1]
    out = _run([str(exe), str(tf), "3"]).stdout
    ref_gcups = float(re.search(r"gcups=([\d.]+)", out).group(1))
    ref_fb = int(re.search(r"fallback=(\d+)", out).group(1))
    ours = float(ours_entry["gcups_end_to_end"])
    _upsert({
        "kernel": "phmm", "variant": "gkl_avx",
        "shape": f"{ours_entry['batches']} batches / "
                 f"{ours_entry['pairs']} testcases / "
                 f"{ours_entry['gcells']} Gcells (the PHMM_SCALE "
                 "testfile)",
        "ref_binary": "GKL AVX PairHMM float-first/double-fallback loop "
                      "(tools/GKL/src/main/native/pairhmm "
                      "IntelPairHmmCSource.cpp:61-85 semantics, "
                      "-O2 -mavx, 1 thread)",
        "ref_value": round(ref_gcups, 2), "unit": "GCUPS", "reps": 3,
        "ref_fallback_cases": ref_fb,
        "ours_value": round(ours, 2),
        "ours_engine": "END-TO-END incl. parse + host prep + device "
                       "kernel + f64 fallback (PHMM_SCALE.json; "
                       f"kernel-region "
                       f"{ours_entry['gcups_kernel_region']} GCUPS)",
        "verdict": _verdict(ours, ref_gcups),
    })


# --------------------------------------------------------------- abea ----
def bench_abea() -> None:
    """f5c adaptive banded align (align.c:169-548) on the ABEA_SCALE
    reads (pre-made events, scale=1 shift=0 — the same inputs the
    Pallas fill gets)."""
    from abea_scale_bench import synth_model, synth_read
    from generate_fixtures import build, make_farm

    BUILD.mkdir(exist_ok=True)
    exe = BUILD / "abea_bench"
    if not exe.exists():
        with tempfile.TemporaryDirectory() as td:
            tmp = pathlib.Path(td)
            farm = make_farm(tmp, ["benchmarks/abea/src"])
            src = farm / "benchmarks/abea/src"
            built = build(
                tmp, "abea_bench",
                [str(GOLDEN / "abea_bench_harness.cpp"),
                 str(src / "align.c")],
                include_dirs=[str(src), str(REF / "tools/htslib")],
                extra_flags=["-ffp-contract=off"], libs=["-lm"],
            )
            shutil.copy2(built, exe)

    ours_entry = json.loads((REPO / "ABEA_SCALE.json").read_text())[-1]
    # regenerate the exact ABEA_SCALE workload (same seed/sequence):
    # 16 reads linspace 10-50 kb, plus the --add-100k read when the
    # committed entry carries 17
    rng = np.random.default_rng(17)
    model = synth_model(rng)
    n_reads = int(ours_entry["reads"])
    base_reads = 16 if n_reads == 17 else n_reads
    lens = np.linspace(ours_entry["len_min"],
                       min(50_000, ours_entry["len_max"]),
                       base_reads).astype(int)
    if ours_entry.get("oracle_parity_reads", 0) < base_reads:
        lens[:8] = np.linspace(ours_entry["len_min"],
                               min(15_000, ours_entry["len_max"]),
                               8).astype(int)
    if n_reads == 17:
        lens = np.concatenate([lens, [100_000]])
    cases = BUILD / f"abea_scale_cases_{n_reads}.txt"
    mtsv = BUILD / "abea_model.tsv"
    if not cases.exists():
        with open(mtsv, "w") as f:
            f.write("kmer\tlevel_mean\tlevel_stdv\n")
            for r in range(4096):
                km = "".join("ACGT"[(r >> (2 * (5 - j))) & 3]
                             for j in range(6))
                f.write(f"{km}\t{model['level_mean'][r]:.6f}\t"
                        f"{model['level_stdv'][r]:.6f}\n")
        with open(cases, "w") as f:
            for ln in lens:
                seq, ev = synth_read(rng, model, int(ln))
                f.write(seq + "\n")
                f.write(str(len(ev)) + " "
                        + " ".join(f"{x:.6f}" for x in ev) + "\n")
    out = _run([str(exe), str(mtsv), str(cases), "3"]).stdout
    ref_rate = float(re.search(r"events_per_s=([\d.]+)", out).group(1))
    events = int(re.search(r"events=(\d+)", out).group(1))
    ours = float(ours_entry["events_per_s"])
    _upsert({
        "kernel": "abea", "variant": "f5c_align_c",
        "shape": f"{n_reads} reads 10-50 kb, {events} events "
                 "(the ABEA_SCALE workload, same seed)",
        "ref_binary": "f5c adaptive banded align CPU path "
                      "(benchmarks/abea/src/align.c:169-548, -O2 "
                      "-ffp-contract=off per the reference Makefile, "
                      "1 thread; pre-made events, scale=1 shift=0 on "
                      "both sides)",
        "ref_value": round(ref_rate, 1), "unit": "events/s", "reps": 3,
        "ours_value": round(ours, 1),
        "ours_engine": f"{ours_entry.get('engine', 'device')} engine "
                       "(ABEA_SCALE.json; host = native/abeafill.cpp, "
                       "device = pallas fill + on-device walk)",
        "verdict": _verdict(ours, ref_rate),
    })


# ---------------------------------------------------------------- dbg ----
def bench_dbg() -> None:
    """Platypus window assembly (graph build + the pinned per-seed
    variant-path DFS) vs our native window engine on identical windows
    — the bench_all.py dbg workload (24 x 1.5 kb, 60 x 80 bp reads)."""
    from generate_fixtures import _ensure_htslib, make_farm

    from genomicsbench_palisade_tpu.io.native import dbg_window_native

    BUILD.mkdir(exist_ok=True)
    exe = BUILD / "dbg_bench"
    if not exe.exists():
        hts = _ensure_htslib()
        with tempfile.TemporaryDirectory() as td:
            tmp = pathlib.Path(td)
            farm = make_farm(tmp, ["benchmarks/dbg"],
                             stub_local=["benchmarks/dbg"])
            src = farm / "benchmarks/dbg"
            _run(["g++", "-O2", "-w", "-fopenmp", f"-I{src}", f"-I{hts}",
                  "-include",
                  str(GOLDEN / "stub" / "golden_preinclude.h"),
                  f"-I{GOLDEN / 'stub'}",
                  str(GOLDEN / "dbg_bench_harness.cpp"),
                  str(src / "common.cpp"), str(hts / "libhts.a"),
                  "-lz", "-lm", "-lpthread", "-o", str(exe)])

    # the bench_all.py dbg workload, exactly (seed 12)
    rng = np.random.default_rng(12)
    n_win, w_len, n_reads, r_len = 24, 1500, 60, 80
    wins = []
    for _ in range(n_win):
        ref = "".join(rng.choice(list("ACGT"), w_len))
        reads = []
        for _ in range(n_reads):
            s = int(rng.integers(0, w_len - r_len))
            seq = list(ref[s:s + r_len])
            for pos in np.nonzero(rng.random(r_len) < 0.01)[0]:
                seq[pos] = "ACGT"[rng.integers(0, 4)]
            reads.append(("".join(seq), np.full(r_len, 35, np.uint8), 0))
        wins.append((ref, reads))
    cases = BUILD / "dbg_windows.txt"
    with open(cases, "w") as f:
        f.write(f"{n_win}\n")
        for ref, reads in wins:
            f.write(f"0 20 15\n{ref}\n{len(reads)}\n")
            for seq, quals, _pos in reads:
                f.write(seq + "\n")
                f.write(" ".join(str(int(q)) for q in quals) + "\n")
    out = _run([str(exe), str(cases), "3"]).stdout
    ref_rate = float(re.search(r"mbref_per_s=([\d.]+)", out).group(1))
    ref_paths = int(re.search(r"paths=(\d+)", out).group(1))

    best, n_paths = 1e30, 0
    for _ in range(3):
        t0 = time.perf_counter()
        n_paths = 0
        for ref, reads in wins:
            _n, paths = dbg_window_native(ref, 0, reads, 15, 20, 2)
            n_paths += len(paths)
        best = min(best, time.perf_counter() - t0)
    assert n_paths == ref_paths, (n_paths, ref_paths)
    ours = n_win * w_len / best / 1e6
    _upsert({
        "kernel": "dbg", "variant": "platypus_windows",
        "shape": "24 windows x 1.5 kb ref, 60 x 80 bp reads "
                 "(the bench_all dbg workload, seed 12)",
        "ref_binary": "Platypus debruijn.cpp graph build + pinned "
                      "per-seed variant-path DFS "
                      "(assembleReadsAndDetectVariants body :1389-1433 "
                      "+ getVariantPathsThroughGraphFromNode :1147; "
                      "-O2, 1 thread; path counts asserted identical)",
        "ref_value": round(ref_rate, 3), "unit": "Mb-ref/s", "reps": 3,
        "ours_value": round(ours, 3),
        "ours_engine": "native window engine (native/dbg.cpp), same "
                       "windows back-to-back this run",
        "verdict": _verdict(ours, ref_rate),
    })


# ------------------------------------------------------------- pileup ----
def bench_pileup() -> None:
    """medaka_counts + htslib (the reference pileup binary, no
    PRINT_OUTPUT) vs our region pileup (io/bam region reads +
    ops.pileup.calculate_pileup — the cli.pileup body) on the SAME
    indexed BAM: one 1 Mb contig, 20k x 300 bp reads, 100 kb chunks."""
    from generate_fixtures import _build_bamidx, _ensure_htslib

    from genomicsbench_palisade_tpu.io import bam as B
    from genomicsbench_palisade_tpu.ops.pileup import calculate_pileup

    BUILD.mkdir(exist_ok=True)
    hts = _ensure_htslib()
    exe = BUILD / "pileup_bench"
    if not exe.exists():
        # the fork added per-column/per-read printf debug lines INSIDE
        # the timed loop (medaka_counts.c:363-379) — route printf to a
        # no-op sink so the baseline measures medaka's pileup, not
        # printf formatting; fprintf(stderr) timing is untouched
        sink = BUILD / "printf_sink.c"
        sink.write_text("int gt_printf_sink(const char* f, ...)"
                        "{ (void)f; return 0; }\n")
        _run(["gcc", "-O3", "-std=c99", "-fopenmp", "-w", f"-I{hts}",
              "-Dprintf=gt_printf_sink",
              f"{REF}/benchmarks/pileup/medaka_common.c",
              f"{REF}/benchmarks/pileup/medaka_counts.c",
              f"{REF}/benchmarks/pileup/medaka_bamiter.c",
              str(sink),
              str(hts / "libhts.a"), "-lz", "-lm", "-lpthread",
              "-o", str(exe)])
    bam = BUILD / "pileup_1mb.bam"
    ref_len, n_reads, rl = 1_000_000, 20_000, 300
    if not bam.exists():
        rng = np.random.default_rng(20260827)
        idx16 = {c: i for i, c in enumerate(B.SEQ_NT16_STR)}
        rows = []
        positions = np.sort(rng.integers(0, ref_len - rl, n_reads))
        for i, p in enumerate(positions):
            seq = rng.integers(0, 4, rl)
            rows.append(B.BamRecord(
                name=f"r{i}", flag=16 if rng.random() < 0.5 else 0,
                ref_id=0, pos=int(p), mapq=50, cigar=[("M", rl)],
                seq_nt16=np.array([idx16["ACGT"[c]] for c in seq],
                                  np.uint8),
                qual=rng.integers(10, 40, rl).astype(np.uint8), tags={}))
        B.write_bam(str(bam), [("tig1", ref_len)], rows)
        with tempfile.TemporaryDirectory() as td:
            bamidx = _build_bamidx(pathlib.Path(td), hts)
            _run([str(bamidx), str(bam)])

    region = f"tig1:1-{ref_len}"
    best_ref = 1e30
    for _ in range(3):
        out = subprocess.run(
            [str(exe), str(bam), region, "1"], check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True)
        best_ref = min(best_ref, float(re.search(
            r"Kernel runtime: ([\d.]+) s", out.stderr).group(1)))
    ref_rate = n_reads / best_ref

    # ours: the cli.pileup body (fused native region path)
    from genomicsbench_palisade_tpu.ops.pileup import calculate_pileup_region

    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        index = B.read_bai(str(bam) + ".bai")
        cols = 0
        for beg in range(0, ref_len, 100_000):
            end_ = min(beg + 100_000, ref_len)
            res = calculate_pileup_region(str(bam), "tig1", beg, end_,
                                          index=index)
            if res is None:  # native lib absent
                _refs, recs = B.read_bam_region(str(bam), "tig1", beg,
                                                end_, index=index)
                res = calculate_pileup(recs, 0, beg, end_)
            cols += len(res["major"])
        best = min(best, time.perf_counter() - t0)
    ours = n_reads / best
    _upsert({
        "kernel": "pileup", "variant": "medaka_counts",
        "shape": f"1 Mb contig, {n_reads} x {rl} bp reads, 100 kb "
                 f"chunks (ours cols={cols})",
        "ref_binary": "medaka_counts + htslib (benchmarks/pileup/"
                      "medaka_counts.c calculate_pileup, -O3, 1 thread; "
                      "its own Kernel-runtime bracket incl. htslib BAM "
                      "iteration; the fork's in-loop debug printfs "
                      "compiled out)",
        "ref_value": round(ref_rate, 1), "unit": "records/s", "reps": 3,
        "ours_value": round(ours, 1),
        "ours_engine": "io/bam region reads + native pileup events, "
                       "same BAM back-to-back this run",
        "verdict": _verdict(ours, ref_rate),
    })


# --------------------------------------------------------- eventalign ----
def bench_eventalign() -> None:
    """f5c eventalign postprocessing end-to-end — the reference's own
    per-read chain (event detection + banded align + postalign +
    recalibrate + QC + profile-HMM realign + TSV emit, via the golden
    harness) vs our cli.abea eventalign mode on identical inputs."""
    import io as _io

    from generate_fixtures import (_ensure_htslib, _pore_levels,
                                   _rand_dna, _sim_eventalign_read, build,
                                   make_farm)

    from genomicsbench_palisade_tpu.io import bam as B

    BUILD.mkdir(exist_ok=True)
    exe = BUILD / "eventalign_bench"
    hts = _ensure_htslib()
    if not exe.exists():
        with tempfile.TemporaryDirectory() as td:
            tmp = pathlib.Path(td)
            farm = make_farm(tmp, ["benchmarks/abea/src"])
            src = farm / "benchmarks/abea/src"
            built = build(
                tmp, "eventalign_bench",
                [str(GOLDEN / "eventalign_harness.cpp"),
                 str(src / "align.c"), str(src / "events.c"),
                 str(src / "eventalign.c")],
                include_dirs=[str(src), str(hts)],
                extra_flags=["-ffp-contract=off"],
                libs=[str(hts / "libhts.a"), "-lz", "-lm", "-lpthread"],
            )
            shutil.copy2(built, exe)

    wd = BUILD / "eventalign_wl"
    wd.mkdir(exist_ok=True)
    n_reads = 120
    rng = np.random.default_rng(20260828)
    levels = _pore_levels()
    mtsv = wd / "pore.tsv"
    if not mtsv.exists():
        with open(mtsv, "w") as f:
            f.write("kmer\tlevel_mean\tlevel_stdv\n")
            for km, mean in levels.items():
                f.write(f"{km}\t{mean:.2f}\t1.50\n")
    bam = wd / "reads.bam"
    cases = wd / "cases.txt"
    fa = wd / "genome.fa"
    fq = wd / "reads.fa"
    npz = wd / "signals.npz"
    if not bam.exists():
        idx16 = {c: i for i, c in enumerate(B.SEQ_NT16_STR)}
        genome = _rand_dna(rng, 30_000)
        reads, bam_rows, sigs = [], [], {}
        for ri in range(n_reads):
            fastq, query, cig, pos, flag, nm = _sim_eventalign_read(
                rng, genome, 350, 700)
            sig = []
            for i in range(len(fastq) - 5):
                lv = levels[fastq[i:i + 6]]
                sig.extend(lv + rng.normal(0, 0.8, int(rng.integers(3, 14))))
            sig = np.asarray(sig, np.float32)
            qname = f"er{ri}"
            sigs[qname] = sig
            reads.append((qname, fastq, sig))
            bam_rows.append(B.BamRecord(
                name=qname, flag=flag, ref_id=0, pos=pos, mapq=60,
                cigar=cig,
                seq_nt16=np.array([idx16[ch] for ch in query], np.uint8),
                qual=np.full(len(query), 30, np.uint8),
                tags={"NM": nm}))
        bam_rows.sort(key=lambda r: r.pos)
        B.write_bam(str(bam), [("ctg1", len(genome))], bam_rows)
        fa.write_text(f">ctg1\n{genome}\n")
        with open(cases, "w") as f:
            f.write(genome + "\n")
            f.write(f"{len(reads)}\n")
            for qname, fastq, sig in reads:
                f.write(qname + "\n" + fastq + "\n")
                f.write(str(len(sig)) + " "
                        + " ".join(f"{x:.6f}" for x in sig) + "\n")
        fq.write_text("".join(f">{q}\n{s}\n" for q, s, _ in reads))
        np.savez(npz, **sigs)

    best_ref = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        subprocess.run([str(exe), str(mtsv), str(cases), str(bam)],
                       check=True, stdout=subprocess.DEVNULL)
        best_ref = min(best_ref, time.perf_counter() - t0)
    ref_rate = n_reads / best_ref

    import argparse as _ap

    from genomicsbench_palisade_tpu.cli.abea import eventalign_bam
    from genomicsbench_palisade_tpu.io.signal import (load_pore_model,
                                                      load_signals_npz)

    model = load_pore_model(str(mtsv))
    signals = load_signals_npz(str(npz))
    args = _ap.Namespace(
        bam=str(bam), genome=str(fa), reads=str(fq), window=None,
        min_mapq=20, secondary="no", sample_rate=4000.0, summary=None,
        print_read_names=False, scale_events=False)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        eventalign_bam(args, model, signals, _io.StringIO())
        best = min(best, time.perf_counter() - t0)
    ours = n_reads / best
    _upsert({
        "kernel": "eventalign", "variant": "f5c_postproc",
        "shape": f"{n_reads} reads 350-700 bp vs a 30 kb contig "
                 "(event detect + align + postalign + recalibrate + QC "
                 "+ realign + TSV, both sides)",
        "ref_binary": "f5c eventalign per-read chain via the golden "
                      "harness (align.c + events.c + eventalign.c + "
                      "htslib, -O2 -ffp-contract=off, 1 thread, TSV to "
                      "/dev/null)",
        "ref_value": round(ref_rate, 1), "unit": "reads/s", "reps": 3,
        "ours_value": round(ours, 1),
        "ours_engine": "cli.abea eventalign mode in-process (native "
                       "fill + native realign), same inputs "
                       "back-to-back this run",
        "verdict": _verdict(ours, ref_rate),
    })


KERNELS = {"poa": bench_poa, "bsw": bench_bsw, "chain": bench_chain,
           "kmer": bench_kmer, "phmm": bench_phmm, "abea": bench_abea,
           "dbg": bench_dbg, "pileup": bench_pileup,
           "eventalign": bench_eventalign}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("kernels", nargs="*", choices=[*KERNELS, []],
                    help=f"subset of {sorted(KERNELS)}")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args(argv)
    names = sorted(KERNELS) if args.all or not args.kernels else args.kernels
    for name in names:
        print(f"[ref_baseline] {name}", file=sys.stderr)
        KERNELS[name]()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
