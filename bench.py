"""Benchmark: per-kernel 1-chip throughput suite.

Prints one JSON line per north-star kernel (bsw pairs/s, chain anchors/s,
kmer Mbases/s, fmi reads/s per engine), then the FINAL line is the
flagship PairHMM GCUPS record (the driver's tracked metric), with all
per-kernel numbers embedded under "per_kernel" so BENCH_r* captures the
whole suite.

Round-capture hygiene (VERDICT r2):
  * native/ is built in-process before anything queries it, so dbg /
    host-fmi / native-pileup numbers are always recorded (the round
    driver never runs `make`);
  * the flagship phmm measurement runs FIRST (best-of-3) — relay-attached
    timings drift +-20% over a long suite, and the round artifact is the
    scoreboard;
  * the flagship record carries the large-dataset h_pad=512 companion
    bucket (haps <=473, PairHMMUnitTest.cpp:1-34) and the observed
    f64-fallback fraction.

GCUPS = billions of DP cells (rslen x haplen per testcase) per second,
the reference suite's headline PairHMM metric (BASELINE.md).  The
reference publishes no GCUPS number (published{} is empty) so
vs_baseline is reported against our own first recorded TPU run.
"""

import json
import pathlib
import subprocess
import sys
import time

import numpy as np

# Baseline: first recorded 1-chip TPU run of this framework (BASELINE.json
# published{} is empty — "our 1-chip runs become the baseline").
# 2026-08-16, v5e 1 chip, pallas wavefront kernel, chained-execution timing.
BASELINE_GCUPS = 5.8


def _ensure_native():
    """Build native/ if the .so is missing (seconds; the round driver
    doesn't run make, which cost round 2 its dbg/host-fmi/native-pileup
    numbers).  Must run before anything imports io.native (its loader
    caches a miss)."""
    root = pathlib.Path(__file__).resolve().parent
    so = root / "native" / "libgenomics_native.so"
    if so.exists():
        return
    try:
        r = subprocess.run(["make", "-C", str(root / "native")],
                           capture_output=True, text=True, timeout=900)
        if r.returncode != 0:
            print(json.dumps({"note": "native build FAILED",
                              "stderr": r.stderr[-300:]}),
                  file=sys.stderr, flush=True)
    except Exception as e:
        print(json.dumps({"note": f"native build error: {e!r}"[:200]}),
              file=sys.stderr, flush=True)


def _device_watchdog(timeout_s: float = 600.0) -> bool:
    """True when the backend answers within timeout_s.  The axon relay
    can be down for hours; jax.devices() then hangs forever — emit a
    diagnostic line instead of stalling the round-end driver."""
    import threading

    ok = []

    def probe():
        try:
            import jax

            jax.devices()
            ok.append(True)
        except Exception:
            pass

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def _synth_phmm_batch(rng, b, rl, hl, r_pad, h_pad):
    """Reads are noisy subsequences of their haplotype (realistic
    likelihood regime — the adversarial data class from PERF.md)."""
    from genomicsbench_palisade_tpu.ops import phmm as P

    reads, haps, pairs = [], [], []
    for i in range(b):
        hap = rng.integers(0, 4, hl)
        start = rng.integers(0, hl - rl)
        read = hap[start : start + rl].copy()
        noise = rng.random(rl) < 0.05
        read[noise] = rng.integers(0, 4, int(noise.sum()))
        reads.append(
            {
                "bases": read,
                "q": rng.integers(36, 60, rl),
                "i": rng.integers(36, 60, rl),
                "d": rng.integers(36, 60, rl),
                "c": rng.integers(36, 60, rl),
            }
        )
        haps.append(hap)
        pairs.append((i, i))
    return P.prepare_batch(reads, haps, pairs, r_pad=r_pad, h_pad=h_pad)


def _measure_phmm(batch, b, rl, hl, iters=20, repeats=3):
    """Best-of-N chained-execution timing (block_until_ready does not
    block through the axon relay; completion is forced by one host fetch).
    Returns (gcups, f64_fallback_frac)."""
    from genomicsbench_palisade_tpu.ops.phmm_pallas import phmm_forward_pallas

    out = phmm_forward_pallas(batch)  # compile + warmup
    fallback_frac = float(np.asarray(out[2]).mean())
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = phmm_forward_pallas(batch)
        np.asarray(out[0])  # chained executions, one final host fetch
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return b * rl * hl / best / 1e9, fallback_frac


def main():
    _ensure_native()
    if not _device_watchdog():
        print(json.dumps({
            "metric": "phmm_forward_gcups_1chip",
            "value": 0.0,
            "unit": "GCUPS",
            "vs_baseline": 0.0,
            "error": "device backend unreachable (axon relay down) — "
                     "no kernel was executed; see PERF.md for the last "
                     "recorded chip numbers",
        }))
        return

    import jax

    from genomicsbench_palisade_tpu.utils.compile_cache import enable as _cc

    _cc()  # persistent XLA cache: repeat rounds skip the 30-100 s compiles

    # ---- flagship FIRST: GenomicsBench phmm small envelope (reads
    # <=250bp, haps <=302bp -> bucket 256/320), best-of-3
    rng = np.random.default_rng(0)
    b, rl, hl = 8192, 250, 302
    batch = _synth_phmm_batch(rng, b, rl, hl, r_pad=256, h_pad=320)
    batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}
    gcups, fb_frac = _measure_phmm(batch, b, rl, hl)

    # large-dataset companion bucket: haps <=473 -> h_pad 512
    # (PairHMMUnitTest.cpp:1-34), half the batch to keep VMEM headroom
    h512 = None
    try:
        b2, hl2 = 4096, 473
        batch2 = _synth_phmm_batch(rng, b2, rl, hl2, r_pad=256, h_pad=512)
        batch2 = {k: jax.device_put(np.asarray(v)) for k, v in batch2.items()}
        g2, _ = _measure_phmm(batch2, b2, rl, hl2, repeats=2)
        h512 = round(g2, 3)
    except Exception as e:
        h512 = f"error: {e!r}"[:120]

    # ---- secondary kernels (each prints its own JSON line)
    per_kernel = {}
    sys.path.insert(0, str(pathlib.Path(__file__).parent / "tools"))
    try:
        import bench_all

        for fn in (bench_all.bench_bsw, bench_all.bench_chain,
                   bench_all.bench_kmer, bench_all.bench_fmi,
                   bench_all.bench_grm, bench_all.bench_poa,
                   bench_all.bench_abea, bench_all.bench_pileup,
                   bench_all.bench_dbg):
            try:
                r = fn()
            except Exception as e:  # keep the suite going
                r = {"kernel": fn.__name__, "error": repr(e)[:160]}
            print(json.dumps(r), flush=True)
            if "value" in r:  # keep every reported field (fmi adds
                # host_reads_per_s for the native engine)
                per_kernel[r["kernel"]] = {
                    k: v for k, v in r.items() if k != "kernel"}
    except Exception as e:
        print(json.dumps({"suite_error": repr(e)[:160]}), flush=True)

    vs = 1.0 if BASELINE_GCUPS is None else gcups / BASELINE_GCUPS
    print(
        json.dumps(
            {
                "metric": "phmm_forward_gcups_1chip",
                "value": round(gcups, 3),
                "unit": "GCUPS",
                "vs_baseline": round(vs, 3),
                "h512_gcups": h512,
                "f64_fallback_frac": round(fb_frac, 5),
                "per_kernel": per_kernel,
            }
        )
    )


if __name__ == "__main__":
    main()
