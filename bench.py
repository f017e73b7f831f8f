"""Benchmark: PairHMM forward GCUPS on the flagship kernel.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

GCUPS = billions of DP cells (rslen x haplen per testcase) per second,
the reference suite's headline PairHMM metric (BASELINE.md).  The
reference publishes no GCUPS number (published{} is empty) so
vs_baseline is reported against our own first recorded TPU run.
"""

import json
import time

import numpy as np

# Baseline: first recorded 1-chip TPU run of this framework (BASELINE.json
# published{} is empty — "our 1-chip runs become the baseline").
BASELINE_GCUPS = None  # set after the first recorded run


def main():
    from genomicsbench_palisade_tpu.ops import phmm as P

    rng = np.random.default_rng(0)
    # GenomicsBench phmm small-dataset shape envelope: reads <=250bp,
    # haps <=302bp (BASELINE.md); bucket to 256/384.
    b, r_pad, h_pad = 2048, 256, 384
    rl, hl = 250, 302
    reads, haps, pairs = [], [], []
    for i in range(b):
        reads.append(
            {
                "bases": rng.integers(0, 4, rl),
                "q": rng.integers(36, 70, rl),
                "i": rng.integers(36, 70, rl),
                "d": rng.integers(36, 70, rl),
                "c": rng.integers(36, 70, rl),
            }
        )
        haps.append(rng.integers(0, 4, hl))
        pairs.append((i, i))
    batch = P.prepare_batch(reads, haps, pairs, r_pad=r_pad, h_pad=h_pad)

    import jax

    batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}
    # compile + warmup
    out = P.phmm_forward(batch)
    jax.block_until_ready(out)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = P.phmm_forward(batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    cells = b * rl * hl
    gcups = cells / dt / 1e9
    vs = 1.0 if BASELINE_GCUPS is None else gcups / BASELINE_GCUPS
    print(
        json.dumps(
            {
                "metric": "phmm_forward_gcups_1chip",
                "value": round(gcups, 3),
                "unit": "GCUPS",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
