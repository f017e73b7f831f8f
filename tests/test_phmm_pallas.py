"""Pallas phmm kernel (interpret mode on CPU) vs the JAX scan reference."""

import jax
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from genomicsbench_palisade_tpu.ops import phmm as P
from genomicsbench_palisade_tpu.ops import phmm_pallas as PP


def test_pallas_matches_scan_bitexact():
    rng = np.random.default_rng(0)
    reads, haps, pairs = [], [], []
    for i in range(128):
        rl, hl = int(rng.integers(5, 60)), int(rng.integers(5, 100))
        reads.append(
            {
                "bases": rng.integers(0, 5, rl),
                "q": rng.integers(36, 60, rl),
                "i": rng.integers(36, 60, rl),
                "d": rng.integers(36, 60, rl),
                "c": rng.integers(36, 60, rl),
            }
        )
        haps.append(rng.integers(0, 5, hl))
        pairs.append((i, i))
    batch = P.prepare_batch(reads, haps, pairs, r_pad=64, h_pad=128)
    batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}
    want = np.asarray(P.phmm_forward(batch)[1])
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(PP.phmm_forward_pallas(batch)[1])
    np.testing.assert_array_equal(got, want)


def test_pallas_512_hap_bucket_matches_scan():
    """h_pad=512 bucket (large-dataset haps <= 473, BASELINE.md) through
    the striped kernel in interpret mode — chip_parity re-proves this
    bucket on hardware at production batch."""
    rng = np.random.default_rng(7)
    reads, haps, pairs = [], [], []
    for i in range(128):  # one full lane tile
        rl, hl = int(rng.integers(40, 120)), int(rng.integers(320, 473))
        hap = rng.integers(0, 4, hl)
        read = hap[:rl].copy()
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
    batch = P.prepare_batch(reads, haps, pairs, r_pad=128, h_pad=512)
    batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}
    want = np.asarray(P.phmm_forward(batch)[1])
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(PP.phmm_forward_pallas(batch)[1])
    np.testing.assert_array_equal(got, want)
