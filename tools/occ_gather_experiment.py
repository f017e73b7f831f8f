"""Pallas occ-row gather with manually pipelined DMA vs the XLA gather.

VERDICT r1 item 4 asked whether a Pallas kernel issuing double-buffered
row DMAs from HBM can beat the ~160 MB/s effective rate XLA achieves on
random 64-byte cp_occ row gathers (the TPU fmi engine's ceiling,
PERF.md "chip/relay characteristics").

The kernel keeps the cp_pack table in HBM (ANY memory space) packed 8
occ rows per 128-lane tile row ([blocks/8, 128] u32 — Mosaic cannot
slice a 16-lane row out of a (1,128)-tiled HBM memref, so the DMA unit
is the full 512-byte tile row; HBM random-access granularity is >=512 B
on v5e anyway, so this costs no real bandwidth).  It streams a chunk of
random row indices through SMEM and issues one row DMA per index with K
slots in flight (K=2 double buffering and K=8 deep pipelining are both
measured).  Each landed row has its 16-lane subrow extracted with a
dynamic lane roll and XOR-accumulated so the fetches cannot be elided.
The same indices are gathered with jnp.take for the XLA baseline.

Run: python tools/occ_gather_experiment.py  (prints one JSON line)
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 512  # indices per grid step (SMEM block)


def _kernel(nslots, idx_ref, tbl_ref, out_ref, buf, acc, sem):
    """One grid step: fetch CHUNK random rows via nslots in-flight DMAs.

    idx values address the LOGICAL [blocks, 16] table; the HBM table is
    packed [blocks//8, 128], so row i lives in tile row i>>3 at lane
    offset (i&7)*16.
    """

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            tbl_ref.at[pl.ds(idx_ref[i, 0] >> 3, 1), :],
            buf.at[pl.ds(slot, 1), :],
            sem.at[slot],
        )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc[:, :] = jnp.zeros_like(acc)

    for w in range(nslots):  # warm-up: fill the pipeline
        get_dma(w, w).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(i, _):
        slot = jax.lax.rem(i, nslots)

        get_dma(slot, i).wait()
        row = buf[pl.ds(slot, 1), :]
        # bring lanes [(i&7)*16 .. +16) to lanes [0..16), mask the rest
        sh = jax.lax.rem(128 - (idx_ref[i, 0] & 7) * 16, 128)
        sub = jnp.where(lane < 16, pltpu.roll(row, sh, axis=1),
                        jnp.uint32(0))
        acc[:, :] = acc[:, :] ^ sub

        @pl.when(i + nslots < CHUNK)
        def _next():
            get_dma(slot, i + nslots).start()

        return ()

    jax.lax.fori_loop(0, CHUNK, body, ())
    out_ref[:, :] = acc[:, :]


@functools.partial(jax.jit, static_argnames=("nslots",))
def dma_gather_xor(tbl_packed, idx, nslots):
    """tbl_packed: [blocks//8, 128] u32; idx: logical row ids [n]."""
    n = idx.shape[0]
    grid = n // CHUNK
    return pl.pallas_call(
        functools.partial(_kernel, nslots),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((CHUNK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.uint32),  # landing slots
            pltpu.VMEM((1, 128), jnp.uint32),  # xor accumulator
            pltpu.SemaphoreType.DMA((8,)),
        ],
    )(idx[:, None], tbl_packed)


def _bw_kernel(nslots, group, idx_ref, tbl_ref, out_ref, buf, acc, sem):
    """Pure-bandwidth variant: nslots DMAs in flight, waits and XORs in
    groups of `group` rows (no per-row subrow extraction) — the upper
    bound any DMA-based gather could reach."""

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            tbl_ref.at[pl.ds(idx_ref[i, 0] >> 3, 1), :],
            buf.at[pl.ds(slot, 1), :],
            sem.at[slot],
        )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc[:, :] = jnp.zeros_like(acc)

    for w in range(nslots):
        get_dma(w, w).start()

    def body(g, _):
        i0 = g * group
        slot0 = jax.lax.rem(i0, nslots)
        for j in range(group):
            get_dma(slot0 + j, i0 + j).wait()
        blk = buf[pl.ds(slot0, group), :]
        acc[:, :] = acc[:, :] ^ blk

        @pl.when(i0 + nslots < CHUNK)
        def _next():
            for j in range(group):
                get_dma(slot0 + j, i0 + nslots + j).start()

        return ()

    jax.lax.fori_loop(0, CHUNK // group, body, ())
    out_ref[:, :] = acc[0:1, :]
    for j in range(1, group):
        out_ref[:, :] = out_ref[:, :] ^ acc[pl.ds(j, 1), :]


@functools.partial(jax.jit, static_argnames=("nslots", "group"))
def dma_bw_xor(tbl_packed, idx, nslots, group):
    n = idx.shape[0]
    return pl.pallas_call(
        functools.partial(_bw_kernel, nslots, group),
        grid=(n // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((nslots, 128), jnp.uint32),
            pltpu.VMEM((group, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
    )(idx[:, None], tbl_packed)


@jax.jit
def xla_gather_xor(tbl, idx):
    rows = jnp.take(tbl, idx, axis=0)  # [n, 16]
    return jax.lax.reduce(rows, np.uint32(0), jax.lax.bitwise_xor, (0,))


def bench(fn, *a, iters=10):
    r = fn(*a)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters, np.asarray(r).ravel()


def main():
    from genomicsbench_palisade_tpu.utils.compile_cache import enable
    enable()

    rng = np.random.default_rng(3)
    blocks = 4_000_000  # 256 MB table — far beyond VMEM, random rows
    tbl = jnp.asarray(rng.integers(0, 2**32, (blocks, 16), dtype=np.uint64)
                      .astype(np.uint32))
    n = 16384
    idx = jnp.asarray(rng.integers(0, blocks, n).astype(np.int32))

    tbl_packed = tbl.reshape(blocks // 8, 128)
    out = {"tool": "occ_gather_experiment", "rows": n, "row_bytes": 64}
    want = None
    want = np.bitwise_xor.reduce(np.asarray(tbl)[np.asarray(idx)], axis=0)
    # bw variant XORs whole 128-lane packed rows (no subrow extraction)
    want_bw = np.bitwise_xor.reduce(
        np.asarray(tbl_packed)[np.asarray(idx) >> 3], axis=0)
    # v2-layout question (VERDICT r3 #6): the host engine won 1.7x by
    # halving occ rows to 32 B; does the device gather rate scale with
    # BYTES (32 B rows -> 2x rows/s) or is it a fixed per-ROW DMA
    # service (~200 ns, PERF.md)?  Same index stream against 32/64/128 B
    # rows of the same table answers it directly.
    tbl32 = tbl[:, :8]
    tbl128 = jnp.concatenate([tbl, tbl], axis=1)
    want32 = np.bitwise_xor.reduce(
        np.asarray(tbl32)[np.asarray(idx)], axis=0)
    want128 = np.bitwise_xor.reduce(
        np.asarray(tbl128)[np.asarray(idx)], axis=0)
    for name, fn, exp, row_b in (
            ("xla_gather", lambda: xla_gather_xor(tbl, idx), want, 64),
            ("xla_gather32", lambda: xla_gather_xor(tbl32, idx),
             want32, 32),
            ("xla_gather128", lambda: xla_gather_xor(tbl128, idx),
             want128, 128),
            ("dma_k2", lambda: dma_gather_xor(tbl_packed, idx, 2),
             want, 64),
            ("dma_k8", lambda: dma_gather_xor(tbl_packed, idx, 8),
             want, 64),
            ("dma_bw32", lambda: dma_bw_xor(tbl_packed, idx, 32, 8),
             want_bw, 64)):
        try:
            dt, val = bench(fn)
            out[name + "_ms"] = round(dt * 1e3, 3)
            out[name + "_mb_s"] = round(n * row_b / dt / 1e6, 1)
            out[name + "_mrows_s"] = round(n / dt / 1e6, 2)
            out[name + "_correct"] = bool(
                np.array_equal(val.reshape(-1)[: len(exp)], exp))
        except Exception as e:  # record failures instead of dying
            out[name + "_error"] = repr(e)[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
