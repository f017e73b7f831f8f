"""Mesh construction and data-parallel batch sharding.

The genomics kernels are embarrassingly batch-parallel (the reference used
OpenMP dynamic scheduling over read batches, fmi.cpp:241-253 etc.); on TPU
that becomes a 1-D (or hosts x chips 2-D) mesh with the batch dimension
sharded and results merged by collectives where needed (k-mer histograms:
psum; SMEM/alignment assembly: all_gather).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def make_mesh(n_devices: int | None = None, axis: str = DP_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0, fill=0):
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    return np.pad(arr, pad, constant_values=fill), n


def shard_batch(batch: dict, mesh: Mesh, axis: str = DP_AXIS):
    """Pad dim 0 of every array to the mesh size and shard it."""
    ndev = mesh.devices.size
    sharding = NamedSharding(mesh, P(axis))
    out = {}
    n_orig = None
    for key, arr in batch.items():
        arr = np.asarray(arr)
        padded, n = pad_to_multiple(arr, ndev, axis=0)
        n_orig = n if n_orig is None else n_orig
        out[key] = jax.device_put(padded, sharding)
    return out, n_orig
