"""nn-variant driver: `python -m genomicsbench_palisade_tpu.cli.call_var
--input_fn tensors.{npz,h5} [--output_fn out.npz] [--chkpnt_fn w.msgpack]`.

Reproduces the Clair prediction driver contract (benchmarks/nn-variant/
prediction.py:11-45,71-114): loads batches of pileup tensors
[N, 33, 8, 4], runs the 2xBiLSTM + slice-dense forward producing the four
softmax heads (gt21, genotype, variant-length 1, variant-length 2),
collects predictions, prints `Begin predicting...` / `Time taken: %.4f s`
and writes the probabilities to --output_fn.

Inputs: .npz with array `X` (or per-batch arrays X0..Xn), or an HDF5
file whose datasets are the batch tensors.  Weights: flax msgpack from
models.clair.init_model params, or random when omitted (smoke).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..models import clair as C

HEADS = ("gt21", "genotype", "indel_length_1", "indel_length_2")


def load_batches(path):
    if path.endswith(".npz"):
        data = np.load(path)
        if "X" in data.files:
            return [np.asarray(data["X"], np.float32)]
        return [np.asarray(data[k], np.float32) for k in sorted(data.files)]
    import h5py

    batches = []
    with h5py.File(path, "r") as f:
        def visit(_name, obj):
            if isinstance(obj, h5py.Dataset) and obj.ndim == 4:
                batches.append(np.asarray(obj, np.float32))
        f.visititems(visit)
    return batches


def main(argv=None):
    ap = argparse.ArgumentParser(prog="call_var")
    ap.add_argument("--input_fn", default="prediction_input.h5",
                    help="pileup tensor batches (.npz or .h5)")
    ap.add_argument("--output_fn", default="prediction_output.npz")
    ap.add_argument("--chkpnt_fn", default=None, help="flax msgpack weights")
    ap.add_argument("--threads", type=int, default=None, help="ignored")
    # accepted for reference CLI parity (prediction.py:74-110; the
    # reference's Run() only uses input_fn/output_fn/chkpnt_fn/threads)
    ap.add_argument("--sampleName", default="SAMPLE")
    ap.add_argument("--qual", type=int, default=None)
    ap.add_argument("--tensor_fn", default="PIPE")
    ap.add_argument("--call_fn", default=None)
    ap.add_argument("--bam_fn", default="bam.bam")
    ap.add_argument("--ref_fn", default=None)
    ap.add_argument("--showRef", action="store_true")
    ap.add_argument("--debug", action="store_true")
    args = ap.parse_args(argv)

    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()

    model, params = C.init_model()
    if args.chkpnt_fn:
        from flax import serialization

        with open(args.chkpnt_fn, "rb") as f:
            params = serialization.from_bytes(params, f.read())

    batches = load_batches(args.input_fn)
    print("Begin predicting...")
    outputs = {h: [] for h in HEADS}
    t0 = time.perf_counter()
    import jax.numpy as jnp

    for x in batches:
        heads = model.apply(params, jnp.asarray(x))
        for name, h in zip(HEADS, heads):
            outputs[name].append(np.asarray(h))
    end_time = time.perf_counter() - t0

    cat = {k: np.concatenate(v) if v else np.zeros(0)
           for k, v in outputs.items()}
    if args.output_fn.endswith((".h5", ".hdf5")):
        import h5py

        with h5py.File(args.output_fn, "w") as f:
            for k, v in cat.items():
                f.create_dataset(k, data=v)
    else:
        np.savez(args.output_fn, **cat)
    print("Time taken: %.4f s" % end_time)
    return 0


if __name__ == "__main__":
    sys.exit(main())
