"""nn-base driver: `python -m genomicsbench_palisade_tpu.cli.basecall
<model_source> <reads>`.

Reproduces the bonito basecaller driver contract (benchmarks/nn-base/
bonito/basecall.py:580-646): loads model weights, iterates reads,
normalizes each raw signal by its noisiest section, chunks with overlap,
runs the QuartzNet-CTC forward (one batched MXU conv stack per read),
stitches posteriors and viterbi-decodes, writing FASTA to stdout and the
`> completed reads / duration / samples per second` summary to stderr.

model_source: 'random' (untrained smoke model), a PyTorch checkpoint
(.tar/.pth, converted via models.bonito.load_torch_state_dict), or a
flax msgpack file saved from init_model params.
reads: .npz (name -> raw signal) or a fast5 file when h5py is present.
"""

from __future__ import annotations

import argparse
import sys
import time
from datetime import timedelta

import numpy as np

from ..io.signal import load_signals_fast5, load_signals_npz
from ..models import bonito as B

MAX_READ_SIZE = 4e6  # basecall.py:592


def load_model(source: str, dtype=None):
    # validate BEFORE the (expensive) model init so a typo fails instantly
    if source != "random" and not source.endswith(
        (".tar", ".pth", ".pt", ".msgpack")
    ):
        raise ValueError(f"unrecognized model source: {source}")
    import jax.numpy as jnp

    model, params = B.init_model(dtype=dtype or jnp.float32)
    if source == "random":
        return model, params
    if source.endswith((".tar", ".pth", ".pt")):
        import torch

        state = torch.load(source, map_location="cpu", weights_only=False)
        state = {k.replace("module.", ""): v for k, v in state.items()}
        return model, B.load_torch_state_dict(state)
    from flax import serialization

    with open(source, "rb") as f:
        params = serialization.from_bytes(params, f.read())
    return model, params


def main(argv=None):
    ap = argparse.ArgumentParser(prog="basecall")
    ap.add_argument("model_source", help="'random', torch .tar/.pth, or flax .msgpack")
    ap.add_argument("reads", help=".npz (name->raw signal) or .fast5")
    ap.add_argument("--chunksize", default=4000, type=int)
    ap.add_argument("--overlap", default=0, type=int)
    ap.add_argument("--beamsize", default=5, type=int,
                    help="CTC prefix beam width (reference default 5; 1 = viterbi)")
    # the reference driver defaults to half precision when the GPU supports
    # it (basecall.py:642); bf16 is the TPU analog (decoder stays f32)
    ap.add_argument("--precision", choices=("bf16", "f32"), default="bf16")
    args = ap.parse_args(argv)

    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()

    import jax.numpy as jnp

    sys.stderr.write("> loading model\n")
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    model, params = load_model(args.model_source, dtype=dtype)

    if args.reads.endswith(".fast5"):
        signals = load_signals_fast5(args.reads)
    else:
        signals = load_signals_npz(args.reads)

    samples = 0
    num_reads = 0
    t0 = time.perf_counter()
    sys.stderr.write("> calling\n")
    for read_id, raw in signals.items():
        if len(raw) > MAX_READ_SIZE:
            sys.stderr.write(
                f"> skipping long read {read_id} ({len(raw)} samples)\n")
            continue
        num_reads += 1
        samples += len(raw)
        norm = B.norm_by_noisiest_section(raw)
        seq = B.basecall_read(model, params, norm,
                              chunksize=args.chunksize, overlap=args.overlap,
                              beamsize=args.beamsize)
        sys.stdout.write(f">{read_id}\n{seq}\n")
    duration = time.perf_counter() - t0

    sys.stderr.write(f"> completed reads: {num_reads}\n")
    sys.stderr.write(f"> duration: {timedelta(seconds=np.round(duration))}\n")
    sys.stderr.write("> samples per second %.1E\n" % (samples / max(duration, 1e-9)))
    sys.stderr.write("> done\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
