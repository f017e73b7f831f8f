"""Clair variant-caller network (nn-variant capability) in flax.

Architecture source: benchmarks/nn-variant/clair/model.py:330-640
("2BiLSTM" structure) with shared/param.py shapes:
  input [B, 33, 8, 4] (2*16+1 positions x matrixRow x matrixNum)
  -> flatten positions x 32 features -> BiLSTM(128) -> BiLSTM(128)
  -> per-FEATURE slice-dense over the 256 channels (33 -> 30 units, selu)
  -> flatten (30*256) -> dense 192 selu
  -> four heads dense 96 selu -> softmax outputs:
     gt21 (21), genotype (3), indel length 1 (33), indel length 2 (33)

TPU notes: the BiLSTM scans run under lax.scan; inference is dropout-free
(the reference's dropouts are training-only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

FLANKING = 16
POSITIONS = 2 * FLANKING + 1  # 33
MATRIX_ROW = 8
MATRIX_NUM = 4
GT21 = 21
GENOTYPE = 3
VARLEN = 33  # 2*16 + 1


def selu(x):
    return jax.nn.selu(x)


class BiLSTM(nn.Module):
    units: int

    @nn.compact
    def __call__(self, x):  # [B, T, F]
        lstm_fwd = nn.OptimizedLSTMCell(self.units, name="fwd")
        lstm_bwd = nn.OptimizedLSTMCell(self.units, name="bwd")
        b = x.shape[0]

        def run(cell, seq):
            carry = cell.initialize_carry(jax.random.PRNGKey(0), (b, seq.shape[-1]))
            scan = nn.scan(
                lambda c, carry, xt: c(carry, xt),
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=1,
                out_axes=1,
                # T=33 is static and small: full unroll removes the ~25 us
                # per-step device-loop floor (PERF.md)
                unroll=POSITIONS,
            )
            _, ys = scan(cell, carry, seq)
            return ys

        fwd = run(lstm_fwd, x)
        bwd = run(lstm_bwd, x[:, ::-1, :])[:, ::-1, :]
        return jnp.concatenate([fwd, bwd], axis=-1)


class ClairModel(nn.Module):
    lstm_units: int = 128
    slice_units: int = 30
    l4_units: int = 192
    l5_units: int = 96

    @nn.compact
    def __call__(self, x):  # [B, 33, 8, 4]
        b = x.shape[0]
        h = x.reshape(b, POSITIONS, MATRIX_ROW * MATRIX_NUM).astype(jnp.float32)
        h = BiLSTM(self.lstm_units, name="lstm1")(h)
        h = BiLSTM(self.lstm_units, name="lstm2")(h)  # [B, 33, 256]
        # slice-dense over the FEATURE axis: per channel, dense 33 -> 30
        # (model.py:226-244 with slice_dimension=2)
        ch = h.shape[-1]
        hT = jnp.swapaxes(h, 1, 2)  # [B, 256, 33]
        w = self.param(
            "l3_kernel", nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (ch, POSITIONS, self.slice_units),
        )
        bias = self.param("l3_bias", nn.initializers.zeros, (ch, self.slice_units))
        l3 = selu(jnp.einsum("bcp,cpu->bcu", hT, w) + bias)  # [B, 256, 30]
        # reference flattens to (B, 30 * 256)
        l3f = jnp.swapaxes(l3, 1, 2).reshape(b, self.slice_units * ch)
        l4 = selu(nn.Dense(self.l4_units, name="l4")(l3f))
        heads = []
        for i, out in enumerate((GT21, GENOTYPE, VARLEN, VARLEN)):
            l5 = selu(nn.Dense(self.l5_units, name=f"l5_{i+1}")(l4))
            heads.append(jax.nn.softmax(nn.Dense(out, name=f"y_{i+1}")(l5)))
        return tuple(heads)


def init_model(rng_seed=0, batch=2):
    model = ClairModel()
    params = model.init(
        jax.random.PRNGKey(rng_seed),
        jnp.zeros((batch, POSITIONS, MATRIX_ROW, MATRIX_NUM)),
    )
    return model, params
