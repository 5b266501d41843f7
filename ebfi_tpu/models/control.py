"""ResidualControl: the time-exposure control stack.

Reference: models/Ours/model_singleframe.py:79-136 — `step` (default 12)
sequential stages, each modulating the event features by 1x1-conv'd
broadcast scalars of exposure `Ex` and timestamp `T` through two residual
paths fused by a conv.

TPU-first: the stages are structurally identical, so they compile as ONE
`nn.scan` over stacked per-stage parameters — a single XLA while-loop body
instead of `step` unrolled subgraphs (faster compiles, identical math).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvLayer, activation_fn, kaiming_in_init


class _ControlStage(nn.Module):
    """One stage (model_singleframe.py:127-134).

    The reference computes the Ex/T modulation scales with 1x1 convs over a
    1x1 "image" of the scalar; that is an affine map of a scalar — here a
    Dense on (B, 1) broadcast over space (identical math, avoids degenerate
    MXU convs inside the hot loop; the checkpoint converter reshapes the
    (C,1,1,1) conv weights onto the dense kernels).
    """

    basech: int
    norm: Optional[str]
    activation: str

    @nn.compact
    def __call__(self, inp, ex_t):
        ex, t = ex_t  # (B,1,1,1) each
        act = activation_fn(self.activation)
        dense = lambda name, v: act(
            nn.Dense(self.basech, kernel_init=kaiming_in_init(0.1),
                     name=name)(v[:, 0, 0, :])
        )[:, None, None, :]
        ex_scale = dense("conv1", ex)
        t_scale = dense("conv2", t)
        exx = ConvLayer(self.basech, 3, 1, 1, self.activation, self.norm, name="conv3a")(inp)
        exx = ConvLayer(self.basech, 3, 1, 1, self.activation, self.norm, name="conv3b")(exx)
        tx = ConvLayer(self.basech, 3, 1, 1, self.activation, self.norm, name="conv4a")(inp)
        tx = ConvLayer(self.basech, 3, 1, 1, self.activation, self.norm, name="conv4b")(tx)
        ex_out = ex_scale * exx + inp
        t_out = t_scale * tx + inp
        out = ConvLayer(self.basech, 3, 1, 1, self.activation, self.norm, name="conv5")(
            jnp.concatenate([ex_out, t_out], axis=-1)
        )
        # keep the scan carry dtype stable under mixed-precision inputs
        return out.astype(inp.dtype), None


class ResidualControl(nn.Module):
    """`step` scanned control stages (model_singleframe.py:79-136).

    `unroll=True` (default) unrolls the scan body at compile time: the
    parameters stay stacked on a leading stage axis (checkpoint layout
    unchanged), but XLA fuses across stages instead of emitting a while
    loop — measured ~5x faster at (1, 360, 640, 64) on v5e, identical math.
    """

    basech: int = 16
    step: int = 4
    norm: Optional[str] = None
    activation: str = "LeakyReLU"
    unroll: bool = True

    @nn.compact
    def __call__(self, data: jax.Array, ex: jax.Array, t: jax.Array) -> jax.Array:
        """data: (B, H, W, C); ex, t: (B, 1) -> (B, H, W, C)."""
        ex = ex[:, None, None, :]  # (B,1,1,1)
        t = t[:, None, None, :]
        scan = nn.scan(
            _ControlStage,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=nn.broadcast,
            length=self.step,
            unroll=self.step if self.unroll else 1,
        )
        out, _ = scan(self.basech, self.norm, self.activation, name="stages")(data, (ex, t))
        return out
