"""Fused Pallas kernel for the FAC filter-adaptive convolution.

Grid = (batch, row-band, tap): the innermost tap dimension streams the
per-pixel kernel bank tap-by-tap through lane-aligned (TH, W, C) VMEM
blocks while the output block is revisited and accumulated in an f32 VMEM
scratch — the bank (the dominant tensor: C*K^2 channels at feature
resolution) moves HBM->VMEM exactly once and the output is written once.
The input row-band (with halo) is DMA'd once per band on the first tap;
W-direction shifts are sublane rotates of the resident band (no unaligned
slicing).  Semantics identical to :func:`ebfi_tpu.ops.kernel_conv2d` with
``layout='tap_major'`` (reference CUDA op:
models/FAC/kernelconv2d/KernelConv2D_kernel.cu:25-53, modulo the bank
channel permutation — the torch-checkpoint converter applies it).

The op is bilinear; the custom VJP backward reuses the exact
shift-formulation cotangents (== the CUDA backward kernels,
KernelConv2D_kernel.cu:91-150) via the XLA twin's transpose rules.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernel_conv2d import kernel_conv2d as _xla_fac


def _fac_kernel(x_hbm, k_ref, o_ref, xbuf, sem, *, K, TH, W, C):
    """x_hbm: (B, Hp, Wp8, C128) ANY (manual DMA); k_ref: (1, TH, W, KKC)
    VMEM block (whole bank row-band); o_ref: (1, TH, W, C) VMEM block;
    xbuf: (TH+K-1, Wp8, C128) scratch.  All tap slices are static."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * TH, TH + K - 1), :, :], xbuf, sem
    )
    cp.start()
    cp.wait()
    acc = jnp.zeros((TH, W, C), jnp.float32)
    for ky in range(K):
        for kx in range(K):
            tap = ky * K + kx
            acc += (
                xbuf[ky : ky + TH, kx : kx + W, :C].astype(jnp.float32)
                * k_ref[0, :, :, tap * C : (tap + 1) * C].astype(jnp.float32)
            )
    o_ref[0] = acc.astype(o_ref.dtype)


def _pick_th(H: int, W: int, C: int, K: int, itemsize: int,
             budget_bytes: int = 2500 * 2**10) -> int:
    """Largest row-band TH dividing H whose bank block fits the budget
    (the pipeline double-buffers it; xbuf + f32 acc + out need room too)."""
    per_row = W * C * K * K * itemsize
    for th in (16, 12, 10, 8, 6, 5, 4, 3, 2, 1):
        if H % th == 0 and th * per_row <= budget_bytes:
            return th
    return 1


def _fac_forward(x: jax.Array, kernel: jax.Array, K: int) -> jax.Array:
    B, H, W, C = x.shape
    p = (K - 1) // 2
    # replication pad + round the padded width up to sublane alignment (8)
    wp8 = -(-(W + K - 1) // 8) * 8
    c128 = -(-C // 128) * 128  # DMA wants 128-lane-aligned transfers
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    xp = jnp.pad(
        xp, ((0, 0), (0, 0), (0, wp8 - (W + K - 1)), (0, c128 - C))
    )
    TH = _pick_th(H, W, C, K, x.dtype.itemsize)
    interpret = jax.default_backend() not in ("tpu", "axon")
    return pl.pallas_call(
        partial(_fac_kernel, K=K, TH=TH, W=W, C=C),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=(B, H // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded input, manual DMA
            pl.BlockSpec(
                (1, TH, W, C * K * K),
                lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, W, C), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TH + K - 1, wp8, c128), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, kernel)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def kernel_conv2d_pallas(x: jax.Array, kernel: jax.Array, kernel_size: int) -> jax.Array:
    """FAC with replication padding — Pallas forward, exact XLA backward.

    x: (B, H, W, C); kernel: (B, H, W, K*K*C) **tap-major**.
    """
    return _fac_forward(x, kernel, kernel_size)


def _fwd(x, kernel, kernel_size):
    return _fac_forward(x, kernel, kernel_size), (x, kernel)


def _bwd(kernel_size, res, g):
    x, kernel = res
    _, vjp = jax.vjp(
        lambda a, b: _xla_fac(a, b, kernel_size, layout="tap_major"), x, kernel
    )
    return vjp(g)


kernel_conv2d_pallas.defvjp(_fwd, _bwd)
