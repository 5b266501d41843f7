"""Fused Pallas kernel for one ResidualControl stage.

A stage (models/Ours/model_singleframe.py:127-134 semantics) is

    exx = lrelu(conv3b(lrelu(conv3a(x))))
    tx  = lrelu(conv4b(lrelu(conv4a(x))))
    out = lrelu(conv5(concat(ex_scale*exx + x, t_scale*tx + x)))

i.e. seven 3x3 convs interleaved with elementwise ops.  XLA runs each conv
as its own fusion, materializing ~12 intermediate HBM tensors per stage
(~half the measured stage time).  This kernel computes the whole stage per
row-band in VMEM: the input band (3-deep halo) is DMA'd once, all three
conv levels run as row-wise im2col matmuls on the MXU with the activations
and residual/scale algebra fused in-register, and only the stage output is
written back — one HBM round-trip per stage instead of ~14.

Weight layout: the public entry takes the stage's im2col matrices
(Wa (9C, 2C) merged conv3a|conv4a, W3b/W4b (9C, C), W5 (18C, C); tap order
(dy*3+dx) major, input channel minor); internally every matrix is split so
each MXU dot has K = C and no lane-concats are required.

Numerical note: matmuls accumulate in f32; elementwise runs in f32;
output cast back to the input dtype.  Parity with the XLA stage is
enforced by tests (interpret mode exactly; on-device to bf16 tolerance).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.01 * x)


def _conv_taps_into(acc, buf, rows, WP, Cin, wmat, init=True):
    """3x3 conv over the aligned canvas, accumulated INTO the f32 scratch
    `acc` (one live dot temp at a time — letting SSA accumulate keeps all
    nine partials on Mosaic's stack and blows VMEM).  buf: (.., >=WP+2,
    >=Cin); wmat: (9*Cin, C); acc: (>=rows, >=WP, C) f32.  Dot inputs stay
    in the compute dtype (bf16 MXU passes); accumulation is f32."""
    for dy in range(3):
        for dx in range(3):
            tap = dy * 3 + dx
            x_slice = buf[dy : dy + rows, dx : dx + WP, :Cin]
            d = jnp.dot(
                x_slice.reshape(rows * WP, Cin),
                wmat[tap * Cin : (tap + 1) * Cin, :],
                preferred_element_type=jnp.float32,
            ).reshape(rows, WP, -1)
            if init and tap == 0:
                acc[:rows, :WP, :] = d
            else:
                acc[:rows, :WP, :] += d


def _grid_mask(rows, cols, row0, H, col_off, W):
    """Validity mask for an extended conv grid: entry (r, c) corresponds to
    image coords (row0 + r, c - col_off); the reference zero-pads BETWEEN
    convs, so activations outside [0,H) x [0,W) must be zeroed."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols, 1), 0) + row0
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols, 1), 1) - col_off
    return (r >= 0) & (r < H) & (c >= 0) & (c < W)


def _stage_kernel(
    x_hbm, w3a_ref, w4a_ref, w3b_ref, w4b_ref, w5u_ref, w5v_ref,
    bias_ref, scale_ref, o_ref, xbuf, a3, a4, acc, sem, *, TH, W, C, WP, H,
):
    """Grid (B, H/TH).

    x_hbm: (B, H+6, WPX, c128) zero-padded input (pad 3 each side in H/W).
    w*_ref: (9C, C) im2col weight matrices (conv5 split into its u/v
    halves so every dot keeps K = C and no lane-concats are needed).
    bias_ref: (8, C) f32 rows = [b3a, b4a, b3b, b4b, b5, 0, 0, 0].
    scale_ref: (B, 2C) f32 = [ex_scale | t_scale] per batch row.
    o_ref: (1, TH, W, C) VMEM block.
    xbuf/a3/a4: compute-dtype scratch; a3/a4 are reused in place for u/v.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * TH, TH + 6), :, :], xbuf, sem)
    cp.start()
    cp.wait()

    dt = o_ref.dtype

    # Canvas convention: xbuf col c <-> image col c-3; row r of band i <->
    # image row i*TH + r - 3.  Each level computes on the full WP-wide
    # aligned canvas; out-of-image activations are zeroed because the
    # reference's ConvLayers zero-pad independently between convs.

    # ---- level A, centered at canvas (r+1, c+1) ------------------------- #
    rows_a = TH + 4
    mask_a = _grid_mask(rows_a, WP, i * TH - 2, H, 2, W)
    _conv_taps_into(acc, xbuf, rows_a, WP, C, w3a_ref[...])
    a3[:, :WP, :] = jnp.where(
        mask_a, _lrelu(acc[:rows_a, :WP, :] + bias_ref[0, :]), 0.0
    ).astype(dt)
    _conv_taps_into(acc, xbuf, rows_a, WP, C, w4a_ref[...])
    a4[:, :WP, :] = jnp.where(
        mask_a, _lrelu(acc[:rows_a, :WP, :] + bias_ref[1, :]), 0.0
    ).astype(dt)

    # ---- level B + residual/scale (u/v overwrite a3/a4 in place) -------- #
    rows_b = TH + 2
    xc = xbuf[2 : 2 + rows_b, 2 : 2 + WP, :C].astype(jnp.float32)
    mask_b = _grid_mask(rows_b, WP, i * TH - 1, H, 1, W)
    _conv_taps_into(acc, a3, rows_b, WP, C, w3b_ref[...])
    a3[:rows_b, :WP, :] = jnp.where(
        mask_b,
        scale_ref[b, :C] * _lrelu(acc[:rows_b, :WP, :] + bias_ref[2, :]) + xc,
        0.0,
    ).astype(dt)
    _conv_taps_into(acc, a4, rows_b, WP, C, w4b_ref[...])
    a4[:rows_b, :WP, :] = jnp.where(
        mask_b,
        scale_ref[b, C:] * _lrelu(acc[:rows_b, :WP, :] + bias_ref[3, :]) + xc,
        0.0,
    ).astype(dt)

    # ---- conv5 = conv5u(u) + conv5v(v) over the (TH, W) output grid ------ #
    _conv_taps_into(acc, a3, TH, WP, C, w5u_ref[...])
    _conv_taps_into(acc, a4, TH, WP, C, w5v_ref[...], init=False)
    out = _lrelu(acc[:TH, :WP, :] + bias_ref[4, :])
    o_ref[0] = out[:, :W, :].astype(dt)


def _pick_th(H: int, wpx: int, C: int, itemsize: int,
             budget_bytes: int = 11 * 2**20) -> int:
    """Largest row-band dividing H whose scratch set fits the VMEM budget
    (conservative: in-kernel value live ranges need headroom too)."""
    for th in (16, 12, 10, 8, 6, 5, 4, 3, 2, 1):
        if H % th:
            continue
        c128 = -(-C // 128) * 128
        need = (
            (th + 6) * wpx * c128 * itemsize        # xbuf
            + 2 * (th + 4) * wpx * C * itemsize     # a3, a4
            + (th + 4) * wpx * C * 4                # acc scratch
            + 4 * (th + 4) * wpx * C * 4            # live f32 headroom
        )
        if need <= budget_bytes:
            return th
    return 1


def _xla_stage_twin(x, wa, w3b, w4b, w5, biases, scales):
    """Reference XLA computation of one stage from the kernel's weight
    layout — used for the custom-VJP backward and as the parity oracle."""
    from jax import lax

    B, H, W, C = x.shape
    lrelu = _lrelu

    def conv(inp, wmat, cin):
        w = wmat.reshape(3, 3, cin, wmat.shape[-1])
        return lax.conv_general_dilated(
            inp, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    a = conv(x, wa, C)
    a3 = lrelu(a[..., :C] + biases[0])
    a4 = lrelu(a[..., C:] + biases[1])
    b3 = lrelu(conv(a3, w3b, C) + biases[2])
    b4 = lrelu(conv(a4, w4b, C) + biases[3])
    u = scales[:, None, None, :C] * b3 + x
    v = scales[:, None, None, C:] * b4 + x
    out = lrelu(conv(jnp.concatenate([u, v], -1), w5, 2 * C) + biases[4])
    return out.astype(x.dtype)


def _stage_forward_impl(
    x: jax.Array,
    wa: jax.Array,
    w3b: jax.Array,
    w4b: jax.Array,
    w5: jax.Array,
    biases: jax.Array,
    scales: jax.Array,
) -> jax.Array:
    """One fused stage.  x: (B, H, W, C); weights as in the module docstring;
    biases: (8, C); scales: (B, 2C).  Returns (B, H, W, C)."""
    B, H, W, C = x.shape
    wp = -(-(W + 6) // 8) * 8   # aligned compute canvas width
    wpx = wp + 8                # buffer width: canvas + shift room
    c128 = -(-C // 128) * 128
    # H pad 3/3; W pad 3 left + alignment remainder right; C pad to 128 (DMA)
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, wpx - W - 3), (0, c128 - C)))
    TH = _pick_th(H, wpx, C, x.dtype.itemsize)
    interpret = jax.default_backend() not in ("tpu", "axon")
    # split the merged/concat weight matrices so every in-kernel dot is K=C
    w3a, w4a = wa[:, :C], wa[:, C:]
    w5r = w5.reshape(9, 2 * C, C)
    w5u = w5r[:, :C, :].reshape(9 * C, C)
    w5v = w5r[:, C:, :].reshape(9 * C, C)
    return pl.pallas_call(
        partial(_stage_kernel, TH=TH, W=W, C=C, WP=wp, H=H),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=(B, H // TH),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(8)],
        out_specs=pl.BlockSpec(
            (1, TH, W, C), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TH + 6, wpx, c128), x.dtype),
            pltpu.VMEM((TH + 4, wpx, C), x.dtype),
            pltpu.VMEM((TH + 4, wpx, C), x.dtype),
            pltpu.VMEM((TH + 4, wpx, C), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w3a, w4a, w3b, w4b, w5u, w5v, biases, scales)


@jax.custom_vjp
def residual_control_stage_pallas(x, wa, w3b, w4b, w5, biases, scales):
    """Fused Pallas stage with an exact XLA-twin backward."""
    return _stage_forward_impl(x, wa, w3b, w4b, w5, biases, scales)


def _stage_fwd(x, wa, w3b, w4b, w5, biases, scales):
    args = (x, wa, w3b, w4b, w5, biases, scales)
    return _stage_forward_impl(*args), args


def _stage_bwd(res, g):
    _, vjp = jax.vjp(_xla_stage_twin, *res)
    return vjp(g)


residual_control_stage_pallas.defvjp(_stage_fwd, _stage_bwd)
