"""Modulated deformable convolution v2 (DCNv2).

Reference semantics (CUDA): a bilinear-sampled im2col with learned per-tap
offsets and a multiplicative modulation mask, followed by a GEMM against the
dense weight (models/DCNv2/src/cuda/dcn_v2_im2col_cuda.cu:125-196 im2col,
src/cuda/dcn_v2_cuda.cu:60-94 GEMM; python wrapper models/DCNv2/dcn_v2.py).

TPU-first formulation
---------------------
One static loop over the K*K taps; each tap does four gathers over the
flattened spatial axis (the bilinear corners) with out-of-bounds corners
masked exactly as the CUDA `dmcn_im2col_bilinear_cuda` does
(dcn_v2_im2col_cuda.cu:25-54: a tap contributes iff ``h > -1 && h < H``,
and each corner iff it lies inside the image).  The accumulated column
tensor is then contracted with the weight on the MXU via one dot_general.
Autodiff through the gathers reproduces the CUDA col2im (input grad) and
col2im_coord (offset/mask grad) backward kernels.

Layouts (NHWC):
  x:      (B, H, W, Cin)
  offset: (B, Ho, Wo, DG*2*Kh*Kw)  channel = dg*(2*Kh*Kw) + 2*(i*Kw+j) + {0:h, 1:w}
  mask:   (B, Ho, Wo, DG*Kh*Kw)    channel = dg*(Kh*Kw) + i*Kw + j
  weight: (Cout, Cin, Kh, Kw)      (torch layout, kept for checkpoint parity)
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def dcn_v2_im2col(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    kernel_size,
    stride=1,
    padding=0,
    dilation=1,
    deformable_groups: int = 1,
) -> jax.Array:
    """Deformable bilinear im2col.

    Returns columns of shape (B, Ho, Wo, Cin, Kh*Kw) where the last axis is
    ordered ``i*Kw + j`` (row-major taps), matching the CUDA column layout
    ``c_im*Kh*Kw + i*Kw + j`` (dcn_v2_im2col_cuda.cu:149-151).
    """
    Kh, Kw = _pair(kernel_size)
    Sh, Sw = _pair(stride)
    Ph, Pw = _pair(padding)
    Dh, Dw = _pair(dilation)
    DG = deformable_groups

    B, H, W, C = x.shape
    Ho = (H + 2 * Ph - (Dh * (Kh - 1) + 1)) // Sh + 1
    Wo = (W + 2 * Pw - (Dw * (Kw - 1) + 1)) // Sw + 1
    if C % DG != 0:
        raise ValueError(f"Cin={C} not divisible by deformable_groups={DG}")
    Cg = C // DG

    # Coordinate math runs in (at least) f32 even for bf16 inputs: sampling
    # positions reach H/W in magnitude, and the fractional parts
    # ``lh = h_im - floor(h_im)`` vanish entirely at bf16 resolution
    # (~2 ulp at 360).  Only the gathered *values* stay in the input dtype.
    coord_dtype = jnp.promote_types(offset.dtype, jnp.float32)
    off = offset.astype(coord_dtype).reshape(B, Ho, Wo, DG, Kh * Kw, 2)
    msk = mask.reshape(B, Ho, Wo, DG, Kh * Kw)

    # Flattened-spatial view for gathers, grouped by deformable group.
    xf = x.reshape(B, H * W, DG, Cg)

    # Base sampling grid (static).
    hs = jnp.arange(Ho, dtype=coord_dtype) * Sh - Ph            # (Ho,)
    ws = jnp.arange(Wo, dtype=coord_dtype) * Sw - Pw            # (Wo,)

    cols = []
    for i in range(Kh):
        for j in range(Kw):
            tap = i * Kw + j
            h_im = hs[None, :, None, None] + i * Dh + off[:, :, :, :, tap, 0]  # (B,Ho,Wo,DG)
            w_im = ws[None, None, :, None] + j * Dw + off[:, :, :, :, tap, 1]

            # Tap participates iff strictly inside the open box (-1, H) x (-1, W)
            # (dcn_v2_im2col_cuda.cu:180).
            tap_valid = (h_im > -1) & (h_im < H) & (w_im > -1) & (w_im < W)

            h_low = jnp.floor(h_im)
            w_low = jnp.floor(w_im)
            lh = h_im - h_low
            lw = w_im - w_low
            hh = 1.0 - lh
            hw = 1.0 - lw

            hl = h_low.astype(jnp.int32)
            wl = w_low.astype(jnp.int32)

            val = None
            for (dy, dx, wt) in (
                (0, 0, hh * hw),
                (0, 1, hh * lw),
                (1, 0, lh * hw),
                (1, 1, lh * lw),
            ):
                hc = hl + dy
                wc = wl + dx
                corner_valid = (hc >= 0) & (hc <= H - 1) & (wc >= 0) & (wc <= W - 1)
                hcc = jnp.clip(hc, 0, H - 1)
                wcc = jnp.clip(wc, 0, W - 1)
                flat = (hcc * W + wcc).reshape(B, Ho * Wo, DG)  # (B, HoWo, DG)
                v = jnp.take_along_axis(xf, flat[..., None], axis=1)  # (B, HoWo, DG, Cg)
                v = v.reshape(B, Ho, Wo, DG, Cg)
                w_eff = jnp.where(corner_valid, wt, 0.0).astype(x.dtype)[..., None]
                val = v * w_eff if val is None else val + v * w_eff

            val = jnp.where(tap_valid[..., None], val, 0.0)
            val = val * msk[:, :, :, :, tap][..., None]       # modulation
            cols.append(val.reshape(B, Ho, Wo, C))

    # (B, Ho, Wo, Cin, Kh*Kw)
    return jnp.stack(cols, axis=-1)


def dcn_v2_conv(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None,
    stride=1,
    padding=0,
    dilation=1,
    deformable_groups: int = 1,
) -> jax.Array:
    """Full DCNv2: deformable im2col + MXU GEMM + bias.

    Mirrors ``dcn_v2_conv`` (models/DCNv2/dcn_v2.py:17-95).  Returns
    (B, Ho, Wo, Cout).
    """
    Cout, Cin, Kh, Kw = weight.shape
    cols = dcn_v2_im2col(
        x, offset, mask, (Kh, Kw), stride, padding, dilation, deformable_groups
    )
    wmat = weight.reshape(Cout, Cin, Kh * Kw)
    # accumulate at least in f32 (bf16 inputs), full width for f64 gradchecks
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    out = jnp.einsum(
        "bhwck,ock->bhwo",
        cols,
        wmat,
        preferred_element_type=acc_dtype,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out
