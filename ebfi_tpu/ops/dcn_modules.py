"""DCN flax modules and deformable PSROI pooling.

- :class:`DCNv2Module` / :class:`DCN` / :class:`DCNSep` — flax wrappers
  around :func:`ebfi_tpu.ops.dcn_v2_conv` matching the torch modules
  (models/DCNv2/dcn_v2.py:98-227): dense weight (Cout,Cin,Kh,Kw) init
  U(+-1/sqrt(fan_in)), zero bias, and a zero-initialized offset/mask conv.
  `DCNSep` predicts offsets from a second feature map — the alignment
  module the reference imports into the model (model_singleframe.py:16).
- :func:`dcn_v2_psroi_pooling` — deformable position-sensitive ROI pooling
  (dcn_v2_psroi_pooling_cuda.cu:59-146) as a vectorized JAX program; the
  detection-legacy path, differentiable via autodiff.

The torch wiring quirk is preserved for checkpoint parity: the offset conv
output is chunked into thirds (o1, o2, mask) and `concat(o1, o2)` feeds the
raw op's interleaved layout as-is (dcn_v2.py:181-186).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .dcn_v2 import dcn_v2_conv


class DCNv2Module(nn.Module):
    """Raw modulated deformable conv taking precomputed offset/mask."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    deformable_groups: int = 1

    @nn.compact
    def __call__(self, x, offset, mask):
        Cin = x.shape[-1]
        K = self.kernel_size
        n = Cin * K * K
        stdv = 1.0 / np.sqrt(n)
        weight = self.param(
            "weight",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -stdv, stdv),
            (self.features, Cin, K, K),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return dcn_v2_conv(
            x, offset, mask, weight, bias,
            self.stride, self.padding, self.dilation, self.deformable_groups,
        )


class _OffsetMaskConv(nn.Module):
    """Zero-initialized conv predicting (o1, o2, mask) (dcn_v2.py:163-174)."""

    kernel_size: int
    stride: int
    padding: int
    deformable_groups: int

    @nn.compact
    def __call__(self, fea):
        K = self.kernel_size
        ch = self.deformable_groups * 3 * K * K
        out = nn.Conv(
            ch, (K, K), strides=(self.stride,) * 2,
            padding=[(self.padding, self.padding)] * 2,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(fea)
        o1, o2, mask = jnp.split(out, 3, axis=-1)
        return jnp.concatenate([o1, o2], axis=-1), nn.sigmoid(mask)


class DCN(nn.Module):
    """Self-offset DCN (dcn_v2.py:149-196)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    deformable_groups: int = 1

    @nn.compact
    def __call__(self, x):
        offset, mask = _OffsetMaskConv(
            self.kernel_size, self.stride, self.padding, self.deformable_groups,
            name="conv_offset_mask",
        )(x)
        return DCNv2Module(
            self.features, self.kernel_size, self.stride, self.padding,
            self.dilation, self.deformable_groups, name="dcn",
        )(x, offset, mask)


class DCNSep(nn.Module):
    """Offsets from a second feature map (dcn_v2.py:197-227) — the
    feature-alignment module."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    deformable_groups: int = 1

    @nn.compact
    def __call__(self, x, fea):
        offset, mask = _OffsetMaskConv(
            self.kernel_size, self.stride, self.padding, self.deformable_groups,
            name="conv_offset_mask",
        )(fea)
        return DCNv2Module(
            self.features, self.kernel_size, self.stride, self.padding,
            self.dilation, self.deformable_groups, name="dcn",
        )(x, offset, mask)


# --------------------------------------------------------------------- #
# Deformable PSROI pooling

def dcn_v2_psroi_pooling(
    x: jax.Array,
    rois: jax.Array,
    trans: jax.Array | None,
    spatial_scale: float,
    pooled_size: int,
    output_dim: int,
    group_size: int = 1,
    part_size: int | None = None,
    sample_per_part: int = 4,
    trans_std: float = 0.0,
) -> jax.Array:
    """Deformable PSROI pooling (dcn_v2_psroi_pooling_cuda.cu:59-146).

    x: (B, H, W, C) with C == output_dim*group_size^2;
    rois: (N, 5) = (batch_idx, x1, y1, x2, y2);
    trans: (N, num_classes*2, part, part) offsets or None.
    Returns (N, pooled, pooled, output_dim).
    """
    B, H, W, C = x.shape
    part_size = part_size or pooled_size
    no_trans = trans is None
    num_classes = 1 if no_trans else trans.shape[1] // 2
    ch_each = output_dim // num_classes

    bidx = rois[:, 0].astype(jnp.int32)
    x0 = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    y0 = jnp.round(rois[:, 2]) * spatial_scale - 0.5
    x1 = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    y1 = (jnp.round(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    rw = jnp.maximum(x1 - x0, 0.1)
    rh = jnp.maximum(y1 - y0, 0.1)
    bin_w = rw / pooled_size  # (N,)
    bin_h = rh / pooled_size

    ph = jnp.arange(pooled_size)
    pw = jnp.arange(pooled_size)
    part_h = jnp.floor(ph / pooled_size * part_size).astype(jnp.int32)  # (P,)
    part_w = jnp.floor(pw / pooled_size * part_size).astype(jnp.int32)
    gh = jnp.clip((ph * group_size) // pooled_size, 0, group_size - 1)
    gw = jnp.clip((pw * group_size) // pooled_size, 0, group_size - 1)

    ct = jnp.arange(output_dim)
    class_id = ct // ch_each  # (D,)

    if no_trans:
        tx = jnp.zeros((rois.shape[0], output_dim, pooled_size, pooled_size))
        ty = jnp.zeros_like(tx)
    else:
        # trans[(n, class, 2, part, part)]
        tr = trans.reshape(rois.shape[0], num_classes, 2, part_size, part_size)
        tx = tr[:, class_id, 0][:, :, part_h][:, :, :, part_w] * trans_std  # (N,D,P,P)
        ty = tr[:, class_id, 1][:, :, part_h][:, :, :, part_w] * trans_std

    # sample grid: (N, D, P, P, s, s)
    wstart = (pw[None, None, None, :] * bin_w[:, None, None, None]
              + x0[:, None, None, None] + tx * rw[:, None, None, None])
    hstart = (ph[None, None, :, None] * bin_h[:, None, None, None]
              + y0[:, None, None, None] + ty * rh[:, None, None, None])
    sub_w = (bin_w / sample_per_part)[:, None, None, None, None, None]
    sub_h = (bin_h / sample_per_part)[:, None, None, None, None, None]
    iw = jnp.arange(sample_per_part)
    sw = wstart[..., None, None] + iw[None, None, None, None, None, :] * sub_w
    sh = hstart[..., None, None] + iw[None, None, None, None, :, None] * sub_h

    valid = (sw >= -0.5) & (sw <= W - 0.5) & (sh >= -0.5) & (sh <= H - 0.5)
    swc = jnp.clip(sw, 0.0, W - 1.0)
    shc = jnp.clip(sh, 0.0, H - 1.0)

    # position-sensitive channel: c = (ct*G + gh)*G + gw  -> (D, P, P)
    chan = (ct[:, None, None] * group_size + gh[None, :, None]) * group_size + gw[None, None, :]

    # bilinear gather from x[bidx] at channel chan
    h0 = jnp.floor(shc)
    w0 = jnp.floor(swc)
    lh = shc - h0
    lw = swc - w0
    val = 0.0
    xb = x[bidx]  # (N, H, W, C)
    for dy, dx, wt in ((0, 0, (1 - lh) * (1 - lw)), (0, 1, (1 - lh) * lw),
                       (1, 0, lh * (1 - lw)), (1, 1, lh * lw)):
        hi = jnp.clip(h0.astype(jnp.int32) + dy, 0, H - 1)
        wi = jnp.clip(w0.astype(jnp.int32) + dx, 0, W - 1)
        flat = hi * W + wi  # (N, D, P, P, s, s)
        cexp = jnp.broadcast_to(chan[None, :, :, :, None, None], flat.shape)
        gathered = jax.vmap(
            lambda img, f, c: img.reshape(H * W, C)[f, c]
        )(xb, flat.reshape(flat.shape[0], -1), cexp.reshape(flat.shape[0], -1))
        gathered = gathered.reshape(flat.shape)
        val = val + wt * gathered
    val = jnp.where(valid, val, 0.0)
    cnt = valid.sum(axis=(-1, -2))
    pooled = jnp.where(cnt > 0, val.sum(axis=(-1, -2)) / jnp.maximum(cnt, 1), 0.0)
    return pooled.transpose(0, 2, 3, 1)  # (N, P, P, D)
