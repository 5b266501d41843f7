"""UNet3d_18: detail-restoration branch (3D R3D-18 encoder + transpose-conv
decoder with SE gating).

Reference: models/Ours/model_singleframe.py:170-223 (UNet3d_18),
models/model_misc/resnet_3D.py (r3d_18 encoder, `bn=False` -> all
batchnorms are identity, which is how the model is instantiated:
model_singleframe.py:269).

TPU-first layout: the temporal extent is always T=2 (the frame pair) and
every temporal stride is 1, so the whole branch computes in a
**T-packed** NHWC layout ``(B, H, W, 2C)`` = [t0-channels | t1-channels].
Each 3-tap temporal conv becomes ONE 2D conv with a block-structured
packed weight built on the fly from the ordinary (kd, kh, kw, I, O)
parameters (checkpoint layout unchanged):

    out_t = sum_dt W[dt+1] * x[t+dt]  (x outside {0,1} is zero)
    => Wpk = [[W1, W0], [W2, W1]]  (input-major, output-minor blocks)

This quadruples effective channel width (16->32 ... 64->128), cutting the
lane-padding waste that made the small-channel 3D convs bandwidth-bound.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from .layers import kaiming_out_init, torch_default_bias_init, torch_default_kernel_init


def _pack_weight_t3(k: jax.Array) -> jax.Array:
    """(3, kh, kw, I, O) temporal-3-tap kernel -> packed (kh, kw, 2I, 2O)."""
    top = jnp.concatenate([k[1], k[0]], axis=-1)     # x0 -> [out0 | out1]
    bot = jnp.concatenate([k[2], k[1]], axis=-1)     # x1 -> [out0 | out1]
    return jnp.concatenate([top, bot], axis=-2)       # stack on input axis


def _pack_weight_t1(k: jax.Array) -> jax.Array:
    """(1, kh, kw, I, O) -> block-diagonal packed (kh, kw, 2I, 2O)."""
    zero = jnp.zeros_like(k[0])
    top = jnp.concatenate([k[0], zero], axis=-1)
    bot = jnp.concatenate([zero, k[0]], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _pack(kernel: jax.Array) -> jax.Array:
    kd = kernel.shape[0]
    if kd == 3:
        return _pack_weight_t3(kernel)
    if kd == 1:
        return _pack_weight_t1(kernel)
    raise ValueError(f"unsupported temporal extent {kd}")


def _head_weight_l2(w7: jax.Array) -> jax.Array:
    """Reflect-7x7 head weight (7, 7, C, 3) -> VALID 3x3 block conv
    (3, 3, 16C, 48) over the NESTED 4x4 packing (outer 2x2 of inner 2x2,
    channel groups (a2 b2)(a1 b1)(c)) of the full-res fused features.

    Out full-res row y = 4i + ao reads row y + dy - 3 = 4(i + di - 1) + ai,
    so dy = 4(di - 1) + ai - ao + 3 (structural zeros outside [0, 7));
    same for columns.  Output channels nested (ao2 bo2)(ao1 bo1)(rgb), so
    one depth_to_space yields the standard 2x2 packing of the RGB image."""
    k, _, C, Co = w7.shape
    S = np.zeros((3, 4, 4, k), np.float32)
    for di in range(3):
        for ai in range(4):
            for ao in range(4):
                dy = 4 * (di - 1) + ai - ao + 3
                if 0 <= dy < k:
                    S[di, ai, ao, dy] = 1.0
    Sj = jnp.asarray(S, w7.dtype)
    # [i, j, a, b, c, u, v, o] with a,b canonical in-phases; u,v out-phases
    Wc = jnp.einsum("iauy,jbvx,yxco->ijabcuvo", Sj, Sj, w7)
    Wc = Wc.reshape(3, 3, 2, 2, 2, 2, C, 2, 2, 2, 2, Co)
    # [i j a2 a1 b2 b1 c u2 u1 v2 v1 o] -> [i j a2 b2 a1 b1 c u2 v2 u1 v1 o]
    Wc = Wc.transpose(0, 1, 2, 4, 3, 5, 6, 7, 9, 8, 10, 11)
    return Wc.reshape(3, 3, 16 * C, 16 * Co)


def _reflect_pad_blocks4(x: jax.Array, C: int) -> jax.Array:
    """Pad a NESTED 4x4 packing (B, hb, wb, 16C) by one border block per
    side with torch ReflectionPad(3) semantics on the underlying full-res
    grid.  Border blocks are channel-group shuffles of the first/last two
    interior blocks (full row -1 = row 1, -2 = 2, -3 = 3; row H+k = row
    H-2-k), assembled from contiguous slices."""
    B, hb, wb, _ = x.shape

    def border(t, axis, blkmap):
        """One border block along `axis`: output phase p (row/col phase of
        the border block) <- interior block blkmap[p][0], phase blkmap[p][1]."""
        groups = []
        for g_out in range(16):
            a2, b2 = g_out // 8, (g_out // 4) % 2
            a1, b1 = (g_out // 2) % 2, g_out % 2
            if axis == 1:
                p = 2 * a2 + a1
                blk, pp = blkmap[p]
                a2s, a1s = pp // 2, pp % 2
                gs = (a2s * 2 + b2) * 4 + (a1s * 2 + b1)
                groups.append(t[:, blk : blk + 1, :, gs * C : (gs + 1) * C])
            else:
                p = 2 * b2 + b1
                blk, pp = blkmap[p]
                b2s, b1s = pp // 2, pp % 2
                gs = (a2 * 2 + b2s) * 4 + (a1 * 2 + b1s)
                groups.append(t[:, :, blk : blk + 1, gs * C : (gs + 1) * C])
        return jnp.concatenate(groups, axis=-1)

    # top border block (full rows -4..-1): phase 0 = row -4 -> row 4
    # (block 1 phase 0, never read by the conv but filled correctly);
    # phases 1..3 = rows -3..-1 -> rows 3..1 (block 0 phases 3..1)
    topmap = {0: (1, 0), 1: (0, 3), 2: (0, 2), 3: (0, 1)}
    # bottom border block (rows H..H+3): rows H..H+2 -> H-2..H-4 (block
    # hb-1 phases 2, 1, 0); phase 3 unused
    botmap = {0: (hb - 1, 2), 1: (hb - 1, 1), 2: (hb - 1, 0), 3: (hb - 1, 3)}
    xr = jnp.concatenate([border(x, 1, topmap), x, border(x, 1, botmap)], axis=1)
    leftmap = {0: (1, 0), 1: (0, 3), 2: (0, 2), 3: (0, 1)}
    rightmap = {0: (wb - 1, 2), 1: (wb - 1, 1), 2: (wb - 1, 0), 3: (wb - 1, 3)}
    return jnp.concatenate(
        [border(xr, 2, leftmap), xr, border(xr, 2, rightmap)], axis=2
    )


def _stem_weight_l2(kernel: jax.Array, half: int, dtype) -> jax.Array:
    """Detail-stem weight (3, 7, 7, 3, c0), one image half, composed onto
    the NESTED 4x4 packing of the images producing the 2x2 packing of the
    (H/2, W/2) feature grid: (3, 3, 48, 8c0), VALID over a one-block zero
    pad.  Out 360-grid row r = 2I + ao reads full row 2r + dy - 3 =
    4(I + dB - 1) + ai -> dy = 4(dB - 1) + ai - 2 ao + 3.  half: 0 = frame
    (t0) input rows, 1 = sharp (t1)."""
    wpk = _pack(kernel.astype(dtype))  # (7, 7, 6, 2c0)
    wh = wpk[:, :, 3 * half : 3 * half + 3, :]
    k = 7
    S = np.zeros((3, 4, 2, k), np.float32)
    for dB in range(3):
        for ai in range(4):
            for ao in range(2):
                dy = 4 * (dB - 1) + ai - 2 * ao + 3
                if 0 <= dy < k:
                    S[dB, ai, ao, dy] = 1.0
    Sj = jnp.asarray(S, dtype)
    # [i, j, a, b, c, u, v, o]; a, b canonical 4-phases; u, v out 2-phases
    W = jnp.einsum("iauy,jbvx,yxco->ijabcuvo", Sj, Sj, wh)
    C2o = wh.shape[-1]
    W = W.reshape(3, 3, 2, 2, 2, 2, 3, 2, 2, C2o)
    # -> nested input (a2 b2 a1 b1 c), output (u v)(o)
    W = W.transpose(0, 1, 2, 4, 3, 5, 6, 7, 8, 9)
    return W.reshape(3, 3, 48, 4 * C2o)


def _conv3s2_weight_packed(wpk: jax.Array) -> jax.Array:
    """Stride-2 SAME 3x3 conv weight (3, 3, I, O) composed onto a STANDARD
    2x2 packing of its input: VALID 2x2 block conv (2, 2, 4I, O) over a
    one-block top/left pad.  Out row i reads rows 2i + dy - 1 =
    2(i - 1 + dB) + ai -> dy = 2 dB + ai - 1."""
    S = np.zeros((2, 2, 3), np.float32)
    for dB in range(2):
        for ai in range(2):
            dy = 2 * dB + ai - 1
            if 0 <= dy < 3:
                S[dB, ai, dy] = 1.0
    Sj = jnp.asarray(S, wpk.dtype)
    I, O = wpk.shape[2], wpk.shape[3]
    W = jnp.einsum("Day,Ebx,yxco->DEabco", Sj, Sj, wpk)
    return W.reshape(2, 2, 4 * I, O)


def _stem_weight_s2d(kernel: jax.Array, dtype) -> jax.Array:
    """Detail-stem (3, 7, 7, 3, c0) temporal-packed then s2d-transformed:
    (4, 4, 24, 2c0) consuming the standard 2x2 packing of the images."""
    from ..ops.s2d import conv7s2_weight_to_s2d

    return conv7s2_weight_to_s2d(_pack(kernel.astype(dtype)))


def _concat_packed(a: jax.Array, b: jax.Array) -> jax.Array:
    """Channel-concat of two packed tensors, preserving [t0 | t1] halves."""
    ca = a.shape[-1] // 2
    cb = b.shape[-1] // 2
    return jnp.concatenate(
        [a[..., :ca], b[..., :cb], a[..., ca:], b[..., cb:]], axis=-1
    )


class _PConv(nn.Module):
    """Packed conv3d (temporal stride 1): params identical to a torch
    Conv3d (stored DHWIO), executed as one 2D conv on packed tensors."""

    features: int
    kernel_size: Tuple[int, int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    kernel_init: object = None

    @nn.compact
    def __call__(self, x):  # (B, H, W, 2I)
        Cin = x.shape[-1] // 2
        kshape = (*self.kernel_size, Cin, self.features)
        init = self.kernel_init or torch_default_kernel_init()
        kernel = self.param("kernel", init, kshape)
        wpk = _pack(kernel.astype(x.dtype))
        y = lax.conv_general_dilated(
            x, wpk, self.stride,
            [(self.padding[0],) * 2, (self.padding[1],) * 2],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            fan_in = Cin * int(np.prod(self.kernel_size))
            bias = self.param("bias", torch_default_bias_init(fan_in), (self.features,))
            y = y + jnp.tile(bias.astype(x.dtype), 2)
        return y


class _PConvTranspose(nn.Module):
    """Packed ConvTranspose3d, stride (1, 2, 2): spatial transposed conv via
    input dilation, temporal taps packed (flipped, pad kd-1-pd=1)."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 4, 4)
    padding: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x):  # (B, H, W, 2I)
        Cin = x.shape[-1] // 2
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_out", "uniform"),
            (*k, self.features, Cin),
        )
        flipped = jnp.flip(kernel, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)  # DHWIO
        wpk = _pack(flipped.astype(x.dtype))
        pads = [(k[1] - 1 - self.padding[1],) * 2, (k[2] - 1 - self.padding[2],) * 2]
        y = lax.conv_general_dilated(
            x, wpk, (1, 1), pads, lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        fan_in = Cin * int(np.prod(k))
        bias = self.param("bias", torch_default_bias_init(fan_in), (self.features,))
        return y + jnp.tile(bias.astype(x.dtype), 2)


class _PSEGating(nn.Module):
    """SEGating on packed tensors (resnet_3D.py:89-105): the reference
    pools over (T, H, W), i.e. the mean of both packed halves."""

    @nn.compact
    def __call__(self, x):  # (B, H, W, 2C)
        C = x.shape[-1] // 2
        pooled = 0.5 * (
            jnp.mean(x[..., :C], axis=(1, 2), keepdims=True)
            + jnp.mean(x[..., C:], axis=(1, 2), keepdims=True)
        )  # (B, 1, 1, C)
        w = self.param("kernel", torch_default_kernel_init(), (1, 1, 1, C, C))
        gate = (
            jnp.einsum("bhwc,co->bhwo", pooled, w[0, 0, 0].astype(x.dtype))
            + self.param("bias", torch_default_bias_init(C), (C,)).astype(x.dtype)
        )
        gate = nn.sigmoid(gate)
        return x * jnp.tile(gate, (1, 1, 1, 2))


# Keep the original param names so the checkpoint converter's Conv3D
# sub-tree layout ("Conv3D_0": {kernel, bias}) is preserved.
class _SEWrap(nn.Module):
    @nn.compact
    def __call__(self, x):
        return _PSEGating(name="Conv3D_0")(x)


class _BasicBlock3D(nn.Module):
    """R3D BasicBlock with SEGating, bn-free (resnet_3D.py:108-141)."""

    planes: int
    stride: Tuple[int, int] = (1, 1)
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        out = _PConv(
            self.planes, (3, 3, 3), self.stride, (1, 1), use_bias=False,
            kernel_init=kaiming_out_init(), name="conv1",
        )(x)
        out = nn.relu(out)
        out = _PConv(
            self.planes, (3, 3, 3), (1, 1), (1, 1), use_bias=False,
            kernel_init=kaiming_out_init(), name="conv2",
        )(out)
        out = _SEWrap(name="fg")(out)
        if self.downsample:
            residual = _PConv(
                self.planes, (1, 1, 1), self.stride, (0, 0), use_bias=False,
                kernel_init=kaiming_out_init(), name="downsample",
            )(x)
        return nn.relu(out + residual)


class _Encoder3D(nn.Module):
    """r3d_18 (resnet_3D.py:218-327): stem + 4 layers of 2 BasicBlocks.

    fast: run layer1 (the only stride-1 stage at full feature resolution)
    in 2x2 space-to-depth form — both 3x3 convs become VALID 2x2 block
    convs at 4x channel width; each BasicBlock maps the shifted packing to
    itself (conv1: shifted->standard, conv2: standard->shifted-equivalent,
    residual aligns via the pixel-pair identity), so the two blocks chain
    with a single pack/unpack around the stage.
    """

    channels: Sequence[int]
    fast: bool = False

    @nn.compact
    def __call__(self, x, stem_pre=None, img1_pk=None):
        """x: packed images (B, H, W, 2*3), or None when the frame half of
        the stem was hoisted (stem_pre) and the sharp half arrives s2d-
        packed (img1_pk)."""
        c0, c1, c2, c3 = self.channels
        stem_mod = _PConv(
            c0, (3, 7, 7), (2, 2), (3, 3), use_bias=False,
            kernel_init=kaiming_out_init(), name="stem",
        )
        if (
            self.fast
            and not self.is_initializing()
            and stem_pre is not None
            and stem_pre.shape[-1] == 8 * c0
        ):
            # production packed pipeline: stem_pre is the l2-composed frame
            # half; stem + layer1 + layer2_0 run on the (H/4, W/4) packed
            # grid and the x0/x1 skips are returned PACKED (the decoder's
            # packed path consumes them without relayouts)
            return self._packed_l2_path(stem_mod, stem_pre, img1_pk)
        fast_stem = (
            self.fast
            and not self.is_initializing()
            and (x is None or (x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0))
        )
        if fast_stem:
            # 7x7/2 conv on 6 channels is lane-starved; run it as a 4x4
            # VALID block conv over the 2x2 packing (ops/s2d.py)
            from ..ops.s2d import conv7s2_s2d, space_to_depth

            w4 = _stem_weight_s2d(stem_mod.variables["params"]["kernel"],
                                  (x if x is not None else img1_pk).dtype)
            if stem_pre is not None:
                ws = w4.reshape(4, 4, 4, 6, -1)[:, :, :, 3:]
                ws = ws.reshape(4, 4, 12, w4.shape[-1])
                x0 = nn.relu(stem_pre + conv7s2_s2d(img1_pk, ws))
            else:
                # consume [frame_pk | sharp_pk] concat via an input-channel
                # permutation of the packed weight (no interleave gather)
                f_pk = space_to_depth(x[..., :3])
                s_pk = space_to_depth(x[..., 3:])
                perm = np.concatenate(
                    [np.arange(4)[:, None] * 6 + np.arange(3),
                     np.arange(4)[:, None] * 6 + 3 + np.arange(3)]
                ).reshape(-1)
                x0 = nn.relu(conv7s2_s2d(
                    jnp.concatenate([f_pk, s_pk], axis=-1), w4[:, :, perm, :]
                ))
        else:
            x0 = nn.relu(stem_mod(x))
        b10 = _BasicBlock3D(c0, name="layer1_0")
        b11 = _BasicBlock3D(c0, name="layer1_1")
        if self.fast and not self.is_initializing() and x0.shape[1] % 2 == 0 and x0.shape[2] % 2 == 0:
            x1 = self._layer1_s2d(x0, (b10, b11), c0)
        else:
            x1 = b11(b10(x0))
        x2 = _BasicBlock3D(c1, (2, 2), downsample=True, name="layer2_0")(x1)
        x2 = _BasicBlock3D(c1, name="layer2_1")(x2)
        x3 = _BasicBlock3D(c2, (2, 2), downsample=True, name="layer3_0")(x2)
        x3 = _BasicBlock3D(c2, name="layer3_1")(x3)
        x4 = _BasicBlock3D(c3, (1, 1), downsample=True, name="layer4_0")(x3)
        x4 = _BasicBlock3D(c3, name="layer4_1")(x4)
        return x0, x1, x2, x3, x4

    def _packed_l2_path(self, stem_mod, stem_pre, img1_pk):
        """stem (sharp half) + layer1 + layer2_0 on the packed grid; the
        deeper layers proceed normally from layer2_0's unpacked output.
        Returns (x0_pk, x1_pk, x2, x3, x4) with x0/x1 STANDARD-2x2-packed."""
        from jax import lax

        from ..ops.s2d import shift_packed, shifted_to_standard, space_to_depth

        c0, c1, c2, c3 = self.channels
        dt = img1_pk.dtype
        wsh = _stem_weight_l2(stem_mod.variables["params"]["kernel"], 1, dt)
        sp = jnp.pad(
            space_to_depth(img1_pk), ((0, 0), (1, 1), (1, 1), (0, 0))
        )
        x0_pk = nn.relu(stem_pre + lax.conv_general_dilated(
            sp, wsh, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ))  # (N, hb, wb, 8c0) standard packing of the (H/2, W/2) grid
        hb, wb = x0_pk.shape[1], x0_pk.shape[2]

        b10 = _BasicBlock3D(c0, name="layer1_0")
        b11 = _BasicBlock3D(c0, name="layer1_1")
        xs = self._layer1_blocks_shifted(
            shift_packed(x0_pk), (b10, b11), c0, 2 * hb, 2 * wb
        )
        x1_pk = shifted_to_standard(xs)

        b20 = _BasicBlock3D(c1, (2, 2), downsample=True, name="layer2_0")
        x2 = self._layer2_0_packed(x1_pk, b20, c1)
        x2 = _BasicBlock3D(c1, name="layer2_1")(x2)
        x3 = _BasicBlock3D(c2, (2, 2), downsample=True, name="layer3_0")(x2)
        x3 = _BasicBlock3D(c2, name="layer3_1")(x3)
        x4 = _BasicBlock3D(c3, (1, 1), downsample=True, name="layer4_0")(x3)
        x4 = _BasicBlock3D(c3, name="layer4_1")(x4)
        return x0_pk, x1_pk, x2, x3, x4

    def _layer2_0_packed(self, x1_pk, block, c1: int):
        """layer2_0 (stride-2 BasicBlock) consuming the packed x1: conv1
        composes to a VALID 2x2 block conv (one output pixel per block),
        the 1x1 stride-2 downsample is a phase-(0,0) channel slice, and
        conv2/SE run on the unpacked half-res output."""
        from jax import lax

        dt = x1_pk.dtype
        B = x1_pk.shape[0]
        bv = block.variables["params"]
        w1 = _conv3s2_weight_packed(_pack(bv["conv1"]["kernel"].astype(dt)))
        xp = jnp.pad(x1_pk, ((0, 0), (1, 0), (1, 0), (0, 0)))
        out = lax.conv_general_dilated(
            xp, w1, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = nn.relu(out)
        out = lax.conv_general_dilated(
            out, _pack(bv["conv2"]["kernel"].astype(dt)), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # SEGating flat
        pooled = jnp.mean(out, axis=(1, 2)).reshape(B, 2, c1).mean(axis=1)
        gv = bv["fg"]["Conv3D_0"]
        gate = nn.sigmoid(pooled @ gv["kernel"][0, 0, 0].astype(dt)
                          + gv["bias"].astype(dt))
        out = out * jnp.tile(gate, (1, 2))[:, None, None, :]
        # downsample (1x1 stride 2, no bias): rows/cols (2i, 2j) = the
        # phase-(0,0) channel group of the packing
        wd = _pack_weight_t1(bv["downsample"]["kernel"].astype(dt))  # (1,1,2c0,2c1)
        res = x1_pk[..., : x1_pk.shape[-1] // 4] @ wd[0, 0]
        return nn.relu(out + res)

    def _layer1_s2d(self, x0, blocks, C: int):
        """Both layer-1 BasicBlocks on the 2x2 shifted packing."""
        from ..ops.s2d import depth_to_space, shift_packed, space_to_depth

        B, H, W, C2 = x0.shape  # C2 = 2C (T-packed)
        xs = shift_packed(space_to_depth(x0))  # (B, h+1, w+1, 4*2C)
        xs = self._layer1_blocks_shifted(xs, blocks, C, H, W)
        full = depth_to_space(xs)  # (B, 2h+2, 2w+2, 2C) incl. border pixels
        return full[:, 1 : H + 1, 1 : W + 1]

    def _layer1_blocks_shifted(self, xs, blocks, C: int, H: int, W: int):
        """The layer-1 block loop on an already-shifted packing (each block
        maps the shifted packing to itself); H, W are the full feature-grid
        dims (for the SE pooling count)."""
        from ..ops.s2d import (
            conv3x3_weight_to_s2d,
            conv2x2_valid,
            shifted_phase_mask,
        )

        dt = xs.dtype
        B = xs.shape[0]
        h, w = H // 2, W // 2

        # odd-alignment boundary mask: pixel rows -1/H live in the first
        # block row's a=0 half and last row's a=1 half (same for columns)
        mask = shifted_phase_mask(h, w, 2 * C, dt)

        pad1 = lambda t: jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
        for block in blocks:
            bv = block.variables["params"]
            w1 = conv3x3_weight_to_s2d(_pack(bv["conv1"]["kernel"].astype(dt)))
            w2 = conv3x3_weight_to_s2d(_pack(bv["conv2"]["kernel"].astype(dt)))
            a = nn.relu(conv2x2_valid(xs, w1))           # (h, w) standard
            o = conv2x2_valid(pad1(a), w2)               # (h+1, w+1) shifted
            o = o * mask
            # SEGating (resnet_3D.py:89-105): mean over (T, H, W) per
            # channel — boundary zeros don't contribute; divide by the
            # true element count, not the padded grid.  Flat form: pool
            # the big tensor in its native layout, collapse the 4 phase x
            # 2 t groups on the (B, 8C) pooled vector (tiny-trailing-dim
            # reshapes of the big tensor force Mosaic relayouts).
            pooled = o.sum(axis=(1, 2)).reshape(B, 8, C).sum(axis=1)
            pooled = pooled / jnp.asarray(2 * H * W, dt)
            gv = bv["fg"]["Conv3D_0"]
            gate = nn.sigmoid(pooled @ gv["kernel"][0, 0, 0].astype(dt)
                              + gv["bias"].astype(dt))
            o = o * jnp.tile(gate, (1, 8))[:, None, None, :]
            xs = nn.relu(o + xs)

        return xs


class _ConvSE(nn.Module):
    """Conv_3d: conv3d + SEGating (resnet_3D.py:407-417)."""

    features: int

    @nn.compact
    def __call__(self, x):
        y = _PConv(self.features, (3, 3, 3), (1, 1), (1, 1), name="conv")(x)
        return _SEWrap(name="fg")(y)


class _UpConvSE(nn.Module):
    """upConv3D transpose mode (resnet_3D.py:382-405)."""

    features: int

    @nn.compact
    def __call__(self, x):
        y = _PConvTranspose(self.features, name="upconv")(x)
        return _SEWrap(name="fg")(y)


class UNet3d18(nn.Module):
    """Full detail branch (model_singleframe.py:170-223).

    fast_tail: execution variant — run the full-resolution tail (dec4
    transposed conv, fuse, reflect-pad 7x7 head) in space-to-depth form
    (ops/s2d.py): the stride-2 transpose becomes one 3x3 block conv
    64->128ch and the 7x7 head a 4x4 block conv over a reflect-shifted
    packing, so no full-res intermediate ever hits HBM.  Same math up to
    float reassociation; params and checkpoints unchanged.
    """

    channels: Sequence[int] = (32, 64, 96, 128)
    fast_tail: bool = False

    @nn.compact
    def __call__(
        self,
        img0: Optional[jax.Array],
        img1: jax.Array,
        mode: str = "full",
        stem_pre: Optional[jax.Array] = None,
        packed_io: bool = False,
    ) -> jax.Array:
        """img0, img1: (B, H, W, 3) with H, W divisible by 8 -> (B, H, W, 3).

        mode='stem_hoist' returns the frame (img0) half of the stem conv —
        T-independent, shared across a multi-timestamp sweep; pass it back
        as `stem_pre` (with img0=None) so only the sharp half runs
        per-timestamp.  fast_tail only.

        packed_io (with stem_pre): img1 arrives as the standard 2x2
        space-to-depth packing (B, H/2, W/2, 12) and the result is returned
        in the same packing — the caller fuses the residual add and the
        single depth_to_space (see EVFIAutoEx.from_timestamp_shared)."""
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        rc = list(self.channels)[::-1]  # e.g. [64, 32, 24, 16]

        enc = _Encoder3D(self.channels, fast=self.fast_tail, name="encoder")
        if mode == "stem_hoist":
            from jax import lax

            from ..ops.s2d import conv7s2_s2d, space_to_depth

            if img0.shape[1] % 8 == 0 and img0.shape[2] % 8 == 0:
                # l2 form: the hoisted frame half lives on the (H/4, W/4)
                # packed grid, enabling the fully-packed encoder pipeline
                wf = _stem_weight_l2(
                    enc.variables["params"]["stem"]["kernel"], 0, img0.dtype
                )
                sp = jnp.pad(
                    space_to_depth(space_to_depth(img0)),
                    ((0, 0), (1, 1), (1, 1), (0, 0)),
                )
                return lax.conv_general_dilated(
                    sp, wf, (1, 1), [(0, 0), (0, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            w4 = _stem_weight_s2d(
                enc.variables["params"]["stem"]["kernel"], img0.dtype
            )
            wf = w4.reshape(4, 4, 4, 6, -1)[:, :, :, :3]
            wf = wf.reshape(4, 4, 12, w4.shape[-1])
            return conv7s2_s2d(space_to_depth(img0), wf)

        if stem_pre is not None:
            from ..ops.s2d import space_to_depth

            img1_pk = img1 if packed_io else space_to_depth(img1)
            x0, x1, x2, x3, x4 = enc(None, stem_pre=stem_pre, img1_pk=img1_pk)
        else:
            images = jnp.concatenate([img0, img1], axis=-1)  # packed (B, H, W, 6)
            x0, x1, x2, x3, x4 = enc(images)

        fast = self.fast_tail and not self.is_initializing()

        dec0 = _ConvSE(rc[1], name="dec0")
        dec1 = _UpConvSE(rc[2], name="dec1")
        dec2 = _UpConvSE(rc[3], name="dec2")
        dec3 = _ConvSE(rc[3], name="dec3")
        dec4 = _UpConvSE(rc[3], name="dec4")
        fuse = nn.Conv(
            rc[3], (1, 1), use_bias=False,
            kernel_init=nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            name="feature_fuse",
        )
        outconv = nn.Conv(
            3, (7, 7), padding="VALID",
            kernel_init=nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            bias_init=torch_default_bias_init(rc[3] * 49),
            name="outconv",
        )

        if fast:
            # skip concats stay VIRTUAL (pairs of tensors): materializing
            # _concat_packed's interleaved layout before a conv costs
            # layout conversions; consumers split their kernels by input
            # rows instead (conv(concat(a, b)) == conv_a(a) + conv_b(b))
            d3 = (lrelu(dec0(x4)), x3)
            d2 = (lrelu(self._upconv_fast(dec1, d3, rc[2])), x2)
            if x0.shape[-1] == 8 * self.channels[0]:
                # packed skips from the l2 encoder pipeline: no relayouts
                from ..ops.s2d import shift_packed

                dec2_pk = lrelu(self._upconv_fast(dec2, d2, rc[3], packed_out=True))
                d0a_sh = lrelu(self._convse_fast_packed(dec3, (dec2_pk, x1), rc[3]))
                d0 = (d0a_sh, shift_packed(x0))
                return self._s2d_tail_l2(
                    d0, dec4, fuse, outconv, rc[3],
                    packed_out=packed_io, pre_shifted=True,
                )
            if x0.shape[1] % 4 == 0 and x0.shape[2] % 4 == 0:
                # packed decoder: dec2's block conv keeps its s2d output,
                # dec3 runs as 256-lane packed convs emitting the shifted
                # packing the l2 tail consumes directly
                from ..ops.s2d import shift_packed, space_to_depth

                dec2_pk = lrelu(self._upconv_fast(dec2, d2, rc[3], packed_out=True))
                d1_pk = (dec2_pk, space_to_depth(x1))
                d0a_sh = lrelu(self._convse_fast_packed(dec3, d1_pk, rc[3]))
                d0 = (d0a_sh, shift_packed(space_to_depth(x0)))
                return self._s2d_tail_l2(
                    d0, dec4, fuse, outconv, rc[3],
                    packed_out=packed_io, pre_shifted=True,
                )
            d1 = (lrelu(self._upconv_fast(dec2, d2, rc[3])), x1)
            d0 = (lrelu(self._convse_fast(dec3, d1, rc[3])), x0)
            if d0[0].shape[1] % 2 == 0 and d0[0].shape[2] % 2 == 0:
                return self._s2d_tail_l2(
                    d0, dec4, fuse, outconv, rc[3], packed_out=packed_io
                )
            return self._s2d_tail(d0, dec4, fuse, outconv, rc[3], packed_out=packed_io)

        d3 = _concat_packed(lrelu(dec0(x4)), x3)
        d2 = _concat_packed(lrelu(dec1(d3)), x2)
        d1 = _concat_packed(lrelu(dec2(d2)), x1)
        d0 = _concat_packed(lrelu(dec3(d1)), x0)
        dout = lrelu(dec4(d0))
        # packed [t0 | t1] IS the reference's unbind-then-concat layout
        # (model_singleframe.py:218)
        fused = lrelu(fuse(dout))
        padded = jnp.pad(fused, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        return outconv(padded)

    @staticmethod
    def _split_rows(w, ca: int, cb: int):
        """Split a conv weight consuming the packed concat
        [a.t0 | b.t0 | a.t1 | b.t1] (channel axis -2) into the a/b parts,
        each reassembled in [t0 | t1] order."""
        wa = jnp.concatenate(
            [w[..., :ca, :], w[..., ca + cb : 2 * ca + cb, :]], axis=-2
        )
        wb = jnp.concatenate(
            [w[..., ca : ca + cb, :], w[..., 2 * ca + cb :, :]], axis=-2
        )
        return wa, wb

    def _upconv_fast(self, mod, x, cout: int, packed_out: bool = False):
        """_UpConvSE via a 3x3 block conv (no lhs_dilation transpose):
        conv to the s2d-packed output, SE-gate in packed space (pooling
        over phases == pooling over H, W), then depth-to-space (skipped
        when packed_out — the consumer stays in packed space).

        x may be a (a, b) pair representing a virtual packed concat; the
        block-conv weight is split by input rows and the part convs sum.
        """
        from ..ops.s2d import depth_to_space, transpose_conv_weight_to_s2d

        parts = x if isinstance(x, tuple) else (x,)
        dt = parts[0].dtype
        B, h, w, _ = parts[0].shape
        dv = mod.variables["params"]
        k = dv["upconv"]["kernel"].astype(dt)
        flipped = jnp.flip(k, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
        wpk = _pack(flipped)
        wt = transpose_conv_weight_to_s2d(wpk)  # (3, 3, 2Ci, 8Co)
        if len(parts) == 2:
            ws = self._split_rows(
                wt, parts[0].shape[-1] // 2, parts[1].shape[-1] // 2
            )
        else:
            ws = (wt,)
        conv = lambda t, wk: lax.conv_general_dilated(
            jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0))), wk, (1, 1),
            [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = sum(conv(t, wk) for t, wk in zip(parts, ws)).astype(dt)
        y = y + jnp.tile(dv["upconv"]["bias"].astype(dt), 8)

        # flat SE gating: no (.., 8, cout) trailing-dim reshape of the big
        # tensor (tiny trailing dims force Mosaic relayouts) — pool flat,
        # collapse the 8 phase groups on the (B, 8*cout) pooled vector,
        # broadcast the gate back by channel tiling
        pooled = jnp.mean(y, axis=(1, 2)).reshape(B, 8, cout).mean(axis=1)
        gk = dv["fg"]["Conv3D_0"]["kernel"][0, 0, 0].astype(dt)
        gb = dv["fg"]["Conv3D_0"]["bias"].astype(dt)
        gate = nn.sigmoid(pooled @ gk + gb)
        y = y * jnp.tile(gate, (1, 8))[:, None, None, :]
        if packed_out:
            return y  # standard 2x2 packing, channels (a b)(t)(co)
        # packed channel layout is (phase)(t)(c); depth_to_space expects
        # phase-major which this is — unpack to (2h, 2w, 2*cout)
        return depth_to_space(y)

    def _convse_fast(self, mod, x, cout: int):
        """_ConvSE on a virtual packed concat: the conv splits into part
        convs (no interleaved concat materialization), then SE gating."""
        parts = x if isinstance(x, tuple) else (x,)
        dt = parts[0].dtype
        B, H, W, _ = parts[0].shape
        dv = mod.variables["params"]
        wpk = _pack(dv["conv"]["kernel"].astype(dt))  # (3, 3, 2Ci, 2Co)
        if len(parts) == 2:
            ws = self._split_rows(
                wpk, parts[0].shape[-1] // 2, parts[1].shape[-1] // 2
            )
        else:
            ws = (wpk,)
        conv = lambda t, wk: lax.conv_general_dilated(
            t, wk, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = sum(conv(t, wk) for t, wk in zip(parts, ws)).astype(dt)
        y = y + jnp.tile(dv["conv"]["bias"].astype(dt), 2)
        # SEGating on the packed-T tensor (resnet_3D.py:89-105), flat form
        pooled = jnp.mean(y, axis=(1, 2)).reshape(B, 2, cout).mean(axis=1)
        gv = dv["fg"]["Conv3D_0"]
        gate = nn.sigmoid(pooled @ gv["kernel"][0, 0, 0].astype(dt)
                          + gv["bias"].astype(dt))
        return y * jnp.tile(gate, (1, 2))[:, None, None, :]

    def _convse_fast_packed(self, mod, parts_pk, cout: int):
        """_ConvSE on STANDARD-2x2-packed virtual-concat parts
        (B, hb, wb, 4*2Ci each): the SAME 3x3 conv becomes a VALID 2x2
        block conv over a one-block pad, producing the SHIFTED packing
        (boundary phases masked to the conv's zero-pad rows) — the same
        parity trick as recon_s2d's mid conv.  256-lane convs replace the
        64-lane full-res ones (measured 13.9 -> ~100+ TF/s shapes).

        Returns the shifted packing (B, hb+1, wb+1, 4*2Co); downstream
        consumers (the l2 tail) take it pre-shifted."""
        from ..ops.s2d import conv3x3_weight_to_s2d, shifted_phase_mask

        dt = parts_pk[0].dtype
        B, hb, wb, _ = parts_pk[0].shape
        dv = mod.variables["params"]
        wpk = _pack(dv["conv"]["kernel"].astype(dt))  # (3, 3, 2Ci, 2Co)
        if len(parts_pk) == 2:
            ws = self._split_rows(
                wpk, parts_pk[0].shape[-1] // 8, parts_pk[1].shape[-1] // 8
            )
        else:
            ws = (wpk,)
        conv = lambda t, wk: lax.conv_general_dilated(
            t, conv3x3_weight_to_s2d(wk), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = sum(conv(t, wk) for t, wk in zip(parts_pk, ws)).astype(dt)
        y = y + jnp.tile(dv["conv"]["bias"].astype(dt), 8)
        y = y * shifted_phase_mask(hb, wb, 2 * cout, dt)
        # SEGating flat: 4 phases x (t)(co) -> 8 groups of co; the masked
        # boundary zeros don't contribute, divide by the true pixel count
        pooled = y.sum(axis=(1, 2)).reshape(B, 8, cout).sum(axis=1)
        pooled = pooled / jnp.asarray(2 * (2 * hb) * (2 * wb), dt)
        gv = dv["fg"]["Conv3D_0"]
        gate = nn.sigmoid(pooled @ gv["kernel"][0, 0, 0].astype(dt)
                          + gv["bias"].astype(dt))
        return y * jnp.tile(gate, (1, 8))[:, None, None, :]

    def _s2d_tail_l2(
        self, d0, dec4, fuse, outconv, cout: int, packed_out: bool = False,
        pre_shifted: bool = False,
    ):
        """dec4 + fuse + reflect-7x7 head composed one packing level deeper
        than _s2d_tail: every op runs on the (H/4, W/4) block grid at 16x
        channel width — dec4's transposed conv as a VALID 2x2 block conv
        128->512, the fuse as a 512->256 block-diagonal matmul, and the
        head as a VALID 3x3 block conv 256->48 (vs the lane-starved
        12-channel head).  Requires the feature grid (H/2, W/2) even, i.e.
        full-res H, W divisible by 4 (the engine pads to /8)."""
        from ..ops.s2d import (
            conv2x2_valid,
            conv3x3_weight_to_s2d,
            depth_to_space,
            shift_packed,
            space_to_depth,
            transpose_conv_weight_to_s2d,
        )

        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        parts = d0 if isinstance(d0, tuple) else (d0,)
        dt = parts[0].dtype
        B = parts[0].shape[0]
        dv = dec4.variables["params"]

        k = dv["upconv"]["kernel"].astype(dt)  # (3, 4, 4, Co, Ci)
        flipped = jnp.flip(k, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
        wt = transpose_conv_weight_to_s2d(_pack(flipped))  # (3, 3, 2Ci, 8Co)
        # wt acts as a SAME 3x3 (pad-1 VALID) conv on the feature grid;
        # compose with the 2x2 input packing: VALID 2x2 over the shifted
        # packing.  Output channels nested (a2 b2)(a1 b1)(t)(co).
        # pre_shifted: parts already arrive in the shifted packing (the
        # packed-decoder pipeline; per-part unpacked width = packed/4).
        div = 8 if pre_shifted else 2
        if len(parts) == 2:
            ws = self._split_rows(
                wt, parts[0].shape[-1] // div, parts[1].shape[-1] // div
            )
        else:
            ws = (wt,)
        if pre_shifted:
            shifted = parts
        else:
            shifted = tuple(shift_packed(space_to_depth(t)) for t in parts)
        y = sum(
            conv2x2_valid(t, conv3x3_weight_to_s2d(wk))
            for t, wk in zip(shifted, ws)
        ).astype(dt)
        y = y + jnp.tile(dv["upconv"]["bias"].astype(dt), 32)

        # SEGating, flat (pool over all 32 phase-t groups == over T, H, W)
        pooled = jnp.mean(y, axis=(1, 2)).reshape(B, 32, cout).mean(axis=1)
        gk = dv["fg"]["Conv3D_0"]["kernel"][0, 0, 0].astype(dt)
        gb = dv["fg"]["Conv3D_0"]["bias"].astype(dt)
        gate = nn.sigmoid(pooled @ gk + gb)
        dout = lrelu(y * jnp.tile(gate, (1, 32))[:, None, None, :])

        # 1x1 fuse: (t)(co) 2C->C per phase group -> block-diagonal matmul.
        # kron(I16, fk) carries 16x the reference FLOPs as structural
        # zeros, but the MXU runs the dense 512x256 matmul at ~full rate
        # (measured <=0.2 ms/frame); the grouped-conv alternative
        # (feature_group_count=16) looked FLOP-optimal and measured 1.30
        # ms/frame — XLA:TPU lowers many-group 1x1 convs pathologically
        # (tools/profile_l2tail_ops.py, round 5).  Keep the dense form.
        fk = fuse.variables["params"]["kernel"][0, 0].astype(dt)  # (2C, C)
        wblk = jnp.kron(jnp.eye(16, dtype=dt), fk)  # (16*2C, 16*C)
        fused = lrelu(dout @ wblk)  # (B, hb, wb, 16*cout)

        ov = outconv.variables["params"]
        w4 = _head_weight_l2(ov["kernel"].astype(dt))  # (3, 3, 16C, 48)
        sp = _reflect_pad_blocks4(fused, cout)
        o = lax.conv_general_dilated(
            sp, w4, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        o = o + jnp.tile(ov["bias"].astype(dt), 16)
        o = depth_to_space(o)  # (B, H/2, W/2, 12): standard 2x2 RGB packing
        if packed_out:
            return o
        return depth_to_space(o)

    def _s2d_tail(self, d0, dec4, fuse, outconv, cout: int, packed_out: bool = False):
        """dec4 + fuse + 7x7 head without leaving half resolution.  d0 may
        be a virtual packed-concat pair."""
        from ..ops.s2d import (
            conv_same_weight_to_s2d,
            depth_to_space,
            shift_packed_reflect,
            transpose_conv_weight_to_s2d,
        )

        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        parts = d0 if isinstance(d0, tuple) else (d0,)
        dt = parts[0].dtype
        B, h, w, _ = parts[0].shape
        dv = dec4.variables["params"]

        # transposed conv (upconv) -> 3x3 block conv producing the packed
        # full-res tensor; bias depends only on the torch channel, so it
        # tiles over [phase][t] groups
        k = dv["upconv"]["kernel"].astype(dt)  # (3, 4, 4, Co, Ci)
        flipped = jnp.flip(k, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
        wpk = _pack(flipped)  # (4, 4, 2Ci, 2Co)
        wt = transpose_conv_weight_to_s2d(wpk)  # (3, 3, 2Ci, 8Co)
        if len(parts) == 2:
            ws = self._split_rows(
                wt, parts[0].shape[-1] // 2, parts[1].shape[-1] // 2
            )
        else:
            ws = (wt,)
        conv = lambda t, wk: lax.conv_general_dilated(
            jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0))), wk, (1, 1),
            [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = sum(conv(t, wk) for t, wk in zip(parts, ws)).astype(dt)
        y = y + jnp.tile(dv["upconv"]["bias"].astype(dt), 8)

        # SEGating (resnet_3D.py:89-105): pool over (T, H, W) per channel —
        # in packed s2d that is the mean over phases and both t-halves;
        # flat form (no tiny-trailing-dim reshape of the big tensor)
        pooled = jnp.mean(y, axis=(1, 2)).reshape(B, 8, cout).mean(axis=1)
        gk = dv["fg"]["Conv3D_0"]["kernel"][0, 0, 0].astype(dt)
        gb = dv["fg"]["Conv3D_0"]["bias"].astype(dt)
        gate = nn.sigmoid(pooled @ gk + gb)  # (B, cout)
        y = y * jnp.tile(gate, (1, 8))[:, None, None, :]
        dout = lrelu(y)

        # 1x1 fuse: per-phase (2C -> C) channel mix == one 1x1 conv with a
        # block-diagonal (4 phase blocks) weight — lane-aligned, no reshape
        fk = fuse.variables["params"]["kernel"][0, 0].astype(dt)  # (2C, C)
        zero = jnp.zeros_like(fk)
        wblk = jnp.block(
            [[fk if i == j else zero for j in range(4)] for i in range(4)]
        )  # (8*cout, 4*cout)
        fused = lrelu(dout @ wblk)

        # reflect-pad 7x7 head -> 4x4 block conv on the reflect-shifted
        # packing, with 4 output columns grouped into channels (the bare
        # 12-channel output starves the MXU's N dimension; wpack4 makes it
        # 48 at a 2x FLOP tax — measured ~3x faster)
        ov = outconv.variables["params"]
        w4 = conv_same_weight_to_s2d(ov["kernel"].astype(dt))  # (4, 4, 4C, 12)
        from ..ops.s2d import wpack4_weight

        sp = shift_packed_reflect(fused)  # (B, h+3, w+3, 4C)
        Bn, hp3, wp3, C4 = sp.shape
        # the VALID wpack4 conv yields (wpad//4 - 1) packed columns = that
        # many *4 output columns, which must cover wp3-3; when wp3 % 4 == 0
        # a ceil-round wpad == wp3 would under-produce by one column
        wpad = (wp3 // 4 + 1) * 4
        sp = jnp.pad(sp, ((0, 0), (0, 0), (0, wpad - wp3), (0, 0)))
        sp = sp.reshape(Bn, hp3, wpad // 4, 4 * C4)  # free reshape
        o = lax.conv_general_dilated(
            sp, wpack4_weight(w4), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, h, w/4, 48) b-major
        o = o.reshape(Bn, hp3 - 3, (wpad // 4 - 1) * 4, 12)[:, :, : wp3 - 3]
        o = o + jnp.tile(ov["bias"].astype(dt), 4)
        if packed_out:
            return o  # standard 2x2 packing of the RGB residual
        return depth_to_space(o)
