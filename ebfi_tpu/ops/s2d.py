"""Space-to-depth (2x2 block) execution of full-resolution 3x3 convs.

The reconstruction head runs two SAME 3x3 convs at full resolution on
64-channel tensors (model_singleframe.py:257-266: PixelShuffle x2 ->
conv -> conv -> sigmoid).  On TPU that shape is slow twice over: 64
channels only half-fill the MXU/VPU lanes, and each full-res intermediate
is ~1 GB/chunk of HBM traffic.  In s2d form the SAME tensor is
(B, H/2, W/2, 4C) — half lanes become full, and a full-res 3x3 conv
becomes a VALID 2x2 conv over 4C channels whose weight is a fixed sparse
rearrangement of the original (measured 107 vs 41 TF/s for the conv mix).

Layout: phase-major packing — channel (a*2+b)*C + c holds pixel
(2i+a, 2j+b, c) of block (i, j).

The full-res conv consumes the packing *shifted* by (-1, -1) pixels (so
its 3x3 receptive field spans exactly 2x2 blocks); `shift_packed`
materializes that from the standard packing with explicit zero padding,
which reproduces the SAME-conv zero-pad semantics bit-for-bit (up to f32
reassociation inside the MXU dot).

All transforms here are pure XLA and differentiable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major channels."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, h, w, a, b, C
    return x.reshape(B, H // 2, W // 2, 4 * C)


def depth_to_space(x: jax.Array) -> jax.Array:
    """(B, h, w, 4C) phase-major -> (B, 2h, 2w, C)."""
    B, h, w, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, h, w, 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, 2 * h, 2 * w, C)


def shift_packed(y: jax.Array) -> jax.Array:
    """Standard packing -> (-1,-1)-pixel-shifted packing with zero borders.

    Ys[i, j, (a, b, c)] = x[2i-1+a, 2j-1+b, c] (x = unpacked y; zeros
    outside), shape (B, h+1, w+1, 4C).
    """
    B, h, w, C4 = y.shape
    C = C4 // 4
    ph = lambda a, b: y[..., (a * 2 + b) * C : (a * 2 + b + 1) * C]
    yp = lambda t: jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
    p11 = yp(ph(1, 1))[:, :-1, :-1]
    p10 = yp(ph(1, 0))[:, :-1, 1:]
    p01 = yp(ph(0, 1))[:, 1:, :-1]
    p00 = yp(ph(0, 0))[:, 1:, 1:]
    return jnp.concatenate([p11, p10, p01, p00], axis=-1)


def shifted_to_standard(y: jax.Array) -> jax.Array:
    """(-1,-1)-shifted 2x2 packing (B, h+1, w+1, 4C) -> standard packing
    (B, h, w, 4C) of the same pixels, via four slice+concats:
    std(i,j) phase (0,0) = x[2i, 2j] = sh[i, j] phase (1,1), etc."""
    B, hp, wp, C4 = y.shape
    C = C4 // 4
    ph = lambda a, b: y[..., (a * 2 + b) * C : (a * 2 + b + 1) * C]
    p00 = ph(1, 1)[:, :-1, :-1]
    p01 = ph(1, 0)[:, :-1, 1:]
    p10 = ph(0, 1)[:, 1:, :-1]
    p11 = ph(0, 0)[:, 1:, 1:]
    return jnp.concatenate([p00, p01, p10, p11], axis=-1)


def _shift_select(k: int) -> np.ndarray:
    """Selection tensor S (bk, 2, 2, k) for an odd-k SAME conv consuming the
    shifted packing: S[di, ai, ao, dy] = 1 iff dy == 2*di + ai - ao.

    Output pixel (2oi+ao) tap dy reads input pixel row 2(oi+di)-1+ai, so a
    k-tap SAME conv becomes a VALID (k//2+1)-tap block conv (for k=3 the
    classic 2x2; k=7 -> 4x4 with one extra reflect/zero block of context).
    """
    bk = k // 2 + 1
    S = np.zeros((bk, 2, 2, k), np.float32)
    for di in range(bk):
        for ai in range(2):
            for ao in range(2):
                dy = 2 * di + ai - ao
                if 0 <= dy < k:
                    S[di, ai, ao, dy] = 1.0
    return S


def conv_same_weight_to_s2d(w: jax.Array) -> jax.Array:
    """SAME odd-k conv weight (k, k, Ci, Co) -> VALID (k//2+1)^2 s2d weight
    (bk, bk, 4Ci, 4Co) consuming the shifted packing, producing standard
    packing.  Structural zeros fill the taps outside the k x k footprint."""
    k, _, Ci, Co = w.shape
    S = jnp.asarray(_shift_select(k), w.dtype)
    # [di, dj, ai, bi, ci, ao, bo, co]
    w4 = jnp.einsum("iAay,jBbx,yxcd->ijABcabd", S, S, w)
    bk = k // 2 + 1
    return w4.reshape(bk, bk, 4 * Ci, 4 * Co)


def conv3x3_weight_to_s2d(w: jax.Array) -> jax.Array:
    """SAME 3x3 conv weight (3, 3, Ci, Co) -> VALID 2x2 s2d weight
    (2, 2, 4Ci, 4Co); see conv_same_weight_to_s2d."""
    return conv_same_weight_to_s2d(w)


def conv7s2_weight_to_s2d(w: jax.Array) -> jax.Array:
    """Stride-2 SAME 7x7 conv weight (7, 7, Ci, Co) -> VALID 4x4 block conv
    weight (4, 4, 4Ci, Co) over the STANDARD 2x2 packing padded by (2, 1)
    blocks per spatial side (top/left 2, bottom/right 1).

    Derivation: out(i) = sum_dy w[dy] x[2i + dy - 3]; input row 2i+dy-3 is
    block m = i + (dy - 3 + a')/2 ... i.e. dy = 2*di + a - 1 for block tap
    di in [0, 4) over blocks i-2..i+1 (structural zeros at dy outside
    [0, 7)).  One output pixel per input block — the stride-2 output is NOT
    packed.  This turns the 6-channel lane-starved detail stem into a
    24-channel block conv (same FLOPs, ~4x lane utilization)."""
    k, _, Ci, Co = w.shape
    assert k == 7, "derivation is for k=7, stride 2, pad 3"
    S = np.zeros((4, 2, k), np.float32)
    for di in range(4):
        for a in range(2):
            dy = 2 * di + a - 1
            if 0 <= dy < k:
                S[di, a, dy] = 1.0
    Sj = jnp.asarray(S, w.dtype)
    # [di, dj, a, b, c, o] -> phase-major (a*2+b)*Ci + c input channels
    w4 = jnp.einsum("iay,jbx,yxco->ijabco", Sj, Sj, w)
    return w4.reshape(4, 4, 4 * Ci, Co)


def conv7s2_s2d(x_pk: jax.Array, w4: jax.Array) -> jax.Array:
    """Apply a conv7s2_weight_to_s2d weight to a standard 2x2 packing
    (B, h, w, 4Ci): pad (2, 1) blocks, VALID 4x4 -> (B, h, w, Co)."""
    xp = jnp.pad(x_pk, ((0, 0), (2, 1), (2, 1), (0, 0)))
    return lax.conv_general_dilated(
        xp, w4, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def transpose_conv_weight_to_s2d(wpk: jax.Array) -> jax.Array:
    """Stride-2 k=4 pad=1 transposed-conv weight (dilated-conv form,
    (4, 4, Ci, Co) HWIO as used with lhs_dilation=2, pad 2) -> a plain
    VALID 3x3 block conv weight (3, 3, Ci, 4Co) over the half-res input
    padded by one block on each side, producing the full-res output in
    standard packing.

    Derivation: out[2i+a] = sum_u xd[2i+a-2+u] wpk[u] with xd the 2x
    row-dilated input, so tap u = 2*dmi - a for input block m = i-1+dmi.
    """
    Ci, Co = wpk.shape[2], wpk.shape[3]
    S = np.zeros((3, 2, 4), np.float32)
    for dmi in range(3):
        for a in range(2):
            u = 2 * dmi - a
            if 0 <= u < 4:
                S[dmi, a, u] = 1.0
    Sj = jnp.asarray(S, wpk.dtype)
    # [dmi, dmj, ci, a, b, co]
    wt = jnp.einsum("iau,jbv,uvcd->ijcabd", Sj, Sj, wpk)
    return wt.reshape(3, 3, Ci, 4 * Co)


def shift_packed_reflect(y: jax.Array) -> jax.Array:
    """Standard packing -> (-1,-1)-shifted packing with ONE extra context
    block per side and torch ReflectionPad semantics at the borders
    (blocks -1..h+1): shape (B, h+3, w+3, 4C).

    Every border block is a phase-swap of an interior block (pixel row
    -1 = row 1, -2 = row 2, ...).  Built from concatenations of contiguous
    slices on the flat channel groups (constant-index gathers lower to slow
    TPU gather ops; slice+concat copies fuse).
    """
    B, h, w, C4 = y.shape
    C = C4 // 4
    ph = lambda a, b: y[..., (a * 2 + b) * C : (a * 2 + b + 1) * C]

    # shifted block m in -1..h+1: its phase-0 row is source phase-1 row of
    # block sel0[m] = [1, 0, 0..h-2, h-1, h-2]; its phase-1 row is source
    # phase-0 row of block sel1[m] = [1, 0, 1..h-1, h-1, h-2]
    def rowsel0(t, n):
        return jnp.concatenate(
            [t[:, 1:2], t[:, 0:1], t[:, 0 : n - 1], t[:, n - 1 : n], t[:, n - 2 : n - 1]],
            axis=1,
        )

    def rowsel1(t, n):
        return jnp.concatenate(
            [t[:, 1:2], t[:, 0:1], t[:, 1:n], t[:, n - 1 : n], t[:, n - 2 : n - 1]],
            axis=1,
        )

    def colsel0(t, n):
        return jnp.concatenate(
            [t[:, :, 1:2], t[:, :, 0:1], t[:, :, 0 : n - 1], t[:, :, n - 1 : n],
             t[:, :, n - 2 : n - 1]],
            axis=2,
        )

    def colsel1(t, n):
        return jnp.concatenate(
            [t[:, :, 1:2], t[:, :, 0:1], t[:, :, 1:n], t[:, :, n - 1 : n],
             t[:, :, n - 2 : n - 1]],
            axis=2,
        )

    # rows: new a=0 group <- source a=1 rows; new a=1 <- source a=0
    q00, q01 = rowsel0(ph(1, 0), h), rowsel0(ph(1, 1), h)
    q10, q11 = rowsel1(ph(0, 0), h), rowsel1(ph(0, 1), h)
    # cols: new b=0 <- b=1 cols; new b=1 <- b=0
    r00, r01 = colsel0(q01, w), colsel1(q00, w)
    r10, r11 = colsel0(q11, w), colsel1(q10, w)
    return jnp.concatenate([r00, r01, r10, r11], axis=-1)


# ---------------------------------------------------------------------- #
# Row-only packing (block 2 in H): for C=64 feature maps this fills the
# 128 MXU/VPU lanes exactly (2C channels) at a 4/3 FLOP tax — cheaper than
# the full 2x2 packing's 16/9 — and every SAME 3x3 conv becomes a VALID
# (2,3)-tap block conv with the SAME weight mapping regardless of whether
# the input packing is row-shifted or standard (the parity difference is
# absorbed by which blocks feed the VALID window, i.e. one zero-block pad).


def rows2_pack_shifted(x: jax.Array) -> jax.Array:
    """(B, H, W, C), H even -> (B, H/2+1, W, 2C); block j holds pixel rows
    (2j-1, 2j) as channel halves [row0 | row1], zeros outside the image."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    xp = xp.reshape(B, H // 2 + 1, 2, W, C).transpose(0, 1, 3, 2, 4)
    return xp.reshape(B, H // 2 + 1, W, 2 * C)


def rows2_unpack_shifted(y: jax.Array) -> jax.Array:
    """Inverse of rows2_pack_shifted: (B, h+1, W, 2C) -> (B, 2h, W, C)."""
    B, hp, W, C2 = y.shape
    C = C2 // 2
    x = y.reshape(B, hp, W, 2, C).transpose(0, 1, 3, 2, 4).reshape(B, 2 * hp, W, C)
    return x[:, 1 : 2 * hp - 1]


def rows2_unpack_standard(y: jax.Array) -> jax.Array:
    """Standard row packing (block j = rows 2j, 2j+1) -> (B, 2h, W, C)."""
    B, h, W, C2 = y.shape
    C = C2 // 2
    return y.reshape(B, h, W, 2, C).transpose(0, 1, 3, 2, 4).reshape(B, 2 * h, W, C)


def conv3x3_weight_to_rows2(w: jax.Array) -> jax.Array:
    """SAME 3x3 weight (..., 3, 3, Ci, Co) -> VALID (2,3) row-block weight
    (..., 2, 3, 2Ci, 2Co): W[di, dx, (ai,ci), (ao,co)] = w[2di+ai-ao, dx]
    (structural zero outside [0,3)).  The same mapping serves both packing
    parities; leading batch axes (e.g. stacked stages) pass through."""
    S = np.zeros((2, 2, 2, 3), np.float32)
    for di in range(2):
        for ai in range(2):
            for ao in range(2):
                dy = 2 * di + ai - ao
                if 0 <= dy < 3:
                    S[di, ai, ao, dy] = 1.0
    Sj = jnp.asarray(S, w.dtype)
    w2 = jnp.einsum("dABy,...yxio->...dxAiBo", Sj, w)
    *lead, _, _, _, Ci, _, Co = w2.shape
    return w2.reshape(*lead, 2, 3, 2 * Ci, 2 * Co)


def conv23_valid(x: jax.Array, w: jax.Array) -> jax.Array:
    """VALID 2-row-tap, SAME-3-column conv on row-packed tensors."""
    return lax.conv_general_dilated(
        x, w, (1, 1), [(0, 0), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv2x2_valid(x: jax.Array, w: jax.Array) -> jax.Array:
    return lax.conv_general_dilated(
        x, w, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def wpack4_weight(w: jax.Array) -> jax.Array:
    """VALID conv weight (kh, kw, Ci, Co), kw <= 4 -> a weight (kh, 2,
    4Ci, 4Co) over the input with columns grouped by 4 into channels
    (x.reshape(B, R, Wc/4, 4Ci) — a FREE reshape in NHWC), producing 4
    output columns per position (b-major output channels, so the output
    un-groups with another free reshape).

    Output col 4J+b reads input cols 4J+b+dx, dx in [0, kw) -> input
    blocks J..J+1: W[dJ, bi -> bo] = w[dx] iff dx = 4 dJ + bi - bo.
    Purpose: tiny-Co convs (e.g. a 12-channel RGB-packed head) are MXU
    lane-starved; 4Co quadruples the N dimension at a (2*4Ci)/(kw*Ci)
    FLOP tax (2x for kw=4)."""
    kh, kw, Ci, Co = w.shape
    S = np.zeros((2, 4, 4, kw), np.float32)
    for dJ in range(2):
        for bi in range(4):
            for bo in range(4):
                dx = 4 * dJ + bi - bo
                if 0 <= dx < kw:
                    S[dJ, bi, bo, dx] = 1.0
    Sj = jnp.asarray(S, w.dtype)
    # [kh, dJ, bi, Ci, bo, Co]
    w2 = jnp.einsum("Jbcx,hxio->hJbico", Sj, w)
    return w2.reshape(kh, 2, 4 * Ci, 4 * Co)


def pixelshuffle_perm(C: int) -> np.ndarray:
    """Output-channel permutation taking a conv that feeds torch
    PixelShuffle(2) (channel index c*4 + a*2 + b, ops.pixel_shuffle) to the
    phase-major packed layout ((a*2+b)*C + c)."""
    perm = np.empty(4 * C, np.int64)
    for ph in range(4):
        for c in range(C):
            perm[ph * C + c] = c * 4 + ph
    return perm


def shifted_phase_mask(h: int, w: int, C: int, dtype) -> jax.Array:
    """(1, h+1, w+1, 4C) mask zeroing the out-of-image pixels a shifted
    packing carries at the borders: block row 0 holds pixel row -1 in its
    a=0 phases, block row h holds pixel row 2h in its a=1 phases (same for
    columns / b phases).  Multiplying a conv output that *produces* the
    shifted packing by this mask reproduces shift_packed's zero borders."""
    m = np.ones((1, h + 1, w + 1, 2, 2, C), np.float32)
    m[:, 0, :, 0] = 0.0
    m[:, h, :, 1] = 0.0
    m[:, :, 0, :, 0] = 0.0
    m[:, :, w, :, 1] = 0.0
    return jnp.asarray(m.reshape(1, h + 1, w + 1, 4 * C), dtype)


def recon_s2d(
    x: jax.Array,
    up_kernel: jax.Array,
    up_bias: jax.Array,
    mid_kernel: jax.Array,
    mid_bias: jax.Array,
    out_kernel: jax.Array,
    out_bias: jax.Array,
    slope: float = 0.01,
    return_packed: bool = False,
) -> jax.Array:
    """The EVFIAutoEx reconstruction head computed without ever
    materializing a full-resolution intermediate (evfi.py:175-177):

        up    = lrelu(pixel_shuffle(conv_up(x), 2))
        sharp = sigmoid(conv_out(lrelu(conv_mid(up))))

    x: (B, h, w, C) half-res features.  Weights are the ordinary module
    params (HWIO); they are rearranged in-graph (tiny, jit-time constant
    work per step).  Returns (B, 2h, 2w, 3).

    Parity alternation (same trick as the rows2 path, models/control.py):
    the (2,2) block-conv weight mapping is packing-parity independent, so
    conv_mid runs VALID over the one-block-padded STANDARD packing and
    produces the SHIFTED packing directly (no shift_packed gather), and
    conv_out consumes that shifted packing directly.  The only extra work
    vs the convs themselves is the border mask (shift_packed's zeros).
    """
    B, h, w, _ = x.shape
    C4 = up_kernel.shape[-1]
    C = C4 // 4
    perm = pixelshuffle_perm(C)
    up_k = up_kernel[..., perm]
    up_b = up_bias[perm]
    y = lax.conv_general_dilated(
        x, up_k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + up_b
    u = jax.nn.leaky_relu(y, slope)  # standard packing (B, h, w, 4C)

    # conv_mid: standard -> shifted (VALID over one-block pad)
    mid_k2 = conv3x3_weight_to_s2d(mid_kernel).astype(x.dtype)
    m = lax.conv_general_dilated(
        u, mid_k2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.tile(mid_bias, 4)
    m = jax.nn.leaky_relu(m, slope) * shifted_phase_mask(h, w, C, x.dtype)

    # conv_out: shifted -> standard (plain VALID)
    out_k2 = conv3x3_weight_to_s2d(out_kernel).astype(x.dtype)
    o = conv2x2_valid(m, out_k2) + jnp.tile(out_bias, 4)
    o = jax.nn.sigmoid(o)
    if return_packed:
        return o  # standard 2x2 packing of the RGB output
    return depth_to_space(o)
