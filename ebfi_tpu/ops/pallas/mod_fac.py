"""Fused Pallas kernel: FAC kernel-bank prediction + application.

The Modification block (models/Ours/model_singleframe.py:139-165) predicts
a per-pixel K^2*C kernel bank with a 3x3 conv over concat(event, frame)
features and immediately consumes it with the FAC op.  The bank is the
single largest tensor in the network — at 720p/chunk-8 it is ~5.9 GB of
HBM write+read (B*H/2*W/2*1600 bf16), which makes the XLA version
bandwidth-bound (measured ~54 TF/s on v5e against the conv's ~110 TF/s
compute ceiling).

This kernel computes the bank PER ROW-BAND in VMEM and applies it in
place: per band it DMAs the (zero-padded) concat features and the
(replication-padded) event features once, builds the 3x3 im2col in VMEM,
runs the bank conv as 128-column MXU dots (two taps at a time), applies
lrelu + bias, multiply-accumulates against the shifted event band, and
writes only the (TH, W, C) output — the bank never exists in HBM.

Forward-only fusion: the custom VJP recomputes through the XLA twin
(kernel-bank conv + ops.kernel_conv2d), whose autodiff equals the
reference CUDA backward kernels (KernelConv2D_kernel.cu:91-150).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernel_conv2d import kernel_conv2d as _xla_fac

# Shared-kernel tap-group width (bank-conv output columns per MXU dot
# round).  The original 1152-deep kernel was insensitive to it, but the
# shared kernel's 576-deep ev-half dots pipeline best at 4 taps (=256
# cols at C=64): measured 173 vs 121 TF/s at {4 vs 2}; 8 and 25 regress
# to ~120 (tools/microbench_modfac.py).  Overridable for experiments.
import os as _os

_TAP_GROUP = int(_os.environ.get("EBFI_MODFAC_TAPG", "4"))
# Shared-kernel row-band height (rows per grid step).  Larger bands make
# bigger MXU dots (M = TH*W) and fewer DMA round-trips at the cost of
# VMEM scratch (ffdot is TH*W*K*K*C of the input dtype).
_BAND_TH = int(_os.environ.get("EBFI_MODFAC_TH", "2"))


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.01 * x)


def _kernel(
    cat_hbm, evp_hbm, wk_ref, bias_ref, o_ref, catbuf, evbuf, imcol, acc,
    sem_c, sem_e, *, K, TH, W, C,
):
    """Grid (B, H/TH).

    cat_hbm: (B, H+2, WPC, 2C) zero-padded concat(ev, ff) (2C lanes, 128-
      aligned for C=64).  evp_hbm: (B, H+K-1, WPE, C128) replication-padded
      event features.  wk_ref: (9*2C, K*K*C) im2col bank-conv weight.
      bias_ref: (32, C) f32, row t = bias for tap t.  o_ref: (1, TH, W, C).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(cat_hbm.at[b, pl.ds(i * TH, TH + 2), :, :], catbuf, sem_c)
    ep = pltpu.make_async_copy(evp_hbm.at[b, pl.ds(i * TH, TH + K - 1), :, :], evbuf, sem_e)
    cp.start()
    ep.start()
    cp.wait()

    C2 = 2 * C
    # 3x3 im2col of the concat band: tap-major columns
    for dy in range(3):
        for dx in range(3):
            imcol[:, :, (dy * 3 + dx) * C2 : (dy * 3 + dx + 1) * C2] = catbuf[
                dy : dy + TH, dx : dx + W, :C2
            ]
    x2 = imcol[...].reshape(TH * W, 9 * C2)
    ep.wait()

    KK = K * K
    for tp in range(KK // 2 + 1):
        t0 = 2 * tp
        n = C2 if t0 + 1 < KK else C  # last odd tap runs alone
        d = jnp.dot(
            x2, wk_ref[:, t0 * C : t0 * C + n], preferred_element_type=jnp.float32
        ).reshape(TH, W, n)
        for t in (t0, t0 + 1):
            if t >= KK:
                break
            kern = _lrelu(d[:, :, (t - t0) * C : (t - t0 + 1) * C] + bias_ref[t, :])
            ky, kx = t // K, t % K
            ev_tap = evbuf[ky : ky + TH, kx : kx + W, :C].astype(jnp.float32)
            if t == 0:
                acc[...] = ev_tap * kern
            else:
                acc[...] += ev_tap * kern
    o_ref[0] = acc[...].astype(o_ref.dtype)


def _forward(ev: jax.Array, ff: jax.Array, wk: jax.Array, bk: jax.Array, K: int):
    """ev, ff: (B, H, W, C); wk: (3, 3, 2C, K*K*C) HWIO (tap-major bank
    output channels); bk: (K*K*C,).  Returns (B, H, W, C)."""
    B, H, W, C = ev.shape
    p = (K - 1) // 2
    C2 = 2 * C
    dt = ev.dtype

    wpc = -(-(W + 2) // 8) * 8
    cat = jnp.concatenate([ev, ff], axis=-1)
    catp = jnp.pad(cat, ((0, 0), (1, 1), (1, wpc - W - 1), (0, -(-C2 // 128) * 128 - C2)))

    wpe = -(-(W + K - 1) // 8) * 8
    c128 = -(-C // 128) * 128
    evp = jnp.pad(ev, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    evp = jnp.pad(evp, ((0, 0), (0, 0), (0, wpe - (W + K - 1)), (0, c128 - C)))

    wk2 = wk.reshape(9 * C2, K * K * C).astype(dt)
    bias = jnp.zeros((32, C), jnp.float32)
    bias = bias.at[: K * K].set(bk.reshape(K * K, C).astype(jnp.float32))

    TH = 2 if H % 2 == 0 else 1
    interpret = jax.default_backend() not in ("tpu", "axon")
    return pl.pallas_call(
        partial(_kernel, K=K, TH=TH, W=W, C=C),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), dt),
        grid=(B, H // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, W, C), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, wpc, -(-C2 // 128) * 128), dt),
            pltpu.VMEM((TH + K - 1, wpe, c128), dt),
            pltpu.VMEM((TH, W, 9 * C2), dt),
            pltpu.VMEM((TH, W, C), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(catp, evp, wk2, bias)


def _kernel_shared(
    evz_hbm, evr_hbm, ffz_hbm, wke_ref, wkf_ref, bias_ref, o_ref,
    evzbuf, evrbuf, ffbuf, imcol, ffdot, evf32, acc, sem_z, sem_r, sem_f,
    *, K, TH, W, C, N, PACKED=False,
):
    """Grid (B, H/TH, N), n fastest.  The frame-feature half of the bank
    conv is identical for all N timestamps of one blurry frame — compute
    it once per row band (at n == 0) into the band-persistent `ffdot`
    scratch and reuse it for the remaining N-1 grid steps.

    evz_hbm: (B*N, H+2, WPC, C128) zero-padded event features (bank-conv
    input).  evr_hbm: (B*N, H+K-1, WPE, C128) replication-padded event
    features (FAC input).  ffz_hbm: (B, H+2, WPC, C128) zero-padded frame
    features.  wke/wkf: (9C, K*K*C) the ev/ff input-channel halves of the
    bank-conv weight.  ffdot: (TH, W, K*K*C) band scratch in the INPUT
    dtype — for the bf16 production engine the ff bank half therefore
    round-trips through bf16 (reassociation + bf16-rounding-level match
    vs the split XLA twin); f32 inputs keep an f32 scratch and stay exact.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    n = pl.program_id(2)
    bn = b * N + n
    cpz = pltpu.make_async_copy(evz_hbm.at[bn, pl.ds(i * TH, TH + 2), :, :], evzbuf, sem_z)
    cpr = pltpu.make_async_copy(evr_hbm.at[bn, pl.ds(i * TH, TH + K - 1), :, :], evrbuf, sem_r)
    cpz.start()
    cpr.start()

    KK = K * K

    @pl.when(n == 0)
    def _():
        cpf = pltpu.make_async_copy(
            ffz_hbm.at[b, pl.ds(i * TH, TH + 2), :, :], ffbuf, sem_f
        )
        cpf.start()
        cpf.wait()
        for dy in range(3):
            for dx in range(3):
                imcol[:, :, (dy * 3 + dx) * C : (dy * 3 + dx + 1) * C] = ffbuf[
                    dy : dy + TH, dx : dx + W, :C
                ]
        xf = imcol[...].reshape(TH * W, 9 * C)
        # column groups of 2C keep the f32 dot temporaries small.  The
        # bank bias folds in here (pre-activation), once per band instead
        # of 25 per-tap adds on every grid step — it rides the band
        # scratch's dtype with the ff half (input-dtype rounding, same
        # semantics the scratch already documents)
        for g in range(KK // 2 + 1):
            c0 = g * 2 * C
            nc = min(2 * C, KK * C - c0)
            bsl = bias_ref[:, c0 : c0 + nc]
            d = jnp.dot(xf, wkf_ref[:, c0 : c0 + nc], preferred_element_type=jnp.float32)
            ffdot[:, :, c0 : c0 + nc] = (d + bsl).astype(ffdot.dtype).reshape(TH, W, nc)

    cpz.wait()
    for dy in range(3):
        for dx in range(3):
            imcol[:, :, (dy * 3 + dx) * C : (dy * 3 + dx + 1) * C] = evzbuf[
                dy : dy + TH, dx : dx + W, :C
            ]
    x2 = imcol[...].reshape(TH * W, 9 * C)
    cpr.wait()
    # the FAC apply reads every tap's event slice in f32: cast the band
    # once (one pass) instead of 25 overlapping per-tap slice casts
    evf32[...] = evrbuf[...].astype(jnp.float32)

    G = _TAP_GROUP
    R = -(-KK // G)

    def dotg(g):
        t0 = g * G
        nc = min(G, KK - t0) * C
        return jnp.dot(
            x2, wke_ref[:, t0 * C : t0 * C + nc], preferred_element_type=jnp.float32
        ).reshape(TH, W, nc) + ffdot[:, :, t0 * C : t0 * C + nc].astype(jnp.float32)

    def fac(g, d):
        t0 = g * G
        for t in range(t0, min(t0 + G, KK)):
            # bias already folded into ffdot (once per band, at n == 0)
            kern = _lrelu(d[:, :, (t - t0) * C : (t - t0 + 1) * C])
            ky, kx = t // K, t % K
            ev_tap = evf32[ky : ky + TH, kx : kx + W, :C]
            if t == 0:
                acc[...] = ev_tap * kern
            else:
                acc[...] += ev_tap * kern

    # software-pipelined: round g+1's MXU dot is issued before round g's
    # VPU tail (lrelu + FAC multiply-accumulate) so the scheduler may
    # overlap MXU and VPU work.  Measured NEUTRAL vs the serial order
    # (4.10 vs 4.07 ms/frame at 360x640x64/N=16) — as are the f32 band
    # precast and the bias fold — i.e. the VPU tail was already hidden
    # and the kernel runs at the MXU's achieved rate for its dot shape.
    d_prev = dotg(0)
    for g in range(1, R):
        d_cur = dotg(g)
        fac(g - 1, d_prev)
        d_prev = d_cur
    fac(R - 1, d_prev)
    if PACKED:
        # rows2-standard packing: band rows become channel halves — the
        # consumer's row-packed convs start from this layout for free
        for r in range(TH // 2):
            o_ref[0, r, :, :C] = acc[2 * r].astype(o_ref.dtype)
            o_ref[0, r, :, C:] = acc[2 * r + 1].astype(o_ref.dtype)
    else:
        o_ref[0] = acc[...].astype(o_ref.dtype)


def _forward_shared(
    ev: jax.Array, ff: jax.Array, wk: jax.Array, bk: jax.Array, K: int,
    packed_rows2: bool = False,
):
    """ev: (B*N, H, W, C) per-timestamp event features; ff: (B, H, W, C)
    frame features shared by each group of N consecutive batch rows (the
    engine's b-major timestamp folding).  Same math as
    ``modification_fac_fused(ev, repeat(ff, N), ...)`` up to the ff-half
    of the bank accumulating via a band scratch in the input dtype (a
    bf16 round-trip for the production engine; exact for f32 inputs).

    packed_rows2 (H even): return the rows2-STANDARD packing
    (B*N, H/2, W, 2C) — the band rows are written as channel halves inside
    the kernel, so the consumer's row-packed convs get their layout free."""
    BN, H, W, C = ev.shape
    B = ff.shape[0]
    N = BN // B
    p = (K - 1) // 2
    dt = ev.dtype
    # channel pad to the 128-lane tile: Mosaic rejects sub-128 channel
    # slices on HBM refs (tried C-minor arrays to halve the band DMA
    # volume at C=64 — "Slice shape along dimension 3 must be aligned to
    # tiling (128)")
    c128 = -(-C // 128) * 128

    wpc = -(-(W + 2) // 8) * 8
    evz = jnp.pad(ev, ((0, 0), (1, 1), (1, wpc - W - 1), (0, c128 - C)))
    ffz = jnp.pad(ff, ((0, 0), (1, 1), (1, wpc - W - 1), (0, c128 - C)))

    wpe = -(-(W + K - 1) // 8) * 8
    evr = jnp.pad(ev, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    evr = jnp.pad(evr, ((0, 0), (0, 0), (0, wpe - (W + K - 1)), (0, c128 - C)))

    wke = wk[:, :, :C, :].reshape(9 * C, K * K * C).astype(dt)
    wkf = wk[:, :, C:, :].reshape(9 * C, K * K * C).astype(dt)
    # flat (1, K*K*C) f32 bias: tap-group slices land 128-lane-aligned for
    # the fold into ffdot (no in-kernel reshape)
    bias = bk.reshape(1, K * K * C).astype(jnp.float32)

    TH = _BAND_TH if H % _BAND_TH == 0 else (2 if H % 2 == 0 else 1)
    if packed_rows2 and TH % 2:
        raise ValueError("packed_rows2 requires even TH (even H)")
    interpret = jax.default_backend() not in ("tpu", "axon")
    if packed_rows2:
        out_shape = jax.ShapeDtypeStruct((BN, H // 2, W, 2 * C), dt)
        out_spec = pl.BlockSpec(
            (1, TH // 2, W, 2 * C), lambda b, i, n: (b * N + n, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        out_shape = jax.ShapeDtypeStruct((BN, H, W, C), dt)
        out_spec = pl.BlockSpec(
            (1, TH, W, C), lambda b, i, n: (b * N + n, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    # Mosaic's default scoped-VMEM limit is 16 MB — far below v5e's 128 MB
    # physical VMEM.  The band scratches (ffdot is TH*W*K*K*C of the input
    # dtype) exceed it for TH>2; raise the ceiling so larger bands (fewer,
    # bigger MXU dots; less DMA per byte) are available.
    try:
        cparams = pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20)
    except TypeError:  # older pallas: TPUCompilerParams name
        cparams = pltpu.TPUCompilerParams(vmem_limit_bytes=96 * 2**20)
    return pl.pallas_call(
        partial(_kernel_shared, K=K, TH=TH, W=W, C=C, N=N, PACKED=packed_rows2),
        out_shape=out_shape,
        compiler_params=cparams,
        grid=(B, H // TH, N),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((TH + 2, wpc, c128), dt),
            pltpu.VMEM((TH + K - 1, wpe, c128), dt),
            pltpu.VMEM((TH + 2, wpc, c128), dt),
            pltpu.VMEM((TH, W, 9 * C), dt),
            pltpu.VMEM((TH, W, K * K * C), dt),
            pltpu.VMEM((TH + K - 1, wpe, c128), jnp.float32),
            pltpu.VMEM((TH, W, C), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(evz, evr, ffz, wke, wkf, bias)


def _xla_twin_shared(ev, ff, wk, bk, K):
    """XLA computation of the shared-ff form: the bank conv splits by input
    rows (conv(cat(ev, ff)) == conv_ev(ev) + conv_ff(ff)) with the ff half
    at B=1 broadcast over each frame's N timestamps."""
    from jax import lax

    BN = ev.shape[0]
    B, C = ff.shape[0], ff.shape[-1]
    conv = lambda x, w: lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    bank_ff = conv(ff, wk[:, :, C:, :])  # (B, H, W, KKC)
    bank_ff = jnp.repeat(bank_ff, BN // B, axis=0)
    bank = conv(ev, wk[:, :, :C, :]) + bank_ff
    bank = jax.nn.leaky_relu(bank + bk.astype(bank.dtype), 0.01).astype(ev.dtype)
    return _xla_fac(ev, bank, K, layout="tap_major")


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def modification_fac_fused_shared(ev, ff, wk, bk, kernel_size: int = 5):
    """Bank-conv + FAC with the frame-feature half shared across each
    frame's N timestamps (ev batch B*N, ff batch B): the ff half of the
    bank conv is computed once per row band instead of N times.  Backward
    via the split XLA twin."""
    return _forward_shared(ev, ff, wk, bk, kernel_size)


def _fwd_shared(ev, ff, wk, bk, kernel_size):
    return _forward_shared(ev, ff, wk, bk, kernel_size), (ev, ff, wk, bk)


def _bwd_shared(kernel_size, res, g):
    ev, ff, wk, bk = res
    _, vjp = jax.vjp(
        lambda a, b, c, d: _xla_twin_shared(a, b, c, d, kernel_size), ev, ff, wk, bk
    )
    return vjp(g)


modification_fac_fused_shared.defvjp(_fwd_shared, _bwd_shared)


def _rows2_pack_std(x):
    B, H, W, C = x.shape
    return (
        x.reshape(B, H // 2, 2, W, C)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, H // 2, W, 2 * C)
    )


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def modification_fac_fused_shared_packed(ev, ff, wk, bk, kernel_size: int = 5):
    """Shared-ff kernel emitting the rows2-STANDARD packing
    (B*N, H/2, W, 2C) directly from the band writes (free vs an XLA
    relayout).  Backward via the split XLA twin + pack transform."""
    return _forward_shared(ev, ff, wk, bk, kernel_size, packed_rows2=True)


def _fwd_shared_packed(ev, ff, wk, bk, kernel_size):
    return (
        _forward_shared(ev, ff, wk, bk, kernel_size, packed_rows2=True),
        (ev, ff, wk, bk),
    )


def _bwd_shared_packed(kernel_size, res, g):
    ev, ff, wk, bk = res
    _, vjp = jax.vjp(
        lambda a, b, c, d: _rows2_pack_std(_xla_twin_shared(a, b, c, d, kernel_size)),
        ev, ff, wk, bk,
    )
    return vjp(g)


modification_fac_fused_shared_packed.defvjp(_fwd_shared_packed, _bwd_shared_packed)


def _xla_twin(ev, ff, wk, bk, K):
    """Reference XLA computation: 3x3 bank conv + lrelu + FAC (tap-major)."""
    from jax import lax

    # NOTE: no preferred_element_type here — this twin is also the custom
    # VJP's backward, and the f32-upcast conv breaks the bf16 transpose
    # (f32 cotangent against bf16 operands)
    cat = jnp.concatenate([ev, ff], axis=-1)
    bank = lax.conv_general_dilated(
        cat, wk.astype(cat.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    bank = jax.nn.leaky_relu(bank + bk.astype(bank.dtype), 0.01).astype(ev.dtype)
    return _xla_fac(ev, bank, K, layout="tap_major")


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def modification_fac_fused(ev, ff, wk, bk, kernel_size: int = 5):
    """lrelu(conv3x3(cat(ev, ff))) bank + FAC, fused — the bank never
    touches HBM.  Backward via the XLA twin."""
    return _forward(ev, ff, wk, bk, kernel_size)


def _fwd(ev, ff, wk, bk, kernel_size):
    return _forward(ev, ff, wk, bk, kernel_size), (ev, ff, wk, bk)


def _bwd(kernel_size, res, g):
    ev, ff, wk, bk = res
    _, vjp = jax.vjp(lambda a, b, c, d: _xla_twin(a, b, c, d, kernel_size), ev, ff, wk, bk)
    return vjp(g)


modification_fac_fused.defvjp(_fwd, _bwd)
