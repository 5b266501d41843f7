"""DCNv2: forward parity vs a numpy oracle of the CUDA im2col semantics,
plus a zero-offset == dense-conv identity check and numeric gradients.

Oracle mirrors `modulated_deformable_im2col_gpu_kernel` + bilinear sampling
(dcn_v2_im2col_cuda.cu:25-54, 125-196).  Identity check mirrors
`check_zero_offset`-style tests (models/DCNv2/testcuda.py:32-66).
"""
import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from ebfi_tpu.ops import dcn_v2_conv


def bilinear(im, h, w):
    """im: (H, W); CUDA corner-gated bilinear (dcn_v2_im2col_cuda.cu:25-54)."""
    H, W = im.shape
    hl, wl = int(np.floor(h)), int(np.floor(w))
    lh, lw = h - hl, w - wl
    val = 0.0
    for (dy, dx, wt) in ((0, 0, (1 - lh) * (1 - lw)), (0, 1, (1 - lh) * lw),
                         (1, 0, lh * (1 - lw)), (1, 1, lh * lw)):
        hc, wc = hl + dy, wl + dx
        if 0 <= hc <= H - 1 and 0 <= wc <= W - 1:
            val += wt * im[hc, wc]
    return val


def dcn_oracle(x, offset, mask, weight, bias, stride, pad, dil, dg):
    B, C, H, W = x.shape
    Cout, _, Kh, Kw = weight.shape
    Ho = (H + 2 * pad - (dil * (Kh - 1) + 1)) // stride + 1
    Wo = (W + 2 * pad - (dil * (Kw - 1) + 1)) // stride + 1
    cpg = C // dg
    out = np.zeros((B, Cout, Ho, Wo), np.float64)
    for b in range(B):
        for ho in range(Ho):
            for wo in range(Wo):
                col = np.zeros((C, Kh * Kw))
                for c in range(C):
                    g = c // cpg
                    for i in range(Kh):
                        for j in range(Kw):
                            t = i * Kw + j
                            oh = offset[b, g * 2 * Kh * Kw + 2 * t, ho, wo]
                            ow = offset[b, g * 2 * Kh * Kw + 2 * t + 1, ho, wo]
                            m = mask[b, g * Kh * Kw + t, ho, wo]
                            h_im = ho * stride - pad + i * dil + oh
                            w_im = wo * stride - pad + j * dil + ow
                            v = 0.0
                            if -1 < h_im < H and -1 < w_im < W:
                                v = bilinear(x[b, c], h_im, w_im)
                            col[c, t] = v * m
                out[b, :, ho, wo] = weight.reshape(Cout, -1) @ col.reshape(-1) + bias
    return out


def make_inputs(rng, B=1, C=4, H=6, W=5, Cout=3, K=3, dg=2, off_scale=2.0):
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    offset = (off_scale * rng.standard_normal((B, dg * 2 * K * K, H, W))).astype(np.float32)
    mask = rng.uniform(0, 1, (B, dg * K * K, H, W)).astype(np.float32)
    weight = rng.standard_normal((Cout, C, K, K)).astype(np.float32)
    bias = rng.standard_normal((Cout,)).astype(np.float32)
    return x, offset, mask, weight, bias


def run_ours(x, offset, mask, weight, bias, stride=1, pad=1, dil=1, dg=2):
    out = dcn_v2_conv(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(offset.transpose(0, 2, 3, 1)),
        jnp.asarray(mask.transpose(0, 2, 3, 1)),
        jnp.asarray(weight),
        jnp.asarray(bias),
        stride, pad, dil, dg,
    )
    return np.asarray(out).transpose(0, 3, 1, 2)


def test_forward_matches_oracle(rng):
    x, offset, mask, weight, bias = make_inputs(rng)
    ref = dcn_oracle(x.astype(np.float64), offset, mask, weight.astype(np.float64),
                     bias, 1, 1, 1, 2)
    got = run_ours(x, offset, mask, weight, bias)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_zero_offset_is_dense_conv(rng):
    """offset=0, mask=1 -> ordinary convolution (testcuda.py check_zero_offset)."""
    B, C, H, W, Cout, K = 2, 4, 8, 9, 5, 3
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    weight = rng.standard_normal((Cout, C, K, K)).astype(np.float32)
    bias = rng.standard_normal((Cout,)).astype(np.float32)
    offset = np.zeros((B, 2 * K * K, H, W), np.float32)
    mask = np.ones((B, K * K, H, W), np.float32)

    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(weight),
                   torch.from_numpy(bias), padding=1).numpy()
    got = run_ours(x, offset, mask, weight, bias, dg=1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_gradients_numeric(rng):
    """Float64 finite-difference check of input/offset/mask/weight grads.

    The reference gradchecks DCN in double precision
    (models/DCNv2/testcuda.py:69-95); f32 FD at eps 1e-3 is marginal by
    construction and was flaky across full-suite runs.  x64 is enabled
    locally (conftest keeps the suite in f32)."""
    import contextlib

    @contextlib.contextmanager
    def enable_x64():
        prev = jax.config.jax_enable_x64
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", prev)

    x, offset, mask, weight, bias = make_inputs(rng, B=1, C=2, H=4, W=4, Cout=2, K=3, dg=1,
                                                off_scale=0.37)
    x, offset, mask, weight, bias = (
        a.astype(np.float64) for a in (x, offset, mask, weight, bias)
    )
    cot = rng.standard_normal((1, 2, 4, 4))

    with enable_x64():
        @jax.jit
        def f(x_, o_, m_, w_):
            out = dcn_v2_conv(
                jnp.asarray(x_).transpose(0, 2, 3, 1),
                jnp.asarray(o_).transpose(0, 2, 3, 1),
                jnp.asarray(m_).transpose(0, 2, 3, 1),
                w_, jnp.asarray(bias), 1, 1, 1, 1,
            )
            return jnp.sum(out.transpose(0, 3, 1, 2) * jnp.asarray(cot))

        grads = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))(x, offset, mask, weight)
        eps = 1e-5
        for argi, arr in enumerate((x, offset, mask, weight)):
            g = np.asarray(grads[argi])
            idxs = rng.choice(arr.size, size=5, replace=False)
            for ix in idxs:
                # two distinct, simultaneously-alive buffers: mutating one
                # numpy array in place between calls can hit JAX's
                # id-keyed ndarray->device conversion cache and silently
                # reuse the previous contents (the round-1 flake)
                pp = arr.copy(); pp.reshape(-1)[ix] += eps
                pm = arr.copy(); pm.reshape(-1)[ix] -= eps
                fp = f(*[pp if i == argi else a
                         for i, a in enumerate((x, offset, mask, weight))])
                fm = f(*[pm if i == argi else a
                         for i, a in enumerate((x, offset, mask, weight))])
                num = (float(fp) - float(fm)) / (2 * eps)
                np.testing.assert_allclose(
                    g.reshape(-1)[ix], num, rtol=1e-5, atol=1e-8
                )
