"""Pallas FAC kernel vs the XLA twin (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from ebfi_tpu.ops import kernel_conv2d
from ebfi_tpu.ops.pallas import kernel_conv2d_pallas


def test_pallas_forward_matches_xla(rng):
    B, H, W, C, K = 2, 12, 16, 8, 5
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    kern = jnp.asarray(rng.standard_normal((B, H, W, C * K * K)).astype(np.float32))
    ref = kernel_conv2d(x, kern, K, layout="tap_major")
    got = kernel_conv2d_pallas(x, kern, K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_gradients_match_xla(rng):
    B, H, W, C, K = 1, 8, 8, 4, 3
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    kern = jnp.asarray(rng.standard_normal((B, H, W, C * K * K)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))

    def f_pallas(a, b):
        return jnp.sum(kernel_conv2d_pallas(a, b, K) * cot)

    def f_xla(a, b):
        return jnp.sum(kernel_conv2d(a, b, K, layout="tap_major") * cot)

    gp = jax.grad(f_pallas, argnums=(0, 1))(x, kern)
    gx = jax.grad(f_xla, argnums=(0, 1))(x, kern)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_tap_major_layout_equivalence(rng):
    """tap-major XLA == c-major XLA after the converter's permutation."""
    B, H, W, C, K = 1, 6, 7, 3, 3
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    kern_c = rng.standard_normal((B, H, W, C * K * K)).astype(np.float32)
    perm = np.arange(C * K * K).reshape(C, K * K).T.reshape(-1)
    kern_t = kern_c[..., perm]
    a = kernel_conv2d(x, jnp.asarray(kern_c), K, layout="c_major")
    b = kernel_conv2d(x, jnp.asarray(kern_t), K, layout="tap_major")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_modification_fac_fused_matches_xla_twin(rng):
    """Fused bank-prediction + FAC (interpret mode on CPU) is exact vs the
    XLA twin in f32."""
    import jax
    import jax.numpy as jnp

    from ebfi_tpu.ops.pallas.mod_fac import modification_fac_fused, _xla_twin

    B, H, W, C, K = 2, 12, 20, 8, 5
    ev = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    ff = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    wk = jnp.asarray(0.1 * rng.standard_normal((3, 3, 2 * C, K * K * C)).astype(np.float32))
    bk = jnp.asarray(0.1 * rng.standard_normal((K * K * C,)).astype(np.float32))

    got = modification_fac_fused(ev, ff, wk, bk, K)
    want = _xla_twin(ev, ff, wk, bk, K)
    # dot-vs-conv accumulation order differs; a pre-activation that lands
    # within float noise of the lrelu kink can flip branch, so tolerance is
    # reassociation-scale, not exact
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)

    # gradients flow through the custom VJP (XLA-twin backward)
    loss = lambda e, f, w, b: jnp.sum(modification_fac_fused(e, f, w, b, K) ** 2)
    g = jax.grad(loss, argnums=(0, 2))(ev, ff, wk, bk)
    assert all(np.all(np.isfinite(np.asarray(t))) for t in g)


def test_modification_fac_fused_shared_matches_twin(rng):
    """Shared-ff kernel (ff at B, ev at B*N) == the twin on repeated ff."""
    import jax
    import jax.numpy as jnp

    from ebfi_tpu.ops.pallas.mod_fac import (
        modification_fac_fused_shared,
        _xla_twin,
    )

    B, N, H, W, C, K = 2, 3, 12, 20, 8, 5
    ev = jnp.asarray(rng.standard_normal((B * N, H, W, C)).astype(np.float32))
    ff = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    wk = jnp.asarray(0.1 * rng.standard_normal((3, 3, 2 * C, K * K * C)).astype(np.float32))
    bk = jnp.asarray(0.1 * rng.standard_normal((K * K * C,)).astype(np.float32))

    got = modification_fac_fused_shared(ev, ff, wk, bk, K)
    want = _xla_twin(ev, jnp.repeat(ff, N, axis=0), wk, bk, K)
    # the ff half of the bank rides a bf16 band scratch in the kernel —
    # tolerance is bf16-rounding scale on that half
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)

    # gradients flow (split-twin backward); dL/dff sums over the N group
    loss = lambda e, f: jnp.sum(modification_fac_fused_shared(e, f, wk, bk, K) ** 2)
    ge, gf = jax.grad(loss, argnums=(0, 1))(ev, ff)
    assert gf.shape == ff.shape and np.all(np.isfinite(np.asarray(gf)))
    assert ge.shape == ev.shape and np.all(np.isfinite(np.asarray(ge)))


def test_modification_fac_fused_shared_packed(rng):
    """The rows2-packed output variant == pack(unpacked variant)."""
    import jax.numpy as jnp

    from ebfi_tpu.ops.pallas.mod_fac import (
        modification_fac_fused_shared,
        modification_fac_fused_shared_packed,
        _rows2_pack_std,
    )

    B, N, H, W, C, K = 1, 2, 12, 20, 8, 5
    ev = jnp.asarray(rng.standard_normal((B * N, H, W, C)).astype(np.float32))
    ff = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    wk = jnp.asarray(0.1 * rng.standard_normal((3, 3, 2 * C, K * K * C)).astype(np.float32))
    bk = jnp.asarray(0.1 * rng.standard_normal((K * K * C,)).astype(np.float32))

    flat = modification_fac_fused_shared(ev, ff, wk, bk, K)
    packed = modification_fac_fused_shared_packed(ev, ff, wk, bk, K)
    assert packed.shape == (B * N, H // 2, W, 2 * C)
    np.testing.assert_allclose(
        np.asarray(packed), np.asarray(_rows2_pack_std(flat)), rtol=1e-5, atol=1e-5
    )


def test_modification_tail_fused_rows2_matches_plain(rng, monkeypatch):
    """Modification mode='tail' through the packed-kernel rows2 path (forced
    on CPU via interpret mode) == the plain full call."""
    import jax
    import jax.numpy as jnp

    from ebfi_tpu.models.modification import Modification

    monkeypatch.setenv("EBFI_FORCE_FUSED_MOD", "1")
    N, H, W, C = 3, 12, 16, 8
    ffeat = jnp.asarray(rng.standard_normal((1, H, W, C)).astype(np.float32))
    efeat = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    m = Modification(frame_basech=C, fused=True)
    m_plain = Modification(frame_basech=C)
    params = m_plain.init(jax.random.key(0), ffeat, efeat[:1])

    got = m.apply(params, ffeat, efeat, mode="tail", hoisted={})
    want = np.stack([
        np.asarray(m_plain.apply(params, ffeat, efeat[i : i + 1])[0])
        for i in range(N)
    ])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-2)


def test_modification_module_fused_flag(rng):
    """Modification(fused=True) falls back to XLA off-TPU and matches."""
    import jax
    import jax.numpy as jnp

    from ebfi_tpu.models.modification import Modification

    ffeat = jnp.asarray(rng.standard_normal((1, 16, 16, 8)).astype(np.float32))
    efeat = jnp.asarray(rng.standard_normal((1, 16, 16, 8)).astype(np.float32))
    m0 = Modification(frame_basech=8)
    m1 = Modification(frame_basech=8, fused=True)
    params = m0.init(jax.random.key(0), ffeat, efeat)
    np.testing.assert_allclose(
        np.asarray(m1.apply(params, ffeat, efeat)),
        np.asarray(m0.apply(params, ffeat, efeat)),
        rtol=1e-6, atol=1e-6,
    )
