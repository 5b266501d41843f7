"""Adversarial pack, flow losses, brightness constancy."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ebfi_tpu.losses import AdversarialLoss, EventWarping, BrightnessConstancy
from ebfi_tpu.losses.flow import (
    get_interpolation,
    interpolate_iwe,
    averaged_iwe,
    deblur_events,
)
from ebfi_tpu.ops.warp import grid_sample, sobel_gradients


@pytest.mark.parametrize("gan_type", ["GAN", "WGAN", "WGAN_GP", "FI_GAN", "STGAN"])
def test_adversarial_step(gan_type, rng):
    B, S = 2, 32
    fake = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32))
    real = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32))
    frames = jnp.asarray(rng.uniform(0, 1, (B, 2, S, S, 3)).astype(np.float32))
    adv = AdversarialLoss(S, gan_type)
    state = adv.init(jax.random.key(0), fake, real, frames)
    state2, g_loss, d_loss = adv.step(state, fake, real, frames)
    assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))
    # discriminator params actually moved
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params)
    assert max(jax.tree.leaves(moved)) > 0

    # generator loss is differentiable w.r.t. fake
    def g_of_fake(f):
        _, g, _ = adv.step(state, f, real, frames)
        return g

    gr = jax.grad(g_of_fake)(fake)
    assert np.isfinite(np.asarray(gr)).all()
    if gan_type == "WGAN":
        assert max(float(jnp.abs(l).max()) for l in jax.tree.leaves(state2.params)) <= 1.0


def test_grid_sample_identity(rng):
    B, H, W, C = 1, 7, 9, 2
    img = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    my, mx = np.mgrid[0:H, 0:W].astype(np.float32)
    gx = 2 * mx / (W - 1) - 1
    gy = 2 * my / (H - 1) - 1
    grid = jnp.asarray(np.stack([gx, gy], -1)[None])
    out = grid_sample(img, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_sobel_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((1, 1, 8, 10)).astype(np.float32)
    a = torch.tensor([[[[-1., 0., 1.], [-2., 0., 2.], [-1., 0., 1.]]]])
    b = torch.tensor([[[[-1., -2., -1.], [0., 0., 0.], [1., 2., 1.]]]])
    xp = F.pad(torch.from_numpy(x), (1, 1, 1, 1), mode="replicate")
    ref_x = (F.conv2d(xp, a) / 8).numpy()
    ref_y = (F.conv2d(xp, b) / 8).numpy()
    gx, gy = sobel_gradients(jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(gx)[..., 0], ref_x[:, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy)[..., 0], ref_y[:, 0], atol=1e-6)


def make_events(rng, B=2, N=100, H=12, W=16):
    ts = np.sort(rng.uniform(0, 1, (B, N)), axis=1)
    ys = rng.integers(0, H, (B, N)).astype(np.float64)
    xs = rng.integers(0, W, (B, N)).astype(np.float64)
    ps = rng.choice([-1.0, 1.0], (B, N))
    ev = np.stack([ts, ys, xs, ps], axis=2).astype(np.float32)
    pol = np.stack([(ps > 0), (ps < 0)], axis=2).astype(np.float32)
    return ev, pol


def test_zero_flow_warp_preserves_counts(rng):
    H, W = 12, 16
    ev, pol = make_events(rng, H=H, W=W)
    evj = jnp.asarray(ev)
    flow = jnp.zeros((2, H, W, 2))
    from ebfi_tpu.losses.flow import _event_flow_lookup

    ef = _event_flow_lookup(flow, evj, (H, W))
    idx, w = get_interpolation(evj, ef, 1.0, (H, W), max(H, W))
    iwe = interpolate_iwe(idx, w, (H, W))
    # with zero flow every event stays put: total mass == N per batch
    np.testing.assert_allclose(np.asarray(iwe).sum(axis=(1, 2, 3)), [100, 100], atol=1e-4)


def test_event_warping_zero_flow_positive(rng):
    H, W = 12, 16
    ev, pol = make_events(rng, H=H, W=W)
    loss = EventWarping(flow_regul_weight=1.0)(
        [jnp.zeros((2, H, W, 2))], jnp.asarray(ev), jnp.asarray(pol), (H, W)
    )
    assert float(loss) > 0  # avg timestamps nonzero without compensation


def test_averaged_iwe_unique_counting(rng):
    H, W = 8, 8
    # two events from DIFFERENT pixels landing on the same destination
    ev = np.array([[[0.0, 1.0, 1.0, 1.0], [0.5, 1.0, 2.0, 1.0]]], np.float32)
    pol = np.array([[[1.0, 0.0], [1.0, 0.0]]], np.float32)
    flow = np.zeros((1, H, W, 2), np.float32)
    flow[0, 1, 2, 0] = -1.0 / max(H, W)  # moves (1,2) one pixel left -> (1,1)
    out = averaged_iwe(flow, ev, pol, (H, W))
    # destination (1,1) receives 2 events from 2 distinct sources -> avg 1
    assert out[0, 0, 1, 1] == pytest.approx(1.0)


def test_brightness_constancy_terms(rng):
    H, W = 12, 16
    bc = BrightnessConstancy((H, W))
    img = jnp.asarray(rng.uniform(0, 1, (1, H, W, 1)).astype(np.float32))
    prev = jnp.asarray(rng.uniform(0, 1, (1, H, W, 1)).astype(np.float32))
    flow = jnp.zeros((1, H, W, 2))
    # zero flow -> temporal consistency reduces to plain L1
    tc = bc.temporal_consistency(flow, prev, img)
    np.testing.assert_allclose(float(tc), float(jnp.abs(img - prev).sum()), rtol=1e-5)
    assert float(bc.regularization(img)) > 0
    ev, pol = make_events(rng, B=1, N=50, H=H, W=W)
    cnt = jnp.asarray(rng.integers(0, 3, (1, H, W, 2)).astype(np.float32))
    gm = bc.generative_model(flow, img, cnt, jnp.asarray(ev), jnp.asarray(pol))
    assert np.isfinite(float(gm))
