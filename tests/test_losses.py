"""Losses vs torch oracles implementing the reference formulas."""
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from ebfi_tpu.losses import (
    laplacian_loss,
    census_loss,
    charbonnier_loss,
    psnr_metric,
    ssim_metric,
    LPIPS,
    load_lpips_params,
)


# ------------------------- torch oracles (restore.py) ------------------- #

def torch_gauss(x, factor=1):
    k = torch.tensor([[1., 4., 6., 4., 1.], [4., 16., 24., 16., 4.],
                      [6., 24., 36., 24., 6.], [4., 16., 24., 16., 4.],
                      [1., 4., 6., 4., 1.]]) / 256.0
    c = x.shape[1]
    kern = (factor * k).repeat(c, 1, 1, 1)
    return F.conv2d(F.pad(x, (2, 2, 2, 2), mode="reflect"), kern, groups=c)


def torch_lap_pyramid(x, levels=5):
    pyr, cur = [], x
    for _ in range(levels - 1):
        blurred = torch_gauss(cur)
        red = F.avg_pool2d(blurred, 2)
        # zero-stuff expand
        b, c, h, w = red.shape
        up = torch.zeros(b, c, h * 2, w * 2)
        up[:, :, ::2, ::2] = red
        exp = torch_gauss(up, factor=4)
        pyr.append(cur - exp)
        cur = red
    pyr.append(cur)
    return pyr


def torch_lap_loss(x, y):
    px, py = torch_lap_pyramid(x), torch_lap_pyramid(y)
    return sum((2 ** i) * F.l1_loss(a, b, reduction="sum") for i, (a, b) in enumerate(zip(px, py)))


def torch_census(x, y, patch=7):
    out_ch = patch * patch
    w = np.eye(out_ch).reshape(patch, patch, 1, out_ch)
    w = torch.tensor(np.transpose(w, (3, 2, 0, 1))).float()

    def transform(t):
        g = t.mean(dim=1, keepdim=True)
        patches = F.conv2d(g, w, padding=patch // 2)
        loc = patches - g
        return loc / torch.sqrt(0.81 + loc**2)

    dx, dy = transform(x), transform(y).detach()
    diff = dx - dy
    dist = (diff**2 / (0.1 + diff**2)).mean(dim=1, keepdim=True)
    b, c, h, w_ = x.shape
    pad = patch // 2
    inner = torch.ones(b, 1, h - 2 * pad, w_ - 2 * pad)
    mask = F.pad(inner, [pad] * 4)
    return (dist * mask).mean()


def test_laplacian_loss_matches_torch(rng):
    x = rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
    y = rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
    ref = float(torch_lap_loss(torch.from_numpy(x), torch.from_numpy(y)))
    got = float(laplacian_loss(jnp.asarray(x.transpose(0, 2, 3, 1)),
                               jnp.asarray(y.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, rtol=2e-4)


def test_census_loss_matches_torch(rng):
    x = rng.uniform(0, 1, (2, 3, 24, 24)).astype(np.float32)
    y = rng.uniform(0, 1, (2, 3, 24, 24)).astype(np.float32)
    ref = float(torch_census(torch.from_numpy(x), torch.from_numpy(y)))
    got = float(census_loss(jnp.asarray(x.transpose(0, 2, 3, 1)),
                            jnp.asarray(y.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_charbonnier(rng):
    x = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    y = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    ref = np.sum(np.sqrt((x - y) ** 2 + 1e-3))
    got = float(charbonnier_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_psnr_reference_quirk(rng):
    """Channel-wise data_range = tgt[c].max() - tgt.min() (restore.py:79-88)."""
    pred = rng.uniform(0, 1, (1, 3, 16, 16)).astype(np.float32)
    tgt = rng.uniform(0, 1, (1, 3, 16, 16)).astype(np.float32)
    got = psnr_metric(pred, tgt)
    vals = []
    for c in range(3):
        dr = tgt[0, c].max() - tgt[0].min()
        mse = np.mean((tgt[0, c].astype(np.float64) - pred[0, c]) ** 2)
        vals.append(10 * np.log10(dr**2 / mse))
    np.testing.assert_allclose(got, np.mean(vals), rtol=1e-6)


def test_ssim_identical_is_one(rng):
    img = rng.uniform(0, 1, (1, 3, 24, 24)).astype(np.float32)
    assert abs(ssim_metric(img, img) - 1.0) < 1e-9


def test_ssim_against_direct_loop(rng):
    """Cross-check the cumsum uniform filter against a direct sliding-window
    computation of skimage's formula."""
    x = rng.uniform(0, 1, (20, 20)).astype(np.float64)
    y = np.clip(x + 0.1 * rng.standard_normal((20, 20)), 0, 1)
    got = ssim_metric(x, y)

    win, R = 7, 2.0
    NP = win * win
    cov_norm = NP / (NP - 1)
    C1, C2 = (0.01 * R) ** 2, (0.03 * R) ** 2
    pad = win // 2
    vals = []
    for i in range(pad, 20 - pad):
        for j in range(pad, 20 - pad):
            px = x[i - pad:i + pad + 1, j - pad:j + pad + 1]
            py = y[i - pad:i + pad + 1, j - pad:j + pad + 1]
            ux, uy = px.mean(), py.mean()
            vx = cov_norm * (np.mean(px * px) - ux * ux)
            vy = cov_norm * (np.mean(py * py) - uy * uy)
            vxy = cov_norm * (np.mean(px * py) - ux * uy)
            vals.append(((2 * ux * uy + C1) * (2 * vxy + C2)) /
                        ((ux**2 + uy**2 + C1) * (vx + vy + C2)))
    np.testing.assert_allclose(got, np.mean(vals), rtol=1e-10)


def test_lpips_smoke(rng):
    params = load_lpips_params()  # random backbone + vendored v0.1 heads
    lpips = LPIPS(params)
    assert not lpips.comparable, "random backbone must be flagged non-comparable"
    a = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    d_ab = lpips(a, b)
    d_aa = lpips(a, a)
    assert d_aa < 1e-6
    assert d_ab > d_aa


def test_lpips_default_heads_match_reference_alex_pth():
    """The shipped lpips_alex_linear.npz must equal the reference's vendored
    v0.1 linear heads (loss/PerceptualSimilarity/models/weights/v0.1/alex.pth)."""
    ref = torch.load(
        "/root/reference/loss/PerceptualSimilarity/models/weights/v0.1/alex.pth",
        map_location="cpu",
    )
    params = load_lpips_params()
    for i in range(5):
        want = np.maximum(ref[f"lin{i}.model.1.weight"].numpy().reshape(-1), 0)
        np.testing.assert_array_equal(np.asarray(params[f"lin{i}_w"]), want)
