"""Image ops vs cv2 (the reference's implementation substrate) and torch."""
import cv2
import numpy as np
import torch
import jax.numpy as jnp

from ebfi_tpu.ops import (
    dark_channel,
    laplacian_response,
    pixel_shuffle,
    zero_pad_to_multiple,
    center_crop,
)


def test_dark_channel_matches_cv2(rng):
    """Frame2DCP parity (myutils/utils.py:15-31)."""
    B, H, W, sz = 2, 40, 52, 35
    frames = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    got = np.asarray(dark_channel(jnp.asarray(frames), sz))[..., 0]
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (sz, sz))
    for b in range(B):
        im = frames[b]
        c0, c1, c2 = cv2.split(im)
        dc = cv2.min(cv2.min(c2, c1), c0)
        ref = cv2.erode(dc, kernel)
        np.testing.assert_allclose(got[b], ref, atol=1e-6)


def test_laplacian_matches_cv2(rng):
    """Frame2Lap parity, including the RGB-fed-to-BGR2GRAY quirk
    (myutils/utils.py:34-49)."""
    B, H, W = 2, 17, 23
    frames = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    got = np.asarray(laplacian_response(jnp.asarray(frames)))[..., 0]
    for b in range(B):
        im = (frames[b] * 255).astype(np.uint8)
        gray = cv2.cvtColor(im, cv2.COLOR_BGR2GRAY)
        ref = cv2.Laplacian(gray, cv2.CV_64F).astype(np.float32)
        np.testing.assert_allclose(got[b], ref, atol=1e-4)


def test_pixel_shuffle_matches_torch(rng):
    B, C, H, W, r = 2, 12, 5, 7, 2
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    ref = torch.pixel_shuffle(torch.from_numpy(x), r).numpy()
    got = np.asarray(pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), r))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=1e-6)


def test_pad_crop_roundtrip(rng):
    x = rng.standard_normal((1, 21, 37, 3)).astype(np.float32)
    xp = zero_pad_to_multiple(jnp.asarray(x), 8, 8)
    assert xp.shape == (1, 24, 40, 3)
    back = center_crop(xp, 21, 37)
    np.testing.assert_allclose(np.asarray(back), x, atol=0)
