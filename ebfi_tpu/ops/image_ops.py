"""On-device image ops replacing the reference's CPU/cv2 round-trips.

The reference computes the blurriness maps (`Frame2DCP`, `Frame2Lap`) by
moving each frame GPU -> CPU, running cv2, and copying back **inside the
model forward** (myutils/utils.py:15-49, used at
models/Ours/model_singleframe.py:311-323).  Here both are fused on-device
ops: the dark channel is a min-pool `reduce_window`, and the Laplacian
reproduces cv2's fixed-point grayscale + 3x3 stencil exactly in integer
arithmetic so outputs are bit-comparable.

Also hosts small layout utilities: pixel shuffle (depth-to-space with the
torch channel ordering), pad/crop helpers matching `CropSize`
(models/model_misc/model_util.py:158-189).
"""
from __future__ import annotations

from math import ceil, floor

import jax
import jax.numpy as jnp
from jax import lax


def dark_channel(frame: jax.Array, size: int = 35) -> jax.Array:
    """Dark-channel prior: channel-min then `size` x `size` erosion.

    `frame` is (B, H, W, 3) float.  Equivalent to `Frame2DCP`
    (myutils/utils.py:15-31): cv2.erode with a rect kernel is a min-pool;
    cv2's default morphology border (+inf for erosion) means out-of-image
    taps are ignored, i.e. a SAME min-reduce-window with +inf init.

    Returns: (B, H, W, 1).
    """
    dc = jnp.min(frame, axis=-1)  # (B, H, W)
    eroded = lax.reduce_window(
        dc,
        jnp.array(jnp.inf, dc.dtype),
        lax.min,
        window_dimensions=(1, size, size),
        window_strides=(1, 1, 1),
        padding="SAME",
    )
    return eroded[..., None]


def laplacian_response(frame: jax.Array) -> jax.Array:
    """cv2-parity Laplacian blurriness map.

    `frame` is (B, H, W, 3) float in [0, 1], RGB channel order.  Reproduces
    `Frame2Lap` (myutils/utils.py:34-49) exactly:

    1. quantize: ``(im * 255).astype(uint8)`` (truncation);
    2. grayscale via cv2 BGR2GRAY bit-exact fixed-point (shift-15 path) —
       note the reference feeds the RGB tensor to a BGR converter, so the
       R/B coefficients are swapped:
       ``gray = (R*3735 + G*19235 + B*9798 + 16384) >> 15``;
    3. 3x3 Laplacian stencil [[0,1,0],[1,-4,1],[0,1,0]] with REFLECT_101
       border (cv2 BORDER_DEFAULT).

    Returns: (B, H, W, 1) float32, unnormalized (range about +/-1020).
    """
    u8 = jnp.clip(jnp.floor(frame * 255.0), 0, 255).astype(jnp.int32)
    r, g, b = u8[..., 0], u8[..., 1], u8[..., 2]
    gray = (r * 3735 + g * 19235 + b * 9798 + (1 << 14)) >> 15  # (B, H, W) int32

    gpad = jnp.pad(gray, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    lap = (
        gpad[:, :-2, 1:-1]
        + gpad[:, 2:, 1:-1]
        + gpad[:, 1:-1, :-2]
        + gpad[:, 1:-1, 2:]
        - 4 * gray
    )
    return lap.astype(jnp.float32)[..., None]


def pixel_shuffle(x: jax.Array, factor: int) -> jax.Array:
    """Depth-to-space with torch `nn.PixelShuffle` channel ordering.

    `x` is (B, H, W, C*r*r) with channel index ``c*r*r + dy*r + dx``;
    returns (B, H*r, W*r, C).  Ordering kept torch-compatible so converted
    checkpoints permute cleanly (model_singleframe.py:258-261).
    """
    B, H, W, Crr = x.shape
    r = factor
    C = Crr // (r * r)
    x = x.reshape(B, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, dy, W, dx, C
    return x.reshape(B, H * r, W * r, C)


def replication_pad_2d(x: jax.Array, pad: int) -> jax.Array:
    """Edge-replication padding on the two spatial axes of NHWC."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")


def reflection_pad_2d(x: jax.Array, pad: int) -> jax.Array:
    """Reflection (REFLECT_101) padding on the two spatial axes of NHWC."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def pad_amounts_to_multiple(h: int, w: int, factor_h: int, factor_w: int):
    """`CropSize` pad placement: ceil-half on top/left, floor-half on
    bottom/right (model_util.py:158-178)."""
    hc = factor_h * ceil(h / factor_h)
    wc = factor_w * ceil(w / factor_w)
    return (
        ceil(0.5 * (hc - h)),
        floor(0.5 * (hc - h)),
        ceil(0.5 * (wc - w)),
        floor(0.5 * (wc - w)),
    )


def zero_pad_to_multiple(x: jax.Array, factor_h: int, factor_w: int) -> jax.Array:
    """Zero-pad NHWC spatial dims up to the next multiple of the factors."""
    _, H, W, _ = x.shape
    pt, pb, pl, pr = pad_amounts_to_multiple(H, W, factor_h, factor_w)
    if pt == pb == pl == pr == 0:
        return x
    return jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))


def center_crop(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Center crop matching `CropSize.crop` (model_util.py:180-189)."""
    _, H, W, _ = x.shape
    cy, cx = floor(H / 2), floor(W / 2)
    iy0 = cy - floor(out_h / 2)
    ix0 = cx - floor(out_w / 2)
    return x[:, iy0 : iy0 + out_h, ix0 : ix0 + out_w, :]
