"""SuperSloMo adaptive frame-rate upsampler (JAX).

The reference's offline dataset pipeline upsamples low-fps video before
event simulation with the public Super-SloMo network: a flow UNet
predicting bidirectional flow between a frame pair, and an arbitrary-time
UNet refining intermediate flows + a visibility map; the number of frames
inserted per pair is adaptive — ``ceil(max flow magnitude)``
(generate_dataset/upsampling/utils/upsampler.py:160-210, utils/model.py).

This is a TPU-native reimplementation: NHWC flax modules, a jitted per-
timestamp interpolation step (static shapes — the adaptive count only
drives the host loop), and a torch-checkpoint converter for the published
``SuperSloMo.ckpt`` (state_dictFC / state_dictAT).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.warp import grid_sample

# Input normalization constants (upsampling/utils/const.py): images are
# normalized as (x - mean) / std with std = 1.
MEAN = (0.429, 0.431, 0.397)


def _lrelu(x):
    return nn.leaky_relu(x, 0.1)


class _Down(nn.Module):
    """avg_pool 2x2 -> conv+lrelu -> conv+lrelu (utils/model.py:12-73)."""

    features: int
    filter_size: int

    @nn.compact
    def __call__(self, x):
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        p = (self.filter_size - 1) // 2
        x = _lrelu(nn.Conv(self.features, (self.filter_size,) * 2, padding=p, name="conv1")(x))
        x = _lrelu(nn.Conv(self.features, (self.filter_size,) * 2, padding=p, name="conv2")(x))
        return x


class _Up(nn.Module):
    """bilinear 2x -> conv+lrelu -> conv(cat skip)+lrelu (utils/model.py:76-135)."""

    features: int

    @nn.compact
    def __call__(self, x, skip):
        x = _upsample2x_bilinear_ac_torch(x)
        x = _lrelu(nn.Conv(self.features, (3, 3), padding=1, name="conv1")(x))
        x = _lrelu(nn.Conv(self.features, (3, 3), padding=1, name="conv2")(jnp.concatenate([x, skip], -1)))
        return x


def _upsample2x_bilinear_ac_torch(x: jax.Array) -> jax.Array:
    """Exact torch ``F.interpolate(scale_factor=2, mode='bilinear',
    align_corners=True)``: output pixel i samples input at i*(H-1)/(2H-1)."""
    B, H, W, C = x.shape

    def axis_weights(n):
        pos = jnp.arange(2 * n) * (n - 1) / (2 * n - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n - 1)
        w = (pos - lo).astype(x.dtype)
        return lo, hi, w

    ylo, yhi, wy = axis_weights(H)
    xlo, xhi, wx = axis_weights(W)
    top = x[:, ylo] * (1 - wy)[None, :, None, None] + x[:, yhi] * wy[None, :, None, None]
    out = (
        top[:, :, xlo] * (1 - wx)[None, None, :, None]
        + top[:, :, xhi] * wx[None, None, :, None]
    )
    return out


class SloMoUNet(nn.Module):
    """The Super-SloMo UNet (utils/model.py:139-209).  NHWC."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = _lrelu(nn.Conv(32, (7, 7), padding=3, name="conv1")(x))
        s1 = _lrelu(nn.Conv(32, (7, 7), padding=3, name="conv2")(x))
        s2 = _Down(64, 5, name="down1")(s1)
        s3 = _Down(128, 3, name="down2")(s2)
        s4 = _Down(256, 3, name="down3")(s3)
        s5 = _Down(512, 3, name="down4")(s4)
        x = _Down(512, 3, name="down5")(s5)
        x = _Up(512, name="up1")(x, s5)
        x = _Up(256, name="up2")(x, s4)
        x = _Up(128, name="up3")(x, s3)
        x = _Up(64, name="up4")(x, s2)
        x = _Up(32, name="up5")(x, s1)
        x = _lrelu(nn.Conv(self.out_channels, (3, 3), padding=1, name="conv3")(x))
        return x


def back_warp(img: jax.Array, flow: jax.Array) -> jax.Array:
    """I0 = back_warp(I1, F_0_1): bilinear sample img at grid + flow
    (utils/model.py:212-283; align_corners=True normalization)."""
    B, H, W, C = img.shape
    gx = jnp.arange(W, dtype=flow.dtype)[None, None, :] + flow[..., 0]
    gy = jnp.arange(H, dtype=flow.dtype)[None, :, None] + flow[..., 1]
    grid = jnp.stack([2 * (gx / W - 0.5), 2 * (gy / H - 0.5)], axis=-1)
    return grid_sample(img, grid)


class SuperSloMo:
    """Host-side adaptive upsampler around the two UNets.

    params: {"flow": ..., "interp": ...} flax param trees (see
    :func:`convert_torch_checkpoint`).  Works on normalized NHWC frames.
    """

    def __init__(self, params: Dict):
        self.params = jax.tree.map(jnp.asarray, params)
        self._flow = jax.jit(
            lambda p, x: SloMoUNet(4).apply({"params": p}, x)
        )
        self._interp = jax.jit(self._interp_fn)

    def _interp_fn(self, params, i0, i1, f01, f10, t):
        """One intermediate frame at scalar time t in (0, 1)
        (upsampler.py:177-209)."""
        temp = -t * (1 - t)
        ft0 = temp * f01 + (t * t) * f10
        ft1 = ((1 - t) * (1 - t)) * f01 + temp * f10
        g0 = back_warp(i0, ft0)
        g1 = back_warp(i1, ft1)
        inp = jnp.concatenate([i0, i1, f01, f10, ft1, ft0, g1, g0], axis=-1)
        out = SloMoUNet(5).apply({"params": params["interp"]}, inp)
        ft0f = out[..., 0:2] + ft0
        ft1f = out[..., 2:4] + ft1
        v0 = jax.nn.sigmoid(out[..., 4:5])
        v1 = 1.0 - v0
        g0f = back_warp(i0, ft0f)
        g1f = back_warp(i1, ft1f)
        w0, w1 = 1 - t, t
        return (w0 * v0 * g0f + w1 * v1 * g1f) / (w0 * v0 + w1 * v1)

    def flow(self, i0: jax.Array, i1: jax.Array) -> Tuple[jax.Array, jax.Array]:
        out = self._flow(self.params["flow"], jnp.concatenate([i0, i1], axis=-1))
        return out[..., :2], out[..., 2:]

    @staticmethod
    def insert_count(f01: jax.Array, f10: jax.Array) -> int:
        """Adaptive per-pair insertion count = ceil(max flow magnitude)
        (upsampler.py:171-175)."""
        m01 = jnp.sqrt((f01**2).sum(-1)).max()
        m10 = jnp.sqrt((f10**2).sum(-1)).max()
        return int(np.ceil(float(jnp.maximum(m01, m10))))

    def interpolate_pair(
        self, i0: jax.Array, i1: jax.Array
    ) -> Tuple[List[np.ndarray], List[float]]:
        """All adaptive intermediate frames for a pair of normalized frames
        (each (1, H, W, 3)).  Returns (frames, fractional times in (0,1))."""
        f01, f10 = self.flow(i0, i1)
        n = self.insert_count(f01, f10)
        frames, times = [], []
        for k in range(1, n):
            t = float(k) / n
            frames.append(np.asarray(self._interp(self.params, i0, i1, f01, f10, t)))
            times.append(t)
        return frames, times

    # ------------------------------------------------------------------ #

    def upsample_sequence(
        self, frames: np.ndarray, timestamps: Sequence[float]
    ) -> Tuple[np.ndarray, List[float]]:
        """frames: (N, H, W, 3) float in [0,1] (or (N, H, W) gray replicated).
        Returns (upsampled uint8-range float frames in [0,1], timestamps),
        mirroring Upsampler.upsample_sequence (upsampler.py:100-134)."""
        mean = np.asarray(MEAN, np.float32)
        H, W = frames.shape[1:3]
        # the 5-level UNet needs /32 dims (the reference crashes otherwise);
        # edge-pad for the network, crop the outputs back
        ph, pw = (-H) % 32, (-W) % 32
        pad = lambda f: np.pad(f, ((0, ph), (0, pw), (0, 0)), mode="edge")
        out_frames: List[np.ndarray] = []
        out_ts: List[float] = []
        for idx in range(len(frames) - 1):
            i0 = jnp.asarray(pad(frames[idx])[None] - mean)
            i1 = jnp.asarray(pad(frames[idx + 1])[None] - mean)
            t0, t1 = float(timestamps[idx]), float(timestamps[idx + 1])
            out_frames.append(frames[idx])
            out_ts.append(t0)
            mids, fracs = self.interpolate_pair(i0, i1)
            for f, fr in zip(mids, fracs):
                out_frames.append(np.clip(f[0, :H, :W] + mean, 0.0, 1.0))
                out_ts.append(t0 + fr * (t1 - t0))
        # like the reference, each pair emits I0 + intermediates only; the
        # sequence's final frame is never written (upsampler.py:119-123)
        return np.stack(out_frames), out_ts


# ---------------------------------------------------------------------- #
# Torch checkpoint conversion


def _convert_unet_state(sd: Dict[str, "np.ndarray"]) -> Dict:
    """torch UNet state_dict -> flax params.  Conv weights OIHW -> HWIO."""

    def w(name):
        return np.transpose(np.asarray(sd[name + ".weight"]), (2, 3, 1, 0))

    def b(name):
        return np.asarray(sd[name + ".bias"])

    def conv(name):
        return {"kernel": w(name), "bias": b(name)}

    params = {"conv1": conv("conv1"), "conv2": conv("conv2"), "conv3": conv("conv3")}
    for i in range(1, 6):
        params[f"down{i}"] = {
            "conv1": conv(f"down{i}.conv1"),
            "conv2": conv(f"down{i}.conv2"),
        }
        params[f"up{i}"] = {
            "conv1": conv(f"up{i}.conv1"),
            "conv2": conv(f"up{i}.conv2"),
        }
    return params


def convert_torch_checkpoint(ckpt_path: str) -> Dict:
    """Load the published SuperSloMo.ckpt (keys state_dictFC / state_dictAT,
    upsampler.py:66-68) into {"flow": ..., "interp": ...} flax params."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    to_np = lambda sd: {k: v.detach().numpy() for k, v in sd.items()}
    return {
        "flow": _convert_unet_state(to_np(ckpt["state_dictFC"])),
        "interp": _convert_unet_state(to_np(ckpt["state_dictAT"])),
    }


def init_params(rng_seed: int = 0, H: int = 64, W: int = 64) -> Dict:
    """Random-init params with the checkpoint's layout (for tests / when no
    checkpoint is available)."""
    k1, k2 = jax.random.split(jax.random.key(rng_seed))
    flow = SloMoUNet(4).init(k1, jnp.zeros((1, H, W, 6)))["params"]
    interp = SloMoUNet(5).init(k2, jnp.zeros((1, H, W, 20)))["params"]
    return {"flow": flow, "interp": interp}
