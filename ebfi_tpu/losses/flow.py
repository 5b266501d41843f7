"""Contrast-maximization flow losses + image-of-warped-events machinery.

JAX ports of the legacy flow-training stack (loss/flow.py, myutils/iwe.py):

- :func:`get_interpolation` / :func:`interpolate_iwe` — warp events along a
  flow field toward a reference time and scatter them bilinearly into an
  image (iwe.py:20-92).
- :class:`EventWarping` — per-polarity average-timestamp contrast loss,
  forward + backward warping + Charbonnier flow smoothing
  (flow.py:15-110).
- :func:`averaged_iwe` — per-pixel average count of warped events
  (flow.py:113-232).  The per-pixel *unique-source counting* uses
  `np.unique` on host (the torch original loops `torch.unique` per batch;
  it is a diagnostics path, not a training hot loop).

Event lists are (B, N, 4) = (ts, y, x, p); flow is NHWC (B, H, W, 2) with
channel order (x, y) like the reference's flow maps.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _purge_unfeasible(idx: jax.Array, res) -> Tuple[jax.Array, jax.Array]:
    """Zero out-of-image warped locations (iwe.py:4-17)."""
    mask = (
        (idx[..., 0:1] >= 0)
        & (idx[..., 0:1] < res[0])
        & (idx[..., 1:2] >= 0)
        & (idx[..., 1:2] < res[1])
    ).astype(idx.dtype)
    return idx * mask, mask


def get_interpolation(events, event_flow, tref, res, flow_scaling, round_idx=False):
    """Warped (y, x) scatter indices + bilinear weights (iwe.py:20-74).

    events: (B, N, 4) with (ts, y, x, p); event_flow: (B, N, 2) as (y, x).
    Returns (flat_idx (B, 4N or N, 1), weights (B, 4N or N, 1)).
    """
    warped = events[:, :, 1:3] + (tref - events[:, :, 0:1]) * event_flow * flow_scaling
    if round_idx:
        idx = jnp.round(warped)
        weights = jnp.ones_like(idx[..., :1])
        idx, mask = _purge_unfeasible(idx, res)
        weights = weights * mask
    else:
        ty = jnp.floor(warped[:, :, 0:1])
        by = ty + 1
        lx = jnp.floor(warped[:, :, 1:2])
        rx = lx + 1
        corners = jnp.concatenate(
            [
                jnp.concatenate([ty, lx], axis=2),
                jnp.concatenate([ty, rx], axis=2),
                jnp.concatenate([by, lx], axis=2),
                jnp.concatenate([by, rx], axis=2),
            ],
            axis=1,
        )
        warped4 = jnp.concatenate([warped] * 4, axis=1)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(warped4 - corners))
        idx, mask = _purge_unfeasible(corners, res)
        weights = jnp.prod(w, axis=-1, keepdims=True) * mask
    flat = (idx[:, :, 0] * res[1] + idx[:, :, 1])[..., None]
    return flat, weights


def interpolate_iwe(flat_idx, weights, res, polarity_mask=None):
    """Scatter weights into a (B, H, W, 1) image (iwe.py:77-92)."""
    if polarity_mask is not None:
        weights = weights * polarity_mask
    B = flat_idx.shape[0]
    out = jnp.zeros((B, res[0] * res[1]), weights.dtype)
    out = jax.vmap(lambda o, i, w: o.at[i].add(w))(
        out, flat_idx[..., 0].astype(jnp.int32), weights[..., 0]
    )
    return out.reshape(B, res[0], res[1], 1)


def _event_flow_lookup(flow, events, res):
    """Per-event flow vectors (flow.py:44-58).  flow: (B, H, W, 2) (x, y)."""
    flat = (events[:, :, 1] * res[1] + events[:, :, 2]).astype(jnp.int32)
    ff = flow.reshape(flow.shape[0], -1, 2)
    fx = jnp.take_along_axis(ff[..., 0], flat, axis=1)
    fy = jnp.take_along_axis(ff[..., 1], flat, axis=1)
    return jnp.stack([fy, fx], axis=2)  # (y, x) order for warping


class EventWarping:
    """flow.py:15-110.  __call__(flow_list, event_list, pol_mask, resolution)."""

    def __init__(self, flow_regul_weight: float = 1.0):
        self.weight = flow_regul_weight

    def __call__(self, flow_list, event_list, pol_mask, resolution) -> jax.Array:
        res = resolution
        flow_scaling = max(res)
        pol4 = jnp.concatenate([pol_mask] * 4, axis=1)
        ts4 = jnp.concatenate([event_list[:, :, 0:1]] * 4, axis=1)

        total = 0.0
        for flow in flow_list:
            ev_flow = _event_flow_lookup(flow, event_list, res)
            loss = 0.0
            for tref, ts_w in ((1.0, ts4), (0.0, 1.0 - ts4)):
                idx, w = get_interpolation(event_list, ev_flow, tref, res, flow_scaling)
                for p in range(2):
                    pm = pol4[:, :, p : p + 1]
                    iwe = interpolate_iwe(idx, w, res, pm)
                    iwe_ts = interpolate_iwe(idx, w * ts_w, res, pm)
                    avg_ts = iwe_ts / (iwe + 1e-9)
                    loss = loss + jnp.sum(avg_ts**2)
            dx = jnp.sqrt((flow[:, :-1, :, :] - flow[:, 1:, :, :]) ** 2 + 1e-6)
            dy = jnp.sqrt((flow[:, :, :-1, :] - flow[:, :, 1:, :]) ** 2 + 1e-6)
            total = total + loss + self.weight * (dx.sum() + dy.sum())
        return total


def deblur_events(flow, event_list, res, flow_scaling=128, round_idx=True,
                  polarity_mask=None):
    """iwe.py:95-126: image of flow-compensated events at tref=1."""
    ev_flow = _event_flow_lookup(flow, event_list, res)
    idx, w = get_interpolation(event_list, ev_flow, 1.0, res, flow_scaling, round_idx)
    if not round_idx and polarity_mask is not None:
        polarity_mask = jnp.concatenate([polarity_mask] * 4, axis=1)
    return interpolate_iwe(idx, w, res, polarity_mask)


def averaged_iwe(flow: np.ndarray, event_list: np.ndarray, pol_mask: np.ndarray,
                 res) -> np.ndarray:
    """flow.py:126-232 — per-pixel, per-polarity AVERAGE warped-event count:
    the warped count divided by the number of distinct source pixels that
    map to each destination pixel.  Host-side numpy (unique-counting is
    data-dependent)."""
    B = flow.shape[0]
    flow_scaling = max(res)
    ev = jnp.asarray(event_list)
    idx_src = (event_list[:, :, 1] * res[1] + event_list[:, :, 2]).astype(np.int64)
    ev_flow = np.asarray(_event_flow_lookup(jnp.asarray(flow), ev, res))
    fw_idx, fw_w = get_interpolation(ev, jnp.asarray(ev_flow), 1.0, res,
                                     flow_scaling, round_idx=True)
    fw_idx = np.asarray(fw_idx)[..., 0].astype(np.int64)
    fw_w = np.asarray(fw_w)[..., 0]

    out = np.zeros((B, 2, res[0], res[1]), np.float32)
    npx = res[0] * res[1]
    for b in range(B):
        for p in range(2):
            pm = pol_mask[b, :, p] > 0
            img = np.zeros(npx)
            np.add.at(img, fw_idx[b][pm], fw_w[b][pm])
            # distinct source pixels per destination, feasible events only
            feas = pm & (fw_w[b] > 0)
            pairs = np.stack([idx_src[b][feas], fw_idx[b][feas]], axis=1)
            if len(pairs):
                uniq = np.unique(pairs, axis=0)
                contrib = np.zeros(npx)
                np.add.at(contrib, uniq[:, 1], 1.0)
                nz = contrib > 0
                img[nz] = img[nz] / contrib[nz]
            out[b, p] = img.reshape(res)
    return out
