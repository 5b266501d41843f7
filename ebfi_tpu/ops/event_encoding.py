"""Device-side event rasterizers (scatter-binning).

The reference encodes a variable-length event stream into a fixed
``2 x TB x H x W`` per-polarity count stack on the CPU inside dataloader
workers (dataloader/encodings.py:307-350 `events_to_stack`, :18-74
`events_to_image_torch`), via a Python loop of binary searches and
`index_put_` scatters per bin.

Here the rasterizer is a single vectorized scatter-add that runs on device
(or host) under jit: bin assignment is ``floor((t - t0)/dt * B)`` — the
closed-form equivalent of the reference's per-bin binary-search slicing —
and all bins/polarities scatter through one flattened `.at[].add`.  Events
are padded to a static max length and masked, keeping shapes static for XLA.

Value semantics match the reference exactly: the per-bin image accumulates
``ps * mask_pos`` where ``mask_pos = ps * [ps > 0]`` — i.e. **ps squared**
per event (a count of 1 for unit polarities) in both the positive and the
negative channel (encodings.py:333-341).  Out-of-range pixels are dropped
(encodings.py:36-41), and fewer than 4 valid events (or all-zero timestamps)
produce an all-zero stack (encodings.py:319-320).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_bins", "sensor_size"))
def events_to_stack(
    xs: jax.Array,
    ys: jax.Array,
    ts: jax.Array,
    ps: jax.Array,
    num_bins: int,
    sensor_size: tuple[int, int],
    n_valid: jax.Array | None = None,
) -> jax.Array:
    """Per-polarity temporal-bin count stack.

    Args:
      xs, ys: (N,) pixel coordinates (any numeric dtype; truncated to int).
      ts: (N,) timestamps, sorted ascending over the valid prefix.
      ps: (N,) polarities (+/-1 convention; general values accumulate ps**2).
      num_bins: TB, number of temporal bins.
      sensor_size: (H, W).
      n_valid: scalar count of valid events in the prefix; defaults to N.

    Returns: (2, num_bins, H, W) float32 — [positive, negative] channels,
    matching `events_to_stack` (encodings.py:307-350).
    """
    H, W = sensor_size
    N = ts.shape[0]
    if n_valid is None:
        n_valid = jnp.asarray(N, dtype=jnp.int32)
    n_valid = n_valid.astype(jnp.int32)

    valid = jnp.arange(N, dtype=jnp.int32) < n_valid
    ts = jnp.asarray(ts, jnp.float32)
    ps = jnp.asarray(ps, jnp.float32)
    xi = jnp.asarray(xs, jnp.float32).astype(jnp.int32)
    yi = jnp.asarray(ys, jnp.float32).astype(jnp.int32)

    # Bin edges with the reference's exact op order (encodings.py:324-331),
    # bins CLOSED on both sides — an event exactly on a shared edge lands
    # in BOTH adjacent bins, matching the reference's binary-search
    # left/right slicing.  Membership per bin b requires
    # tstart[b] <= t <= tend[b]; edge rounding can also open gaps or
    # overlaps between consecutive bins, which this reproduces.
    # Precision note: the reference (and the numpy/C++ host twins, the
    # actual data path) computes edges in f64 (its loader promotes ts to
    # f64, h5dataset.py:337); TPUs have no f64, so this device twin uses
    # f32 — events within ~1 f32 ulp of a bin edge may be assigned to the
    # neighboring bin relative to the host path.  Away from edges the
    # twins are bit-identical.
    t0 = ts[0]
    t1 = ts[jnp.maximum(n_valid - 1, 0)]
    dt = t1 - t0 + jnp.float32(1e-6)
    delta = dt / jnp.float32(num_bins)
    tstart = t0 + delta * jnp.arange(num_bins, dtype=jnp.float32)
    tend = tstart + delta
    # last bin with tstart <= t, first bin with tend >= t (both ascending)
    b1 = jnp.sum(ts[:, None] >= tstart[None, :], axis=1).astype(jnp.int32) - 1
    b0 = jnp.sum(ts[:, None] > tend[None, :], axis=1).astype(jnp.int32)

    in_range = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    keep = valid & in_range
    pol = (ps < 0).astype(jnp.int32)  # 0: positive channel, 1: negative
    w = ps * ps  # reference accumulates ps * (sign-masked ps) = ps^2

    b1c = jnp.clip(b1, 0, num_bins - 1)
    b0c = jnp.clip(b0, 0, num_bins - 1)
    keep1 = keep & (b1 >= 0) & (ts <= tend[b1c])
    keep0 = keep & (b0 < b1) & (b0 <= num_bins - 1) & (ts >= tstart[b0c])

    def scatter(out, bins, k):
        flat = ((pol * num_bins + bins) * H + yi) * W + xi
        flat = jnp.where(k, flat, -1)
        return out.at[flat].add(jnp.where(k, w, 0.0), mode="drop")

    out = jnp.zeros((2 * num_bins * H * W,), jnp.float32)
    out = scatter(out, b1c, keep1)
    out = scatter(out, b0c, keep0)
    out = out.reshape(2, num_bins, H, W)

    # Degenerate-stream guard (encodings.py:319-320).
    ts_sum = jnp.sum(jnp.where(valid, ts, 0.0))
    nonzero = (ts_sum != 0.0) & (n_valid > 3)
    return jnp.where(nonzero, out, jnp.zeros_like(out))


@partial(jax.jit, static_argnames=("sensor_size",))
def events_to_channels(
    xs: jax.Array,
    ys: jax.Array,
    ps: jax.Array,
    sensor_size: tuple[int, int],
    n_valid: jax.Array | None = None,
) -> jax.Array:
    """Two-channel polarity count image (encodings.py:289-304): channel 0
    accumulates ps^2 for positive events, channel 1 for negative.
    Returns (2, H, W) float32."""
    H, W = sensor_size
    N = ps.shape[0]
    if n_valid is None:
        n_valid = jnp.asarray(N, dtype=jnp.int32)
    valid = jnp.arange(N, dtype=jnp.int32) < n_valid.astype(jnp.int32)
    xi = jnp.asarray(xs, jnp.float32).astype(jnp.int32)
    yi = jnp.asarray(ys, jnp.float32).astype(jnp.int32)
    ps = jnp.asarray(ps, jnp.float32)
    keep = valid & (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    pol = (ps < 0).astype(jnp.int32)
    flat = jnp.where(keep, (pol * H + yi) * W + xi, -1)
    out = jnp.zeros((2 * H * W,), jnp.float32)
    out = out.at[flat].add(jnp.where(keep, ps * ps, 0.0), mode="drop")
    return out.reshape(2, H, W)


@partial(jax.jit, static_argnames=("sensor_size",))
def events_to_mask(
    xs: jax.Array,
    ys: jax.Array,
    ps: jax.Array,
    sensor_size: tuple[int, int],
) -> jax.Array:
    """Binary activity mask |ps| at event locations, last-write semantics
    (encodings.py:353-377).  Returns (H, W) float32."""
    H, W = sensor_size
    xi = jnp.asarray(xs, jnp.float32).astype(jnp.int32)
    yi = jnp.asarray(ys, jnp.float32).astype(jnp.int32)
    ps = jnp.asarray(ps, jnp.float32)
    keep = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    flat = jnp.where(keep, yi * W + xi, -1)
    out = jnp.zeros((H * W,), jnp.float32)
    out = out.at[flat].set(jnp.where(keep, jnp.abs(ps), 0.0), mode="drop")
    return out.reshape(H, W)


def events_polarity_mask(ps: jax.Array) -> jax.Array:
    """(N,) polarities -> (N, 2) one-hot-ish mask (encodings.py:380-391)."""
    ps = jnp.asarray(ps, jnp.float32)
    pos = jnp.where(ps > 0, ps, 0.0)
    neg = jnp.where(ps < 0, -ps, 0.0)
    return jnp.stack([pos, neg], axis=1)


def get_hot_event_mask(event_rate: jax.Array, idx: int, max_px: int = 100,
                       min_obvs: int = 5, max_rate: float = 0.8) -> jax.Array:
    """Hot-pixel suppression mask (encodings.py:394-409): zero the up-to
    `max_px` highest-rate pixels above `max_rate` once enough observations
    accumulated.  Vectorized: instead of the reference's sequential argmax
    loop, mask the top-k pixels exceeding the rate threshold."""
    if idx <= min_obvs:
        return jnp.ones_like(event_rate)
    flat = event_rate.reshape(-1)
    k = min(max_px, flat.shape[0])
    top_vals, top_idx = jax.lax.top_k(flat, k)
    mask = jnp.ones_like(flat)
    mask = mask.at[top_idx].min(jnp.where(top_vals > max_rate, 0.0, 1.0))
    return mask.reshape(event_rate.shape)


@partial(jax.jit, static_argnames=("num_bins", "sensor_size"))
def events_to_voxel(
    xs: jax.Array,
    ys: jax.Array,
    ts: jax.Array,
    ps: jax.Array,
    num_bins: int,
    sensor_size: tuple[int, int],
    n_valid: jax.Array | None = None,
) -> jax.Array:
    """Temporally-bilinear signed voxel grid.

    Matches `events_to_voxel_torch(temporal_bilinear=True)`
    (encodings.py:102-150): each event deposits ``ps * max(0, 1-|t_n - bi|)``
    into every bin ``bi``, with ``t_n = (t-t0)/dt * (B-1)``.

    Returns: (num_bins, H, W) float32.
    """
    H, W = sensor_size
    N = ts.shape[0]
    if n_valid is None:
        n_valid = jnp.asarray(N, dtype=jnp.int32)
    n_valid = n_valid.astype(jnp.int32)

    valid = jnp.arange(N, dtype=jnp.int32) < n_valid
    ts = jnp.asarray(ts, jnp.float32)
    ps = jnp.asarray(ps, jnp.float32)
    xi = jnp.asarray(xs, jnp.float32).astype(jnp.int32)
    yi = jnp.asarray(ys, jnp.float32).astype(jnp.int32)

    t0 = ts[0]
    t1 = ts[jnp.maximum(n_valid - 1, 0)]
    dt = t1 - t0 + 1e-6
    t_norm = (ts - t0) / dt * (num_bins - 1)

    in_range = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    keep = valid & in_range
    base = yi * W + xi

    out = jnp.zeros((num_bins * H * W,), jnp.float32)
    for bi in range(num_bins):
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(t_norm - bi)) * ps
        flat = jnp.where(keep, bi * H * W + base, -1)
        out = out.at[flat].add(jnp.where(keep, wgt, 0.0), mode="drop")
    out = out.reshape(num_bins, H, W)

    ts_sum = jnp.sum(jnp.where(valid, ts, 0.0))
    nonzero = (ts_sum != 0.0) & (n_valid > 3)
    return jnp.where(nonzero, out, jnp.zeros_like(out))
