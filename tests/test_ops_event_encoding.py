"""Event rasterizers: device scatter kernel vs the numpy parity encoder, and
the numpy encoder vs a literal torch port of the reference's bin slicing."""
import numpy as np
import jax.numpy as jnp

from ebfi_tpu.data.encodings import events_to_stack_np, normalize_event_ts
from ebfi_tpu.ops import events_to_stack, events_to_voxel


def make_events(rng, n=500, H=12, W=16):
    xs = rng.integers(0, W, n).astype(np.float32)
    ys = rng.integers(0, H, n).astype(np.float32)
    ts = np.sort(rng.uniform(0.0, 1.0, n)).astype(np.float64)
    ps = rng.choice([-1.0, 1.0], n).astype(np.float32)
    return xs, ys, ts, ps


def test_numpy_matches_reference_torch_port(rng):
    """Literal port of encodings.py:307-350 using torch ops as the oracle."""
    import torch

    def ref_stack(xs, ys, ts, ps, B, sensor_size):
        xs, ys, ts, ps = map(torch.as_tensor, (xs, ys, ts, ps))
        H, W = sensor_size
        if ts.sum() == 0 or len(ts) <= 3:
            return np.zeros((2, B, H, W), np.float32)
        dt = ts[-1] - ts[0] + 1e-6
        delta = dt / B
        pos, neg = [], []
        tsn = ts.numpy()
        for bi in range(B):
            tstart = float(ts[0] + delta * bi)
            tend = tstart + float(delta)
            beg = int(np.searchsorted(tsn, tstart, side="left"))
            end = int(np.searchsorted(tsn, tend, side="right"))
            p = ps[beg:end]
            mask_pos = p.clone(); mask_pos[p < 0] = 0
            mask_neg = p.clone(); mask_neg[p > 0] = 0
            for msk, acc in ((mask_pos, pos), (mask_neg, neg)):
                img = torch.zeros(H, W)
                img.index_put_((ys[beg:end].long(), xs[beg:end].long()), p * msk,
                               accumulate=True)
                acc.append(img)
        return torch.stack([torch.stack(pos), torch.stack(neg)]).numpy()

    xs, ys, ts, ps = make_events(rng)
    tsn = normalize_event_ts(ts)
    ref = ref_stack(xs, ys, tsn, ps, 8, (12, 16))
    got = events_to_stack_np(xs, ys, tsn, ps, 8, (12, 16))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_device_matches_numpy(rng):
    xs, ys, ts, ps = make_events(rng, n=800)
    tsn = normalize_event_ts(ts)
    ref = events_to_stack_np(xs, ys, tsn, ps, 16, (12, 16))
    got = np.asarray(events_to_stack(jnp.asarray(xs), jnp.asarray(ys),
                                     jnp.asarray(tsn), jnp.asarray(ps),
                                     16, (12, 16)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_device_padded_matches_unpadded(rng):
    """Static max-length padding + n_valid must not change the result."""
    xs, ys, ts, ps = make_events(rng, n=300)
    tsn = normalize_event_ts(ts)
    ref = np.asarray(events_to_stack(jnp.asarray(xs), jnp.asarray(ys),
                                     jnp.asarray(tsn), jnp.asarray(ps), 8, (12, 16)))
    pad = 212
    xs_p = np.concatenate([xs, np.zeros(pad, np.float32)])
    ys_p = np.concatenate([ys, np.zeros(pad, np.float32)])
    ts_p = np.concatenate([tsn, np.full(pad, 2.0)])
    ps_p = np.concatenate([ps, np.ones(pad, np.float32)])
    got = np.asarray(events_to_stack(jnp.asarray(xs_p), jnp.asarray(ys_p),
                                     jnp.asarray(ts_p), jnp.asarray(ps_p),
                                     8, (12, 16), n_valid=jnp.asarray(300)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_degenerate_stream_is_zero():
    z = np.zeros(2, np.float32)
    out = np.asarray(events_to_stack(jnp.asarray(z), jnp.asarray(z),
                                     jnp.asarray(z), jnp.asarray(z), 4, (4, 4)))
    assert out.shape == (2, 4, 4, 4)
    assert np.all(out == 0)


def test_out_of_range_dropped(rng):
    xs = np.array([0, 5, 100, -1], np.float32)
    ys = np.array([0, 3, 2, 2], np.float32)
    ts = np.array([0.0, 0.3, 0.6, 1.0], np.float64)
    ps = np.array([1, -1, 1, 1], np.float32)
    got = np.asarray(events_to_stack(jnp.asarray(xs), jnp.asarray(ys),
                                     jnp.asarray(ts), jnp.asarray(ps), 2, (4, 8)))
    # only the two in-range events land
    assert got.sum() == 2.0
    assert got[0, 0, 0, 0] == 1.0  # positive @ t=0 -> bin 0
    assert got[1, 0, 3, 5] == 1.0  # negative @ t=0.3 -> bin 0


def test_voxel_temporal_bilinear(rng):
    """events_to_voxel vs direct dense computation."""
    xs, ys, ts, ps = make_events(rng, n=200, H=6, W=7)
    tsn = normalize_event_ts(ts)
    B = 5
    t_norm = (tsn - tsn[0]) / (tsn[-1] - tsn[0] + 1e-6) * (B - 1)
    ref = np.zeros((B, 6, 7))
    for bi in range(B):
        w = np.maximum(0.0, 1.0 - np.abs(t_norm - bi)) * ps
        np.add.at(ref[bi], (ys.astype(int), xs.astype(int)), w)
    got = np.asarray(events_to_voxel(jnp.asarray(xs), jnp.asarray(ys),
                                     jnp.asarray(tsn), jnp.asarray(ps), B, (6, 7)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_stack_edge_timestamps_host_twins_agree():
    """Adversarial fixture: events placed EXACTLY on the f64 bin edges.

    The reference slices bins as closed intervals with f64 edge arithmetic
    (its loader promotes ts to f64 via np.concatenate of the f64 H5 ts
    column, h5dataset.py:337 + event_packagers.py:47, and only casts ps to
    f32), so an edge event lands in both adjacent bins.  Both host twins
    (numpy, C++) — the actual data path — must produce identical stacks on
    such a fixture, and they must match a literal f64 torch port of the
    reference's slicing (integer weights -> exact in every accumulation
    dtype).
    """
    import torch

    from ebfi_tpu.data.encodings import events_to_stack_np

    TB, H, W = 4, 8, 8
    t0, t_last = np.float64(0.25), np.float64(1.75)
    dt = np.float64(t_last - t0) + np.float64(1e-6)
    delta = np.float64(dt / np.float64(TB))
    edges = [np.float64(t0 + delta * np.float64(b)) for b in range(TB)]

    # first/last anchors plus one event exactly on every interior f64 edge
    # and a few interior (non-edge) fillers
    ts = np.array(
        [t0] + [edges[1], edges[2], edges[3]] + [0.5, 1.0, 1.5] + [t_last],
        np.float64,
    )
    order = np.argsort(ts, kind="stable")
    ts = ts[order]
    n = len(ts)
    rng = np.random.default_rng(0)
    xs = rng.integers(0, W, n).astype(np.float64)
    ys = rng.integers(0, H, n).astype(np.float64)
    ps = np.where(rng.uniform(size=n) < 0.5, -1.0, 1.0)

    ref = events_to_stack_np(xs, ys, ts, ps, TB, (H, W))

    # edge events must be double-counted: total mass > number of events
    assert ref.sum() > n - 0.5, "fixture failed to exercise double-counting"

    # literal f64 reference slicing (torch keeps the f64 dtype, as the
    # reference's concatenated event tensor does)
    tts, tps = torch.as_tensor(ts), torch.as_tensor(ps)
    oracle = np.zeros((2, TB, H, W))
    for bi in range(TB):
        tstart = float(tts[0] + (tts[-1] - tts[0] + 1e-6) / TB * bi)
        tend = tstart + float((tts[-1] - tts[0] + 1e-6) / TB)
        beg = int(np.searchsorted(ts, tstart, side="left"))
        end = int(np.searchsorted(ts, tend, side="right"))
        for i in range(beg, end):
            ch = 0 if ps[i] > 0 else 1
            oracle[ch, bi, int(ys[i]), int(xs[i])] += ps[i] * ps[i]
    np.testing.assert_array_equal(ref, oracle.astype(np.float32))

    import ebfi_tpu.native as native

    if native.available():
        nat = native.events_to_stack_native(xs, ys, ts, ps, TB, (H, W))
        np.testing.assert_array_equal(nat, ref)


def test_stack_device_twin_matches_host_off_edges():
    """The device twin computes bin edges in f32 (TPU has no f64) and may
    differ from the f64 host path only for events within ~1 f32 ulp of an
    edge.  On a fixture whose events are safely away from every edge, all
    three twins are bit-identical."""
    import jax.numpy as jnp

    from ebfi_tpu.data.encodings import events_to_stack_np
    from ebfi_tpu.ops.event_encoding import events_to_stack as device_stack

    TB, H, W = 4, 8, 8
    rng = np.random.default_rng(1)
    n = 400
    # timestamps quantized to bin centers +- small jitter, far from edges
    base = (rng.integers(0, TB, n) + 0.5) / TB
    ts = np.sort(base + rng.uniform(-0.1, 0.1, n) / TB).astype(np.float32)
    ts = ts.astype(np.float64)
    xs = rng.integers(0, W, n).astype(np.float64)
    ys = rng.integers(0, H, n).astype(np.float64)
    ps = np.where(rng.uniform(size=n) < 0.5, -1.0, 1.0)

    ref = events_to_stack_np(xs, ys, ts, ps, TB, (H, W))
    dev = np.asarray(
        device_stack(jnp.asarray(xs), jnp.asarray(ys),
                     jnp.asarray(ts, jnp.float32), jnp.asarray(ps),
                     TB, (H, W))
    )
    np.testing.assert_array_equal(dev, ref)

    import ebfi_tpu.native as native

    if native.available():
        nat = native.events_to_stack_native(xs, ys, ts, ps, TB, (H, W))
        np.testing.assert_array_equal(nat, ref)
