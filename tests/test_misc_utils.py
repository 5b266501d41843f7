"""Legacy data utils + misc helpers."""
import numpy as np
import jax.numpy as jnp

from ebfi_tpu.data.legacy_util import event2frame, filter_events, filter_events_by_space
from ebfi_tpu.utils import normalize_event_tensor, to_uint8_image, inf_loop, param_count


def test_event2frame(rng):
    n = 200
    xs = rng.integers(0, 16, n)
    ys = rng.integers(0, 12, n)
    ts = np.sort(rng.uniform(0, 1, n))
    ps = rng.choice([-1.0, 1.0], n)
    out = event2frame(xs, ys, ts, ps, (12, 16), ref_time=0.5)
    assert out.shape == (2, 2, 12, 16)
    assert out.sum() == n
    # pre-half contains exactly the t<=0.5 events
    assert out[0].sum() == (ts <= 0.5).sum()


def test_filters(rng):
    n = 100
    xs = rng.integers(0, 20, n)
    ys = rng.integers(0, 20, n)
    ts = np.sort(rng.uniform(0, 1, n))
    ps = rng.choice([-1.0, 1.0], n)
    fx, fy, ft, fp = filter_events(xs, ys, ts, ps, 0.2, 0.8)
    assert ((ft >= 0.2) & (ft < 0.8)).all()
    sx, sy, st, sp = filter_events_by_space(xs, ys, ts, ps, 5, 15, 5, 15)
    assert sx.max() < 10 and sx.min() >= 0


def test_normalize_event_tensor(rng):
    x = np.zeros((8, 8), np.float32)
    x[2:5, 2:5] = rng.standard_normal((3, 3)).astype(np.float32) * 4 + 3
    out = np.asarray(normalize_event_tensor(jnp.asarray(x)))
    nz = out[x != 0]
    assert abs(nz.mean()) < 1e-4 and abs(nz.std() - 1.0) < 1e-2
    assert (out[x == 0] == 0).all()


def test_misc(rng):
    img = rng.uniform(-0.5, 1.5, (4, 4, 3))
    u8 = to_uint8_image(img)
    assert u8.dtype == np.uint8 and u8.max() <= 255
    it = inf_loop([1, 2])
    assert [next(it) for _ in range(5)] == [1, 2, 1, 2, 1]
    assert param_count({"a": np.zeros((2, 3)), "b": np.zeros(4)}) == 10
