"""InferenceEngine: multi-timestamp modes vs per-T reference forwards."""
import numpy as np
import jax
import jax.numpy as jnp

from ebfi_tpu.infer import InferenceEngine
from test_models import default_model, make_inputs


def test_multi_modes_match_per_t_forward(rng):
    model = default_model()
    frame, event, t, ex = make_inputs(rng, B=2, H=24, W=32)
    params = model.init(jax.random.key(0), frame, event, t)
    engine = InferenceEngine(model, params, multi_chunk=3)

    N = 5
    ts = jnp.asarray(rng.uniform(0, 1, (2, N)).astype(np.float32))
    gt_ex = jnp.zeros((2, 1))

    per_t = [model.apply(params, frame, event, ts[:, [i]]) for i in range(N)]
    ref_sharp = np.stack([np.asarray(s) for s, _ in per_t])
    ref_final = np.stack([np.asarray(f) for _, f in per_t])

    for mode in ("scan", "batched"):
        sharps, finals = engine.interpolate(frame, event, ts, gt_ex, mode=mode)
        np.testing.assert_allclose(np.asarray(sharps), ref_sharp, atol=2e-5,
                                   err_msg=f"mode={mode}")
        np.testing.assert_allclose(np.asarray(finals), ref_final, atol=2e-5,
                                   err_msg=f"mode={mode}")


def test_hoisted_tail_matches_per_t_forward(rng):
    """The B=1 hoisted batched path (fast_math engines) == per-T forwards
    of the same fast-variant model, up to float reassociation."""
    model = default_model().clone(
        fast_recon=True, fast_detail=True, fast_mod=True, fast_control=True
    )
    frame, event, t, ex = make_inputs(rng, B=1, H=24, W=32)
    params = model.init(jax.random.key(0), frame, event, t)
    engine = InferenceEngine(
        model, params, precision="f32", multi_chunk=3, fast_math=True
    )
    assert engine._hoist

    N = 5
    ts = jnp.asarray(rng.uniform(0, 1, (1, N)).astype(np.float32))
    per_t = [model.apply(params, frame, event, ts[:, [i]]) for i in range(N)]
    ref_sharp = np.stack([np.asarray(s) for s, _ in per_t])
    ref_final = np.stack([np.asarray(f) for _, f in per_t])

    sharps, finals = engine.interpolate(frame, event, ts, jnp.zeros((1, 1)))
    np.testing.assert_allclose(np.asarray(sharps), ref_sharp, rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(finals), ref_final, rtol=1e-4, atol=2e-5)


def test_hoisted_tail_rc_subchunk_matches(rng):
    """rc_tail_subchunk splits the RC tail batch; results are unchanged."""
    model = default_model().clone(
        fast_recon=True, fast_detail=True, fast_mod=True, fast_control=True,
        rc_tail_subchunk=2,
    )
    frame, event, t, ex = make_inputs(rng, B=1, H=24, W=32)
    params = model.init(jax.random.key(0), frame, event, t)
    engine = InferenceEngine(
        model, params, precision="f32", multi_chunk=4, fast_math=True
    )
    N = 4
    ts = jnp.asarray(rng.uniform(0, 1, (1, N)).astype(np.float32))
    per_t = [model.apply(params, frame, event, ts[:, [i]]) for i in range(N)]
    _, finals = engine.interpolate(frame, event, ts, outputs="final")
    np.testing.assert_allclose(
        np.asarray(finals),
        np.stack([np.asarray(f) for _, f in per_t]),
        rtol=1e-4, atol=2e-5,
    )


def test_hoisted_tail_matches_standard_paths(rng):
    """Hoisted tail on the STANDARD (non-fast) model paths: exercises the
    XLA hoist/tail of ResidualControl and the bank-split Modification."""
    model = default_model()
    frame, event, t, ex = make_inputs(rng, B=1, H=24, W=32)
    params = model.init(jax.random.key(0), frame, event, t)
    engine = InferenceEngine(
        model, params, precision="f32", multi_chunk=4, fast_math=True
    )
    # fast_math=True clones fast variants in; force them off to hit the
    # standard-path hoist branches
    engine.model = model
    assert engine._hoist

    N = 3
    ts = jnp.asarray(rng.uniform(0, 1, (1, N)).astype(np.float32))
    per_t = [model.apply(params, frame, event, ts[:, [i]]) for i in range(N)]
    sharps, finals = engine.interpolate(frame, event, ts, jnp.zeros((1, 1)))
    np.testing.assert_allclose(
        np.asarray(sharps),
        np.stack([np.asarray(s) for s, _ in per_t]),
        rtol=1e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(finals),
        np.stack([np.asarray(f) for _, f in per_t]),
        rtol=1e-4, atol=2e-5,
    )


def test_hoisted_tail_bf16_smoke(rng):
    """The production bf16 engine (hoisted + packed pipelines) stays close
    to the f32 per-T forwards — bf16-rounding-scale tolerance."""
    model = default_model()
    frame, event, t, ex = make_inputs(rng, B=1, H=24, W=32)
    params = model.init(jax.random.key(0), frame, event, t)
    engine = InferenceEngine(model, params, precision="bf16", multi_chunk=4)
    assert engine._hoist

    N = 4
    ts = jnp.asarray(rng.uniform(0, 1, (1, N)).astype(np.float32))
    fast = engine.model  # the cloned fast-variant model
    per_t = [fast.apply(params, frame, event, ts[:, [i]]) for i in range(N)]
    _, finals = engine.interpolate(frame, event, ts, outputs="final")
    ref = np.stack([np.asarray(f) for _, f in per_t])
    got = np.asarray(finals)
    assert got.shape == ref.shape and np.all(np.isfinite(got))
    # bf16 has ~3 decimal digits; the detail residual is O(1)
    np.testing.assert_allclose(got, ref, atol=0.15)
    assert np.mean(np.abs(got - ref)) < 0.02


def test_hoisted_tail_multi_frame_matches_per_t_forward(rng):
    """F>1 blurry frames through the hoisted batched path (the outer
    frame-scan added for multi-frame amortization) == per-T forwards of
    the same fast-variant model at batch F."""
    model = default_model().clone(
        fast_recon=True, fast_detail=True, fast_mod=True, fast_control=True
    )
    F = 3
    frame, event, t, ex = make_inputs(rng, B=F, H=24, W=32)
    params = model.init(jax.random.key(0), frame, event, t)
    engine = InferenceEngine(
        model, params, precision="f32", multi_chunk=3, fast_math=True
    )
    assert engine._hoist

    N = 5  # chunk 3 -> 2 chunks with edge padding
    ts = jnp.asarray(rng.uniform(0, 1, (F, N)).astype(np.float32))
    # per-frame timestamps DIFFER across the batch: forward each column
    per_t = [model.apply(params, frame, event, ts[:, [i]]) for i in range(N)]
    ref_sharp = np.stack([np.asarray(s) for s, _ in per_t])
    ref_final = np.stack([np.asarray(f) for _, f in per_t])

    sharps, finals = engine.interpolate(frame, event, ts, jnp.zeros((F, 1)))
    assert finals.shape == (N, F, 24, 32, 3)
    np.testing.assert_allclose(np.asarray(sharps), ref_sharp, rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(finals), ref_final, rtol=1e-4, atol=2e-5)


def test_hoisted_tail_non_multiple_of_8(rng):
    """Hoisted fast engine on a non-/8 input (RealBlur-DAVIS is 260x346):
    the engine pads to /8, so every packed pipeline must engage cleanly
    and the crop must restore the original size."""
    model = default_model().clone(
        fast_recon=True, fast_detail=True, fast_mod=True, fast_control=True
    )
    frame, event, t, ex = make_inputs(rng, B=1, H=30, W=36)
    params = model.init(jax.random.key(0), frame, event, t)
    engine = InferenceEngine(
        model, params, precision="f32", multi_chunk=3, fast_math=True
    )
    N = 3
    ts = jnp.asarray(rng.uniform(0, 1, (1, N)).astype(np.float32))
    per_t = [model.apply(params, frame, event, ts[:, [i]]) for i in range(N)]
    _, finals = engine.interpolate(frame, event, ts, outputs="final")
    assert finals.shape == (N, 1, 30, 36, 3)
    np.testing.assert_allclose(
        np.asarray(finals),
        np.stack([np.asarray(f) for _, f in per_t]),
        rtol=1e-4, atol=2e-5,
    )


def test_outputs_final_matches_both(rng):
    """outputs='final' returns (None, finals) identical to the full call."""
    model = default_model()
    frame, event, t, ex = make_inputs(rng, B=1, H=24, W=32)
    params = model.init(jax.random.key(0), frame, event, t)
    engine = InferenceEngine(model, params, multi_chunk=3)
    ts = jnp.asarray(rng.uniform(0, 1, (1, 4)).astype(np.float32))
    _, f_both = engine.interpolate(frame, event, ts)
    s_only, f_only = engine.interpolate(frame, event, ts, outputs="final")
    assert s_only is None
    np.testing.assert_allclose(np.asarray(f_only), np.asarray(f_both), atol=1e-6)


def test_engine_single_forward_matches_model(rng):
    model = default_model()
    frame, event, t, ex = make_inputs(rng)
    params = model.init(jax.random.key(0), frame, event, t)
    engine = InferenceEngine(model, params)
    s1, f1 = engine.forward(frame, event, t, jnp.zeros((2, 1)))
    s2, f2 = model.apply(params, frame, event, t)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
