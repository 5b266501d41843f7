"""End-to-end training smoke on the virtual 8-device CPU mesh: data-parallel
train step, optimizer/schedule, trainer cadence, checkpoint round-trip."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ebfi_tpu.data.synth import write_clip_h5
from ebfi_tpu.data.dataloader import EBFIDataLoader
from ebfi_tpu.models import EVFIAutoEx
from ebfi_tpu.parallel import make_mesh, dp_shardings
from ebfi_tpu.train import build_optimizer, create_train_state, make_train_step, make_eval_step
from ebfi_tpu.train.checkpoint import save_checkpoint, restore_checkpoint, resume
from ebfi_tpu.train.optim import build_lr_schedule

from test_data import dataset_cfg


def tiny_model():
    return EVFIAutoEx(
        frame_basech=8, event_basech=8, inter_ch=8, tb=4,
        use_gt_ex=True, step=2, channels=(4, 6, 8, 12),
    )


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("h5") / "clip.h5")
    write_clip_h5(path, num_frames=48, H=32, W=32, seed=3)
    return path


def test_steplr_schedule_with_lr_min_gate():
    sched = build_lr_schedule("StepLR", 1e-4, {"step_size": 10, "gamma": 0.5}, lr_min=1e-5)
    assert float(sched(0)) == pytest.approx(1e-4)
    # the scheduler steps at the END of each nonzero iteration
    # (train_ours.py:335-348): update 10 still sees 9 scheduler steps, so
    # the first decay lands at update 11 — torch-lockstep-verified by
    # test_reference_parity.py::test_reference_multi_step_training_parity
    assert float(sched(10)) == pytest.approx(1e-4)
    assert float(sched(11)) == pytest.approx(5e-5)
    assert float(sched(25)) == pytest.approx(2.5e-5)
    # the gate steps WHILE lr >= lr_min, so the lr freezes one decay BELOW
    # lr_min (train_ours.py:335-338): 1e-4 * 0.5^4 = 6.25e-6 < 1e-5
    assert float(sched(100000)) == pytest.approx(6.25e-6)


def test_dp_train_step_runs_and_improves(clip, rng):
    assert jax.device_count() == 8
    model = tiny_model()
    mesh = make_mesh()
    batch_sh, repl = dp_shardings(mesh)

    B, H, W, TB = 8, 32, 32, 4
    frame = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    event = jnp.asarray(rng.standard_normal((B, H, W, 2 * TB)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 1, (B, 1)).astype(np.float32))
    ex = jnp.asarray(rng.uniform(0, 1, (B, 1)).astype(np.float32))
    target = frame

    params = model.init(jax.random.key(0), frame[:1], event[:1], t[:1], ex[:1])
    tx, sched = build_optimizer({"name": "Adam", "args": {"lr": 1e-3}})
    state = create_train_state(model, params, tx)
    state = jax.device_put(state, repl)

    step = make_train_step(model, mesh=mesh)
    batch = {
        "frame": jax.device_put(frame, batch_sh),
        "event": jax.device_put(event, batch_sh),
        "t": jax.device_put(t, batch_sh),
        "gt_ex": jax.device_put(ex, batch_sh),
        "target": jax.device_put(target, batch_sh),
    }
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["train_loss"]))
    assert int(state.step) == 4
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # same batch -> loss must drop

    ev = make_eval_step(model, mesh=mesh)
    m = ev(state.params, batch)
    assert np.isfinite(float(m["valid_loss"]))


def test_mixed_precision_train_step(clip, rng):
    """bf16 forward/backward with f32 master params: runs + improves."""
    model = tiny_model()
    B, H, W, TB = 2, 32, 32, 4
    frame = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    event = jnp.asarray(rng.standard_normal((B, H, W, 2 * TB)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 1, (B, 1)).astype(np.float32))
    ex = jnp.asarray(rng.uniform(0, 1, (B, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), frame, event, t, ex)
    tx, _ = build_optimizer({"name": "Adam", "args": {"lr": 1e-3}})
    state = create_train_state(model, params, tx)
    step = make_train_step(model, compute_dtype=jnp.bfloat16, donate=False)
    batch = {"frame": frame, "event": event, "t": t, "gt_ex": ex, "target": frame}
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["train_loss"]))
    assert np.all(np.isfinite(losses)) and losses[-1] < losses[0]
    # master params stayed f32
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(state.params))


def test_frozen_ex_keeps_exposure_params_bit_identical(rng):
    """FrozenEX (model_singleframe.py:51-54, train_ours.py:181-185): stage-2
    training with the freeze on leaves the ExposureDecision subtree
    bit-identical while every other subtree trains."""
    model = EVFIAutoEx(
        frame_basech=8, event_basech=8, inter_ch=8, tb=4,
        use_gt_ex=False, blurry_fashion="RGBLap", bl_in=4,
        step=2, channels=(4, 6, 8, 12), frozen_ex=True,
    )
    B, H, W, TB = 2, 32, 32, 4
    frame = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    event = jnp.asarray(np.abs(rng.standard_normal((B, H, W, 2 * TB))).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 1, (B, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), frame, event, t)

    tx, _ = build_optimizer(
        {"name": "Adam", "args": {"lr": 1e-3}}, freeze_subtree="exposure_decision"
    )
    state = create_train_state(model, params, tx)
    step = make_train_step(model, donate=False)
    batch = {"frame": frame, "event": event, "t": t, "target": frame}
    for _ in range(2):
        state, _ = step(state, batch)

    before = params["params"]["exposure_decision"]
    after = state.params["params"]["exposure_decision"]
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        before, after,
    )
    # ...and the rest did train
    moved = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for k in params["params"] if k != "exposure_decision"
        for a, b in zip(
            jax.tree.leaves(params["params"][k]),
            jax.tree.leaves(state.params["params"][k]),
        )
    ]
    assert any(moved)


def test_trainer_loop_with_loader(clip, tmp_path):
    """Three iterations through the real Trainer + loader + checkpoints."""
    from ebfi_tpu.train.config import ConfigParser
    from ebfi_tpu.train.trainer import Trainer

    cfg = {
        "experiment": "smoke",
        "model": {"name": "EVFIAutoEx"},
        "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
        "lr_scheduler": {"name": "StepLR", "args": {"step_size": 100, "gamma": 0.5}},
        "trainer": {
            "output_path": str(tmp_path),
            "iteration_based_train": {
                "enabled": True, "iterations": 3, "save_period": 2,
                "train_log_step": 1, "valid_log_step": 1, "valid_step": 2,
                "lr_change_rate": 1,
            },
            "epoch_based_train": {"enabled": False},
            "monitor": "min valid_loss",
            "early_stop": 10,
            "accu_step": 1,
            "do_validation": True,
            "lr_min": 1e-6,
        },
    }
    cp = ConfigParser(cfg, run_id="t0")

    model = tiny_model()
    dcfg = dataset_cfg(time_bins=4)
    train_loader = EBFIDataLoader(clip, dcfg, batch_size=2, shuffle=True, drop_last=True)
    valid_loader = EBFIDataLoader(clip, dcfg, batch_size=2)

    mesh = make_mesh(num_devices=2)
    batch_sh, repl = dp_shardings(mesh)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 8)),
        jnp.zeros((1, 1)), jnp.zeros((1, 1)),
    )
    tx, _ = build_optimizer(cfg["optimizer"], cfg["lr_scheduler"], lr_min=1e-6)
    state = jax.device_put(create_train_state(model, params, tx), repl)
    trainer = Trainer(
        cp, model, state,
        make_train_step(model, mesh=mesh),
        make_eval_step(model, mesh=mesh),
        train_loader, valid_loader,
        batch_sharding=batch_sh,
    )
    trainer.train()
    assert int(trainer.state.step) == 3
    saved = [d for d in os.listdir(cp.save_dir) if d.startswith("checkpoint")]
    assert saved, "expected a periodic checkpoint"

    # checkpoint round-trip with name guard
    path = os.path.join(cp.save_dir, saved[0])
    template = {
        "model_states": trainer.state.params,
        "opt_states": trainer.state.opt_state,
        "step": 0,
    }
    restored = resume(path, template, "EVFIAutoEx", "Adam")
    chex_equal = jax.tree.map(
        lambda a, b: np.allclose(a, b), restored["model_states"], trainer.state.params
    )
    # restored params belong to some earlier step; just check tree structure + finiteness
    assert jax.tree.structure(restored["model_states"]) == jax.tree.structure(
        trainer.state.params
    )
    with pytest.raises(ValueError):
        resume(path, template, "WrongName", "Adam")


def test_spatial_train_step_matches_dp(clip, rng):
    """DPxSP (H sharded over the model axis through fwd+bwd) produces the
    same loss and updated params as the DP-only step."""
    model = tiny_model()
    B, H, W, TB = 4, 32, 32, 4
    frame = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    event = rng.standard_normal((B, H, W, 2 * TB)).astype(np.float32)
    t = rng.uniform(0, 1, (B, 1)).astype(np.float32)
    ex = rng.uniform(0, 1, (B, 1)).astype(np.float32)
    batch_np = {"frame": frame, "event": event, "t": t, "gt_ex": ex, "target": frame}

    params = model.init(
        jax.random.key(0), jnp.asarray(frame[:1]), jnp.asarray(event[:1]),
        jnp.asarray(t[:1]), jnp.asarray(ex[:1]),
    )
    tx, _ = build_optimizer({"name": "Adam", "args": {"lr": 1e-3}})

    results = {}
    for tag, mp, spatial in (("dp", 1, False), ("dpxsp", 2, True)):
        mesh = make_mesh(num_devices=4, model_parallel=mp)
        batch_sh, repl = dp_shardings(mesh)
        state = jax.device_put(create_train_state(model, params, tx), repl)
        step = make_train_step(model, mesh=mesh, spatial=spatial, donate=False)
        batch = {k: jax.device_put(v, batch_sh) for k, v in batch_np.items()}
        state, metrics = step(state, batch)
        results[tag] = (
            float(metrics["train_loss"]),
            jax.tree.map(np.asarray, state.params),
        )

    assert np.isclose(results["dp"][0], results["dpxsp"][0], rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        results["dp"][1], results["dpxsp"][1],
    )


def test_fast_variants_config_key_trains(clip, rng):
    """model.args.FastVariants: true enables the fast execution paths for
    training via the factory; the step runs and improves."""
    from ebfi_tpu.models.factory import build_model

    model = build_model({"name": "EVFIAutoEx", "args": {
        "FrameBasech": 8, "EventBasech": 8, "InterCH": 8, "TB": 4,
        "UseGTEx": True, "step": 2, "DetailEnabled": True,
        "channels": [4, 6, 8, 12], "FastVariants": True,
    }})
    assert model.fast_recon and model.fast_detail and model.fast_control

    B, H, W, TB = 2, 32, 32, 4
    frame = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    event = jnp.asarray(rng.standard_normal((B, H, W, 2 * TB)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 1, (B, 1)).astype(np.float32))
    ex = jnp.asarray(rng.uniform(0, 1, (B, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), frame, event, t, ex)
    tx, _ = build_optimizer({"name": "Adam", "args": {"lr": 1e-3}})
    state = create_train_state(model, params, tx)
    step = make_train_step(model, detail_enabled=True)
    batch = {"frame": frame, "event": event, "t": t, "gt_ex": ex, "target": frame}
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["train_loss"]))
    assert np.all(np.isfinite(losses)) and losses[-1] < losses[0]


def test_fast_variants_mixed_precision_step(clip, rng):
    """bf16 compute + FastVariants: the fast-path conv transposes must be
    dtype-clean under autodiff (regression: preferred_element_type=f32 on
    the block convs broke the bf16 backward)."""
    from ebfi_tpu.models.factory import build_model

    model = build_model({"name": "EVFIAutoEx", "args": {
        "FrameBasech": 8, "EventBasech": 8, "InterCH": 8, "TB": 4,
        "UseGTEx": True, "step": 2, "DetailEnabled": True,
        "channels": [4, 6, 8, 12], "FastVariants": True,
    }})
    B, H, W, TB = 2, 32, 32, 4
    frame = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    event = jnp.asarray(rng.standard_normal((B, H, W, 2 * TB)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 1, (B, 1)).astype(np.float32))
    ex = jnp.asarray(rng.uniform(0, 1, (B, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), frame, event, t, ex)
    tx, _ = build_optimizer({"name": "Adam", "args": {"lr": 1e-3}})
    state = create_train_state(model, params, tx)
    step = make_train_step(model, compute_dtype=jnp.bfloat16, donate=False)
    batch = {"frame": frame, "event": event, "t": t, "gt_ex": ex, "target": frame}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["train_loss"]))


def test_multi_period_load_flattens_into_batch_stream(clip, rng):
    """NumPeriodPerLoad=2 windows train: each period contributes its own
    blurry frame / exposure / relative-ts row against the load's flattened
    NumP*NumF latent targets (the generalization of train_ours.py:238-248;
    the reference as shipped crashes on NumP>1 because squeeze(1) no-ops)."""
    from types import SimpleNamespace

    from ebfi_tpu.train.trainer import Trainer

    dcfg = dataset_cfg(time_bins=4, NumPeriodPerLoad=2, SlidingWindowLoad=2,
                       NumPeriodPerSeq=2, SlidingWindowSeq=2)
    loader = EBFIDataLoader(clip, dcfg, batch_size=2, drop_last=True)
    window = next(iter(loader))
    B, L, num_p = window["blurry"].shape[:3]
    assert num_p == 2
    num_i = window["relative_ts"].shape[-1]

    fake = SimpleNamespace(use_gt_ex=True)
    batches = list(Trainer._batches_from_window(fake, window))
    assert len(batches) == L * num_p * num_i
    for b in batches:
        assert b["frame"].shape == (B, 32, 32, 3)
        assert b["t"].shape == (B, 1)
        assert b["target"].shape == (B, 32, 32, 3)
        assert b["gt_ex"].shape == (B, 1)
    # period 1's timestamps are shifted by -1/NumP relative to period 0
    # (h5dataset GetTimestamp, reference h5dataset.py:360-364)
    t_p0 = window["relative_ts"][:, 0, 0, :]
    t_p1 = window["relative_ts"][:, 0, 1, :]
    np.testing.assert_allclose(t_p1, t_p0 - 0.5, atol=1e-6)

    # and the batches actually train: one DP step with finite loss
    model = tiny_model()
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 8)),
        jnp.zeros((1, 1)), jnp.zeros((1, 1)),
    )
    tx, _ = build_optimizer({"name": "Adam", "args": {"lr": 1e-3}})
    state = create_train_state(model, params, tx)
    step = make_train_step(model)
    state, metrics = step(state, batches[0])
    assert np.isfinite(float(metrics["train_loss"]))


def _loss_test_setup(clip, key_seed=0):
    from ebfi_tpu.train.train_step import build_adversarial, init_adv_state

    dcfg = dataset_cfg(time_bins=4)
    loader = EBFIDataLoader(clip, dcfg, batch_size=2, drop_last=True)
    window = next(iter(loader))
    batch = {
        "frame": jnp.asarray(window["blurry"][:, 0, 0]),
        "event": jnp.asarray(window["events"][:, 0]),
        "t": jnp.asarray(window["relative_ts"][:, 0, 0, [0]]),
        "target": jnp.asarray(window["latent"][:, 0, 0, 0]),
        "gt_ex": jnp.asarray(window["exposure"][:, 0, 0]),
    }
    model = tiny_model()
    params = model.init(
        jax.random.key(key_seed),
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 8)),
        jnp.zeros((1, 1)), jnp.zeros((1, 1)),
    )
    tx, _ = build_optimizer({"name": "Adam", "args": {"lr": 1e-3}})
    state = create_train_state(model, params, tx)
    return model, state, batch


def test_adversarial_loss_config_steps_discriminator(clip, rng):
    """trainer.loss.adversarial wires the GAN pack into the train step:
    discriminator params update every step (inside the step, like the
    reference's optimizer-in-the-loss pattern, loss/adversarial.py:86-141),
    generator loss stays finite, and generator grads differ from the
    plain Lap+census step's."""
    from ebfi_tpu.train.train_step import build_adversarial, init_adv_state

    model, state, batch = _loss_test_setup(clip)
    loss_cfg = {"adversarial": {"enabled": True, "gan_type": "STGAN",
                                "weight": 0.05, "patch_size": 32}}
    adv = build_adversarial(loss_cfg)
    state = state.replace(adv_state=init_adv_state(adv, jax.random.key(1), batch))
    step = make_train_step(model, loss_cfg=loss_cfg, donate=False)

    d0 = jax.tree.leaves(state.adv_state.params)[0].copy()
    for _ in range(3):
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["train_loss"]))
        assert np.isfinite(float(metrics["g_loss"]))
        assert np.isfinite(float(metrics["d_loss"]))
    d1 = jax.tree.leaves(state.adv_state.params)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1)), "disc params did not update"


def test_perceptual_loss_config_adds_lpips_term(clip, rng):
    model, state, batch = _loss_test_setup(clip)
    base_step = make_train_step(model, donate=False)
    lp_step = make_train_step(
        model, donate=False,
        loss_cfg={"perceptual": {"enabled": True, "weight": 0.5}},
    )
    _, m0 = base_step(state, batch)
    _, m1 = lp_step(state, batch)
    assert "lpips_loss" in m1 and np.isfinite(float(m1["lpips_loss"]))
    assert float(m1["train_loss"]) != float(m0["train_loss"])


def test_default_loss_cfg_is_bit_identical(clip, rng):
    """With no extra terms enabled, the config-driven step reproduces the
    plain Lap+census step bit-for-bit."""
    model, state, batch = _loss_test_setup(clip)
    step_a = make_train_step(model, donate=False)
    step_b = make_train_step(model, donate=False, loss_cfg={
        "adversarial": {"enabled": False}, "perceptual": {"enabled": False},
    })
    sa, ma = step_a(state, batch)
    sb, mb = step_b(state, batch)
    assert float(ma["train_loss"]) == float(mb["train_loss"])
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spatial_train_step_matches_dp_realistic_rows(rng):
    """DPxSP halo-exchange correctness where H-sharding actually matters:
    384 rows split over 2 model shards (192 rows each, several conv halos
    deep; 384 = 2^7*3 keeps the 5-level Laplacian pyramid even at every
    scale — the same /16 divisibility the reference's training crops
    satisfy).  Loss and updated params must match the DP-only step."""
    model = tiny_model()
    B, H, W, TB = 2, 384, 64, 4
    frame = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    event = rng.standard_normal((B, H, W, 2 * TB)).astype(np.float32)
    t = rng.uniform(0, 1, (B, 1)).astype(np.float32)
    ex = rng.uniform(0, 1, (B, 1)).astype(np.float32)
    batch_np = {"frame": frame, "event": event, "t": t, "gt_ex": ex, "target": frame}

    params = model.init(
        jax.random.key(0), jnp.asarray(frame[:1]), jnp.asarray(event[:1]),
        jnp.asarray(t[:1]), jnp.asarray(ex[:1]),
    )
    tx, _ = build_optimizer({"name": "Adam", "args": {"lr": 1e-3}})

    results = {}
    for tag, mp, spatial in (("dp", 1, False), ("dpxsp", 2, True)):
        mesh = make_mesh(num_devices=2, model_parallel=mp)
        batch_sh, repl = dp_shardings(mesh)
        state = jax.device_put(create_train_state(model, params, tx), repl)
        step = make_train_step(model, mesh=mesh, spatial=spatial, donate=False)
        batch = {k: jax.device_put(v, batch_sh) for k, v in batch_np.items()}
        state, metrics = step(state, batch)
        results[tag] = (
            float(metrics["train_loss"]),
            jax.tree.map(np.asarray, state.params),
        )

    assert np.isclose(results["dp"][0], results["dpxsp"][0], rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        results["dp"][1], results["dpxsp"][1],
    )


@pytest.mark.parametrize(
    "fashion,bl_in,fast",
    [("RGBLap", 4, False), ("DarkCh", 1, False), ("RGBLap", 4, True)],
)
def test_spatial_train_step_matches_dp_flagship_graph(rng, fashion, bl_in, fast):
    """DPxSP on the FULL flagship module graph (use_gt_ex=False so
    ExposureDecision + the blurriness map are in the loop, detail on, FAC
    in Modification): the graph pieces with nontrivial halo/collective
    behavior under H-sharding — the 35x35 dark-channel reduce_window
    (DarkCh), the Laplacian stencil (RGBLap), the global-avg-pool exposure
    head, and the correlation/GroupNorm block — must all still match the
    DP-only step through fwd+bwd.  Ref: myutils/utils.py:15-31,
    models/Ours/model_singleframe.py:56-76.

    fast=True runs the FastVariants execution paths (rows2 control, s2d
    recon, packed detail) whose reshapes reinterpret the H axis — exactly
    the axis DPxSP shards (VERDICT r4 #5).  The fused Pallas mod path has
    no SPMD rule; the spatial step falls back to its XLA twin
    (train_step.py), which this test exercises via the same clone."""
    model = EVFIAutoEx(
        frame_basech=8, event_basech=8, inter_ch=8, tb=4,
        use_gt_ex=False, blurry_fashion=fashion, bl_in=bl_in,
        step=2, dual_path=True, residual=True, detail_enabled=True,
        channels=(4, 6, 8, 12),
    )
    if fast:
        model = model.clone(
            fast_recon=True, fast_detail=True, fast_mod=True, fast_control=True
        )
    # 128 rows over 2 model shards (64 each): the 35x35 dark-channel
    # window needs a 17-row halo — a quarter of the shard
    B, H, W, TB = 2, 128, 32, 4
    frame = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    event = np.abs(rng.standard_normal((B, H, W, 2 * TB))).astype(np.float32)
    t = rng.uniform(0, 1, (B, 1)).astype(np.float32)
    batch_np = {"frame": frame, "event": event, "t": t, "target": frame}

    params = model.init(
        jax.random.key(0), jnp.asarray(frame[:1]), jnp.asarray(event[:1]),
        jnp.asarray(t[:1]),
    )
    tx, _ = build_optimizer({"name": "Adam", "args": {"lr": 1e-3}})

    results = {}
    for tag, mp, spatial in (("dp", 1, False), ("dpxsp", 2, True)):
        mesh = make_mesh(num_devices=2, model_parallel=mp)
        batch_sh, repl = dp_shardings(mesh)
        state = jax.device_put(create_train_state(model, params, tx), repl)
        step = make_train_step(model, mesh=mesh, spatial=spatial, donate=False)
        batch = {k: jax.device_put(v, batch_sh) for k, v in batch_np.items()}
        state, metrics = step(state, batch)
        results[tag] = (
            float(metrics["train_loss"]),
            jax.tree.map(np.asarray, state.params),
        )

    assert np.isclose(results["dp"][0], results["dpxsp"][0], rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        results["dp"][1], results["dpxsp"][1],
    )
