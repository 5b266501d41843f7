"""SuperSloMo upsampler parity against the reference's own code.

Loads generate_dataset/upsampling/utils/model.py (and the Upsampler's
adaptive loop) from /root/reference directly, with lightweight shims for
the imports unavailable in-image (torchvision, skvideo), random-inits the
two UNets, converts their state_dicts through our converter, and asserts
our JAX forward + adaptive interpolation matches torch.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_MODEL = "/root/reference/generate_dataset/upsampling/utils/model.py"


@pytest.fixture(scope="module")
def ref_model():
    # other test modules may have installed their own partial torchvision
    # shim (test_reference_parity) — ensure the pieces model.py imports
    # exist regardless of test ordering
    tv = sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    tr = sys.modules.setdefault(
        "torchvision.transforms", types.ModuleType("torchvision.transforms")
    )
    for name in ("Normalize", "Compose", "ToTensor"):
        if not hasattr(tr, name):
            setattr(tr, name, type(name, (), {"__init__": lambda self, *a, **k: None}))
    if not hasattr(tv, "transforms"):
        tv.transforms = tr
    spec = importlib.util.spec_from_file_location("ref_slomo_model", REF_MODEL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _torch_unet(ref_model, cin, cout, seed):
    torch.manual_seed(seed)
    net = ref_model.UNet(cin, cout).double()
    net.eval()
    return net


def _convert(net):
    from ebfi_tpu.models.superslomo import _convert_unet_state

    sd = {k: v.detach().float().numpy() for k, v in net.state_dict().items()}
    return _convert_unet_state(sd)


def test_unet_forward_matches_reference(ref_model):
    import jax.numpy as jnp
    from ebfi_tpu.models.superslomo import SloMoUNet

    net = _torch_unet(ref_model, 6, 4, seed=0).float()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 6, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()

    params = _convert(net)
    out = SloMoUNet(4).apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
    )


def test_back_warp_matches_reference(ref_model):
    import jax.numpy as jnp
    from ebfi_tpu.models.superslomo import back_warp

    rng = np.random.default_rng(1)
    H, W = 24, 32
    img = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    flow = (3.0 * rng.standard_normal((1, 2, H, W))).astype(np.float32)
    bw = ref_model.backWarp(W, H, torch.device("cpu"))
    with torch.no_grad():
        ref = bw(torch.from_numpy(img), torch.from_numpy(flow)).numpy()

    out = back_warp(
        jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(flow.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )


def test_adaptive_interpolation_matches_reference(ref_model):
    """Drives the reference's _upsample_adaptive (upsampler.py:160-209) via
    the real class, against our interpolate_pair, with shared random nets."""
    import jax.numpy as jnp
    from ebfi_tpu.models.superslomo import SuperSloMo

    # import the reference Upsampler class without running its __init__
    for name in ("skvideo", "skvideo.io"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.path.insert(0, "/root/reference/generate_dataset")
    try:
        from upsampling.utils import upsampler as ref_up
    finally:
        sys.path.pop(0)

    flow_net = _torch_unet(ref_model, 6, 4, seed=0).float()
    interp_net = _torch_unet(ref_model, 20, 5, seed=1).float()
    # untrained nets predict sub-pixel flow (ceil -> 1 -> zero insertions,
    # a vacuous test); inflate the flow head bias to force |flow| ~ 3-4
    with torch.no_grad():
        flow_net.conv3.bias += torch.tensor([3.5, -2.5, 1.5, -3.0])

    ups = object.__new__(ref_up.Upsampler)
    ups.device = torch.device("cpu")
    ups.flowComp = flow_net
    ups.ArbTimeFlowIntrp = interp_net
    ups.flowBackWarp_dict = {}
    ups.negmean = torch.zeros(3, 1, 1)
    ups._move_to_device = lambda m, d: m  # instance attr shadows classmethod

    rng = np.random.default_rng(2)
    H, W = 32, 32
    i0 = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    # shifted copy so the flow net sees real structure
    i1 = np.roll(i0, 2, axis=3)

    with torch.no_grad():
        flow_out = flow_net(torch.cat([torch.from_numpy(i0), torch.from_numpy(i1)], 1))
        f01, f10 = flow_out[:, :2], flow_out[:, 2:]
        frames, times = [], []
        ups._upsample_adaptive(
            torch.from_numpy(i0), torch.from_numpy(i1),
            0.0, 1.0, f01, f10, frames, times,
        )

    params = {"flow": _convert(flow_net), "interp": _convert(interp_net)}
    slomo = SuperSloMo(params)
    ours, ts = slomo.interpolate_pair(
        jnp.asarray(i0.transpose(0, 2, 3, 1)), jnp.asarray(i1.transpose(0, 2, 3, 1))
    )

    assert len(frames) > 0, "oracle inserted nothing — test would be vacuous"
    assert len(ours) == len(frames), "adaptive insertion count differs"
    np.testing.assert_allclose(ts, [float(t) for t in times], rtol=1e-6)
    for got, want in zip(ours, frames):
        np.testing.assert_allclose(
            got[0].transpose(2, 0, 1), want.numpy(), rtol=2e-3, atol=2e-3
        )


def test_upsample_sequence_shapes():
    from ebfi_tpu.models.superslomo import SuperSloMo, init_params

    slomo = SuperSloMo(init_params(0))
    rng = np.random.default_rng(3)
    frames = rng.uniform(0, 1, (3, 32, 32, 3)).astype(np.float32)
    out, ts = slomo.upsample_sequence(frames, [0.0, 0.5, 1.0])
    assert out.shape[0] == len(ts) >= 2
    assert ts == sorted(ts)
    # the reference's pair loop emits I0 + intermediates only — the final
    # input frame (and its timestamp) is never written (upsampler.py:119-123)
    assert ts[-1] < 1.0
    assert out.min() >= 0.0 and out.max() <= 1.0
