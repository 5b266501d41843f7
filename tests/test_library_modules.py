"""Library blocks, DCN modules, PSROI pooling."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ebfi_tpu.models.library import (
    ResidualBlock,
    TransposedConvLayer,
    UpsampleConvLayer,
    ConvLSTMCell,
    ConvGRUCell,
    RecurrentConvLayer,
    SelfAttention,
    MLP,
    UNet,
)
from ebfi_tpu.ops.dcn_modules import DCN, DCNSep, dcn_v2_psroi_pooling


def test_residual_and_upsample_blocks(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    for mod, shape in (
        (ResidualBlock(16), (2, 8, 8, 16)),
        (TransposedConvLayer(8), (2, 16, 16, 8)),
        (UpsampleConvLayer(8), (2, 16, 16, 8)),
    ):
        p = mod.init(jax.random.key(0), x)
        out = mod.apply(p, x)
        assert out.shape == shape and np.isfinite(np.asarray(out)).all()


def test_recurrent_cells_scan(rng):
    B, H, W, C = 2, 8, 8, 6
    seq = jnp.asarray(rng.standard_normal((4, B, H, W, 3)).astype(np.float32))

    cell = ConvLSTMCell(C)
    carry0 = ConvLSTMCell.init_carry(B, H, W, C)
    p = cell.init(jax.random.key(0), carry0, seq[0])
    carry, ys = jax.lax.scan(lambda c, x: cell.apply(p, c, x), carry0, seq)
    assert ys.shape == (4, B, H, W, C)

    gru = ConvGRUCell(C)
    g0 = ConvGRUCell.init_carry(B, H, W, C)
    pg = gru.init(jax.random.key(0), g0, seq[0])
    carry, ys = jax.lax.scan(lambda c, x: gru.apply(pg, c, x), g0, seq)
    assert ys.shape == (4, B, H, W, C)

    rec = RecurrentConvLayer(C, stride=2)
    r0 = ConvLSTMCell.init_carry(B, H // 2, W // 2, C)
    pr = rec.init(jax.random.key(0), r0, seq[0])
    (h, c), y = rec.apply(pr, r0, seq[0])
    assert y.shape == (B, H // 2, W // 2, C)


def test_attention_mlp_unet(rng):
    x = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32))
    sa = SelfAttention(16)
    p = sa.init(jax.random.key(0), x)
    assert sa.apply(p, x).shape == x.shape

    mlp = MLP(32, 4, 3)
    pm = mlp.init(jax.random.key(0), x)
    assert mlp.apply(pm, x).shape == (2, 10, 4)

    img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 5)).astype(np.float32))
    for skip, ups in (("sum", "transpose"), ("concat", "upsample")):
        net = UNet(base_channels=8, num_encoders=2, out_channels=1,
                   skip_type=skip, upsample_type=ups)
        pn = net.init(jax.random.key(0), img)
        out = net.apply(pn, img)
        assert out.shape == (1, 32, 32, 1)
        assert float(out.min()) >= 0 and float(out.max()) <= 1


def test_dcn_modules_zero_offset_equals_weight_conv(rng):
    """conv_offset_mask is zero-initialized, so at init DCN == dense conv
    with mask 0.5 (sigmoid(0)) — check shape + determinism."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    fea = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    dcn = DCN(6)
    p = dcn.init(jax.random.key(0), x)
    out = dcn.apply(p, x)
    assert out.shape == (1, 8, 8, 6)

    sep = DCNSep(6, deformable_groups=2)
    ps = sep.init(jax.random.key(1), x, fea)
    out2 = sep.apply(ps, x, fea)
    assert out2.shape == (1, 8, 8, 6)

    # zero offsets + mask 0.5 == 0.5 * dense conv with the same weight
    import torch
    import torch.nn.functional as F

    w = np.asarray(p["params"]["dcn"]["weight"])
    ref = F.conv2d(torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2)),
                   torch.from_numpy(w), padding=1).numpy() * 0.5
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_psroi_pooling_uniform_input(rng):
    """On a channelwise-constant input, pooling must return those constants
    (average of bilinear samples of a constant field)."""
    B, H, W = 1, 16, 16
    D, G, P = 4, 1, 3
    C = D * G * G
    const = np.arange(C, dtype=np.float32)
    x = jnp.asarray(np.broadcast_to(const, (B, H, W, C)).copy())
    rois = jnp.asarray(np.array([[0, 2, 2, 10, 10]], np.float32))
    out = dcn_v2_psroi_pooling(x, rois, None, spatial_scale=1.0,
                               pooled_size=P, output_dim=D, group_size=G)
    assert out.shape == (1, P, P, D)
    np.testing.assert_allclose(np.asarray(out), np.broadcast_to(const[:D], (1, P, P, D)),
                               atol=1e-5)


def test_psroi_pooling_trans_shifts(rng):
    """A positive x-offset shifts sampling right on a gradient image."""
    B, H, W, D = 1, 16, 16, 1
    gradient = np.tile(np.arange(W, dtype=np.float32), (H, 1))
    x = jnp.asarray(gradient[None, :, :, None])
    rois = jnp.asarray(np.array([[0, 2, 2, 9, 9]], np.float32))
    base = dcn_v2_psroi_pooling(x, rois, None, 1.0, 3, D)
    trans = jnp.asarray(np.zeros((1, 2, 3, 3), np.float32).copy())
    trans = trans.at[0, 0].set(0.5)  # x-offset
    shifted = dcn_v2_psroi_pooling(x, rois, trans, 1.0, 3, D,
                                   part_size=3, trans_std=0.1)
    assert float(shifted.mean()) > float(base.mean())
