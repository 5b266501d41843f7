"""FAC kernel_conv2d: forward + gradient parity vs a torch unfold oracle.

The oracle reproduces the CUDA op (KernelConv2D_kernel.cu:25-53) via
`torch.nn.functional.unfold`, whose (C, K, K) channel-major patch layout is
identical to the CUDA kernel indexing ``c*K*K + ky*K + kx``.
"""
import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from ebfi_tpu.ops import kernel_conv2d, kernel_conv2d_raw


def torch_fac(x_pad: torch.Tensor, kernel: torch.Tensor, K: int) -> torch.Tensor:
    """x_pad: (B,C,H+K-1,W+K-1); kernel: (B,C*K*K,H,W) -> (B,C,H,W)."""
    B, CKK, H, W = kernel.shape
    C = CKK // (K * K)
    patches = F.unfold(x_pad, K).view(B, C * K * K, H, W)
    return (patches * kernel).view(B, C, K * K, H, W).sum(2)


def test_forward_matches_oracle(rng):
    B, C, H, W, K = 2, 5, 9, 11, 5
    x_pad = rng.standard_normal((B, C, H + K - 1, W + K - 1)).astype(np.float32)
    kern = rng.standard_normal((B, C * K * K, H, W)).astype(np.float32)

    ref = torch_fac(torch.from_numpy(x_pad), torch.from_numpy(kern), K).numpy()

    # NHWC for our op.
    out = kernel_conv2d_raw(
        jnp.asarray(x_pad.transpose(0, 2, 3, 1)),
        jnp.asarray(kern.transpose(0, 2, 3, 1)),
        K,
    )
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-5)


def test_module_padding_matches_torch_replicationpad(rng):
    """Module-level semantics: ReplicationPad2d((K-1)//2) then raw op
    (KernelConv2D.py:82-87)."""
    B, C, H, W, K = 1, 3, 8, 8, 3
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    kern = rng.standard_normal((B, C * K * K, H, W)).astype(np.float32)

    p = (K - 1) // 2
    x_pad_t = F.pad(torch.from_numpy(x), (p, p, p, p), mode="replicate")
    ref = torch_fac(x_pad_t, torch.from_numpy(kern), K).numpy()

    out = kernel_conv2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(kern.transpose(0, 2, 3, 1)), K
    )
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-5)


def test_gradients_match_torch(rng):
    """Autodiff through the shift formulation == CUDA backward kernels
    (KernelConv2D_kernel.cu:91-150), checked via torch autograd."""
    B, C, H, W, K = 2, 3, 6, 7, 3
    x_pad = rng.standard_normal((B, C, H + K - 1, W + K - 1)).astype(np.float32)
    kern = rng.standard_normal((B, C * K * K, H, W)).astype(np.float32)
    cotan = rng.standard_normal((B, C, H, W)).astype(np.float32)

    xt = torch.from_numpy(x_pad).requires_grad_(True)
    kt = torch.from_numpy(kern).requires_grad_(True)
    torch_fac(xt, kt, K).backward(torch.from_numpy(cotan))

    def f(xj, kj):
        out = kernel_conv2d_raw(xj, kj, K)
        return jnp.sum(out * jnp.asarray(cotan.transpose(0, 2, 3, 1)))

    gx, gk = jax.grad(f, argnums=(0, 1))(
        jnp.asarray(x_pad.transpose(0, 2, 3, 1)), jnp.asarray(kern.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(gx).transpose(0, 3, 1, 2), xt.grad.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gk).transpose(0, 3, 1, 2), kt.grad.numpy(), rtol=1e-4, atol=1e-5
    )
