"""Adversarial loss with a self-contained discriminator optimizer.

The reference's `Adversarial(nn.Module)` owns its discriminator, optimizer
(Adamax 1e-3 / Adam for WGAN-GP) and scheduler, and *steps the
discriminator inside the loss forward* before returning the generator loss
(loss/adversarial.py:68-168).  In JAX that becomes an explicit
discriminator TrainState threaded through a jitted joint step:

    adv = AdversarialLoss(patch_size, gan_type)
    adv_state = adv.init(key, fake, real, frames)
    adv_state, g_loss, d_loss = adv.step(adv_state, fake, real, frames)

GAN types: GAN, WGAN, WGAN_GP, T_WGAN_GP, FI_GAN, FI_Cond_GAN, STGAN —
same discriminator-update + generator-loss recipes as adversarial.py:94-167
(incl. the WGAN weight clamp and the WGAN-GP gradient penalty).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .discriminator import build_discriminator


class AdvState(NamedTuple):
    params: Any
    opt_state: Any
    key: jax.Array


def _bce_logits(logits, target):
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


class AdversarialLoss:
    def __init__(self, patch_size: int, gan_type: str = "GAN", gan_k: int = 1):
        self.gan_type = gan_type
        self.gan_k = gan_k
        self.disc = build_discriminator(gan_type, patch_size)
        if gan_type in ("WGAN_GP", "T_WGAN_GP"):
            self.tx = optax.adam(1e-5, b1=0.0, b2=0.9, eps=1e-8)
        else:
            self.tx = optax.adamax(1e-3, b1=0.9, b2=0.999, eps=1e-8)
        self._step = jax.jit(self._step_impl)

    # -------------------------------------------------------------- #

    def _d_apply(self, params, fake, real, frames):
        """Returns (d_fake, d_real) or FI_GAN's (d_01, d_12)."""
        if self.gan_type in ("T_WGAN_GP", "FI_Cond_GAN", "STGAN"):
            return (
                self.disc.apply(params, frames[:, 0], fake, frames[:, 1]),
                self.disc.apply(params, frames[:, 0], real, frames[:, 1]),
            )
        if self.gan_type == "FI_GAN":
            return (
                self.disc.apply(params, frames[:, 0], fake),
                self.disc.apply(params, fake, frames[:, 1]),
            )
        return self.disc.apply(params, fake), self.disc.apply(params, real)

    def init(self, key, fake, real, frames=None) -> AdvState:
        if self.gan_type in ("T_WGAN_GP", "FI_Cond_GAN", "STGAN"):
            params = self.disc.init(key, frames[:, 0], fake, frames[:, 1])
        elif self.gan_type == "FI_GAN":
            params = self.disc.init(key, frames[:, 0], fake)
        else:
            params = self.disc.init(key, fake)
        return AdvState(params, self.tx.init(params), jax.random.key(0))

    # -------------------------------------------------------------- #

    def _d_loss(self, params, fake_d, real, frames, key):
        gt = self.gan_type
        a, b = self._d_apply(params, fake_d, real, frames)
        if gt in ("GAN", "FI_Cond_GAN", "STGAN"):
            return _bce_logits(a, jnp.zeros_like(a)) + _bce_logits(b, jnp.ones_like(b))
        if gt == "FI_GAN":
            return _bce_logits(a, jnp.zeros_like(a)) + _bce_logits(b, jnp.ones_like(b))
        # WGAN family: a = d_fake, b = d_real
        loss = jnp.mean(a - b)
        if "GP" in gt:
            eps = jax.random.uniform(key, fake_d.shape, fake_d.dtype)
            hat = fake_d * (1 - eps) + real * eps

            def d_out(h):
                if gt == "T_WGAN_GP":
                    return jnp.sum(self.disc.apply(params, frames[:, 0], h, frames[:, 1]))
                return jnp.sum(self.disc.apply(params, h))

            g = jax.grad(d_out)(hat)
            gnorm = jnp.sqrt(jnp.sum(g.reshape(g.shape[0], -1) ** 2, axis=1) + 1e-12)
            loss = loss + 10.0 * jnp.mean((gnorm - 1.0) ** 2)
        return loss

    def _g_loss(self, params, fake, frames):
        gt = self.gan_type
        if gt == "GAN":
            d = self.disc.apply(params, fake)
            return _bce_logits(d, jnp.ones_like(d))
        if gt == "FI_GAN":
            d01 = jax.nn.sigmoid(self.disc.apply(params, frames[:, 0], fake))
            d12 = jax.nn.sigmoid(self.disc.apply(params, fake, frames[:, 1]))
            return jnp.mean(d01 * jnp.log(d01 + 1e-12) + d12 * jnp.log(d12 + 1e-12))
        if gt in ("FI_Cond_GAN", "STGAN"):
            d = self.disc.apply(params, frames[:, 0], fake, frames[:, 1])
            return _bce_logits(d, jnp.ones_like(d))
        # WGAN family
        if gt == "T_WGAN_GP":
            d = self.disc.apply(params, frames[:, 0], fake, frames[:, 1])
        else:
            d = self.disc.apply(params, fake)
        return -jnp.mean(d)

    def _step_impl(self, state: AdvState, fake, real, frames):
        fake_d = jax.lax.stop_gradient(fake)
        params, opt_state, key = state
        d_loss_total = 0.0
        for _ in range(self.gan_k):
            key, sub = jax.random.split(key)
            d_loss, grads = jax.value_and_grad(self._d_loss)(
                params, fake_d, real, frames, sub
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if self.gan_type == "WGAN":
                params = jax.tree.map(lambda p: jnp.clip(p, -1.0, 1.0), params)
            d_loss_total = d_loss_total + d_loss
        g_loss = self._g_loss(jax.lax.stop_gradient(params), fake, frames)
        return AdvState(params, opt_state, key), g_loss, d_loss_total / self.gan_k

    def step(self, state: AdvState, fake, real, frames=None):
        """Update the discriminator, return (new_state, g_loss, d_loss).
        `g_loss` is differentiable w.r.t. `fake` (the generator output)."""
        if frames is None:
            frames = jnp.zeros((fake.shape[0], 2) + fake.shape[1:], fake.dtype)
        return self._step(state, fake, real, frames)
