"""Modification: event-to-frame feature transfer via filter-adaptive conv.

Reference: models/Ours/model_singleframe.py:139-165 — align event features
to frame width with a 1x1 conv, predict a per-pixel K^2*C kernel bank from
the concatenated features, apply it with the FAC op (K=5), then gated
residual fuse: ``Frame * E1 + Conv(E1)``.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import kernel_conv2d_auto
from .layers import ConvLayer


class Modification(nn.Module):
    """fused: execution variant — predict and apply the kernel bank in one
    Pallas kernel (ops/pallas/mod_fac.py) so the K^2*C bank never reaches
    HBM.  Same math up to f32-vs-bf16 bank precision; params unchanged.

    Training with fused=True uses a recompute VJP: the backward
    materializes the bank in HBM (a fused backward does not fit the 16 MB
    VMEM at C=64/K=5 — see IMPLEMENTATION_NOTES.md "mod_fac backward").
    Measured envelope on v5e-16GB: full 720p fine-tuning at B=1 per chip
    (465 ms/step) and B=8 @256x256 (115 ms/step) both fit
    (tools/measure_train_res.py)."""

    frame_basech: int = 64
    kernel_size: int = 5
    norm: Optional[str] = None
    activation: str = "LeakyReLU"
    fused: bool = False

    @nn.compact
    def __call__(
        self,
        frame_feat: jax.Array,
        event_feat: jax.Array,
        mode: str = "full",
        hoisted: Optional[dict] = None,
    ) -> jax.Array:
        """frame_feat: (B,H,W,C1); event_feat: (B,H,W,C2) -> (B,H,W,C1).

        mode='hoist'/'tail' split the frame-feature half of the bank conv
        out of a multi-timestamp sweep (frame_feat at B=1 is shared by all
        N timestamps; event_feat carries batch N in 'tail').  Same math up
        to float reassociation of the split conv sum."""
        C1, K = self.frame_basech, self.kernel_size
        # The predicted bank uses the framework's tap-major channel order
        # (the torch converter permutes the reference's c-major weights).
        kc = ConvLayer(C1 * K * K, 3, 1, 1, self.activation, self.norm, name="kernel_conv")
        use_fused = (
            self.fused
            and not self.is_initializing()
            and self.activation == "LeakyReLU"
            and self.norm is None
            and frame_feat.shape[-1] == C1
            # the Pallas kernel's bias scratch holds K*K tap rows in a
            # 32-row buffer (mod_fac.py); larger banks fall back to XLA
            and K * K <= 32
            and (
                jax.default_backend() in ("tpu", "axon")
                # test hook: exercise the fused paths via Pallas interpret
                # mode on CPU
                or os.environ.get("EBFI_FORCE_FUSED_MOD") == "1"
            )
        )
        if mode == "hoist":
            # the fused kernel reuses the ff half in-kernel (per row band);
            # the XLA fallback precomputes the ff bank half at B=1
            if use_fused:
                return {}
            from jax import lax

            cv = kc.variables["params"]["Conv_0"]
            w = cv["kernel"].astype(frame_feat.dtype)
            bank_ff = lax.conv_general_dilated(
                frame_feat, w[:, :, C1:, :], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + cv["bias"].astype(frame_feat.dtype)
            return {"bank_ff": bank_ff}

        ev = ConvLayer(C1, 1, 1, 0, self.activation, self.norm, name="conv1")(event_feat)
        if mode == "tail":
            cv = kc.variables["params"]["Conv_0"]
            if use_fused and ev.shape[1] % 2 == 0:
                return self._tail_fused_rows2(ev, frame_feat, cv, K)
            if use_fused:
                from ..ops.pallas.mod_fac import modification_fac_fused_shared

                e1 = modification_fac_fused_shared(
                    ev, frame_feat, cv["kernel"], cv["bias"], K
                )
            else:
                from jax import lax

                from .layers import activation_fn

                w = cv["kernel"].astype(ev.dtype)
                bank = lax.conv_general_dilated(
                    ev, w[:, :, :C1, :], (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + hoisted["bank_ff"]
                kern = activation_fn(self.activation)(bank)
                e1 = kernel_conv2d_auto(ev, kern, K)
        elif use_fused:
            from ..ops.pallas.mod_fac import modification_fac_fused

            cv = kc.variables["params"]["Conv_0"]
            e1 = modification_fac_fused(ev, frame_feat, cv["kernel"], cv["bias"], K)
        else:
            kern = kc(jnp.concatenate([ev, frame_feat], axis=-1))
            e1 = kernel_conv2d_auto(ev, kern, K)
        e1 = ConvLayer(C1, 3, 1, 1, self.activation, self.norm, name="conv3")(e1)
        return frame_feat * e1 + ConvLayer(C1, 3, 1, 1, self.activation, self.norm, name="conv2")(e1)

    def _tail_fused_rows2(self, ev, frame_feat, cv, K):
        """Fused-kernel tail in row-packed space: the Pallas kernel emits
        the rows2-standard packing for free (band rows -> channel halves),
        conv3/conv2 run as (2,3) block convs at 2C=128 lanes (the plain
        64-channel 3x3s are MXU lane-starved), and the gated residual is
        computed packed.  Same math up to float reassociation."""
        from ..ops.pallas.mod_fac import modification_fac_fused_shared_packed
        from ..ops.s2d import (
            conv23_valid,
            conv3x3_weight_to_rows2,
            rows2_unpack_standard,
        )
        from .layers import activation_fn

        C1 = self.frame_basech
        act = activation_fn(self.activation)
        dt = ev.dtype
        e1p = modification_fac_fused_shared_packed(
            ev, frame_feat, cv["kernel"], cv["bias"], K
        )  # (N, h, W, 2C) rows2-standard
        h = e1p.shape[1]
        c3 = ConvLayer(C1, 3, 1, 1, self.activation, self.norm, name="conv3")
        c2 = ConvLayer(C1, 3, 1, 1, self.activation, self.norm, name="conv2")
        v3 = c3.variables["params"]["Conv_0"]
        v2 = c2.variables["params"]["Conv_0"]
        w3 = conv3x3_weight_to_rows2(v3["kernel"].astype(dt))
        w2 = conv3x3_weight_to_rows2(v2["kernel"].astype(dt))
        t2 = lambda b: jnp.tile(b.astype(dt), 2)
        pad1 = lambda x: jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        mask = jnp.ones((1, h + 1, 1, 2 * C1), dt)
        mask = mask.at[:, 0, :, :C1].set(0.0).at[:, h, :, C1:].set(0.0)

        # conv3: standard -> shifted packing (boundary halves masked to the
        # SAME-conv zero-pad rows)
        e1b_sh = act(conv23_valid(pad1(e1p), w3) + t2(v3["bias"])) * mask
        # conv2: shifted -> standard
        c2o = act(conv23_valid(e1b_sh, w2) + t2(v2["bias"]))
        # shifted -> standard repack of e1b: std block j = [sh[j].row1 | sh[j+1].row0]
        e1b_std = jnp.concatenate(
            [e1b_sh[:, :-1, :, C1:], e1b_sh[:, 1:, :, :C1]], axis=-1
        )
        B0, H0, W0, _ = frame_feat.shape
        ffp = (
            frame_feat.reshape(B0, h, 2, W0, C1)
            .transpose(0, 1, 3, 2, 4)
            .reshape(B0, h, W0, 2 * C1)
        )
        return rows2_unpack_standard(ffp * e1b_std + c2o)
