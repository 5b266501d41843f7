"""Modification: event-to-frame feature transfer via filter-adaptive conv.

Reference: models/Ours/model_singleframe.py:139-165 — align event features
to frame width with a 1x1 conv, predict a per-pixel K^2*C kernel bank from
the concatenated features, apply it with the FAC op (K=5), then gated
residual fuse: ``Frame * E1 + Conv(E1)``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import kernel_conv2d_auto
from .layers import ConvLayer


class Modification(nn.Module):
    """fused: execution variant — predict and apply the kernel bank in one
    Pallas kernel (ops/pallas/mod_fac.py) so the K^2*C bank never reaches
    HBM.  Same math up to f32-vs-bf16 bank precision; params unchanged."""

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
            and jax.default_backend() in ("tpu", "axon")
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
