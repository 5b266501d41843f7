"""EVFIAutoEx: the flagship blind-exposure blurry-frame interpolation model.

Reference: models/Ours/model_singleframe.py:226-348.  Given a blurry frame,
the per-polarity event stack, a target timestamp T and (optionally) the GT
exposure duty, produce the sharp latent frame at T.

TPU-first design notes
----------------------
- NHWC everywhere; the event stack arrives channel-flattened
  (B, H, W, 2*TB) with bin-major/polarity-minor order matching the
  reference's ``Event.view(B, -1, H, W)`` (model_singleframe.py:297).
- Pad-to-/8 is resolved at trace time from static shapes (same math as
  `CropSize`, model_util.py:158-189) — no dynamic shapes under jit.
- The blurriness maps run on-device (ops.dark_channel /
  ops.laplacian_response) instead of the reference's GPU->CPU cv2
  round-trip (myutils/utils.py:15-49).
- `features()` / `from_timestamp()` split the T-independent trunk from the
  T-dependent tail so multi-timestamp interpolation reuses the trunk —
  the reference recomputes everything per timestamp
  (train_ours.py:245-256, infer_ours.py:105-118).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    dark_channel,
    laplacian_response,
    pixel_shuffle,
    pad_amounts_to_multiple,
)
from .layers import ConvLayer
from .exposure import ExposureDecision
from .control import ResidualControl
from .modification import Modification
from .unet3d import UNet3d18


class EVFIAutoEx(nn.Module):
    """Constructor args mirror the reference (model_singleframe.py:227-236)."""

    frame_basech: int = 64
    event_basech: int = 64
    inter_ch: int = 64
    tb: int = 16
    norm: Optional[str] = None
    activation: str = "LeakyReLU"
    # exposure decision
    blurry_fashion: str = "DarkCh"   # DarkCh | Lap | RGB | RGBDark | RGBLap
    bl_in: int = 1
    use_events: bool = True
    use_gt_ex: bool = False
    fix_ex: Optional[float] = None
    frozen_ex: bool = False
    # time-exposure control
    step: int = 32
    dual_path: bool = True
    # modification
    residual: bool = True
    # detail restoration
    detail_enabled: bool = True
    channels: Sequence[int] = (32, 64, 96, 128)
    # execution variants (not capability switches): run the reconstruction
    # head / the detail branch's full-res tail in space-to-depth form — no
    # full-res intermediates, block convs at 4x channel width (ops/s2d.py).
    # Same math up to float reassociation; fast_recon requires
    # LeakyReLU/no-norm (the shipped config).
    fast_recon: bool = False
    fast_detail: bool = False
    fast_mod: bool = False
    fast_control: bool = False
    # from_timestamp_shared: run the ResidualControl tail in sub-batches of
    # this size (0 = whole batch).  The RC block convs measure ~25% faster
    # at batch 8 than 16 on v5e (XLA picks better tilings), while the
    # Modification kernel prefers the full batch (ff-half amortization) —
    # so the hoisted tail sub-chunks RC only.  Pure execution knob.
    rc_tail_subchunk: int = 0

    def setup(self):
        self.frame_feat_extract = ConvLayer(
            self.frame_basech, 3, 2, 1, self.activation, self.norm, name="frame_feat"
        )
        self.event_feat_extract = ConvLayer(
            self.event_basech, 3, 2, 1, self.activation, self.norm, name="event_feat"
        )
        if not self.use_gt_ex and not self.fix_ex and self.use_events:
            self.exposure_decision = ExposureDecision(
                event_in=2 * self.tb,
                bl_in=self.bl_in,
                inter_ch=self.inter_ch,
                groups=4,
                norm=self.norm,
                activation=self.activation,
                name="exposure_decision",
            )
        if self.dual_path:
            self.residual_control = ResidualControl(
                basech=self.event_basech,
                step=self.step,
                norm=self.norm,
                activation=self.activation,
                fast=self.fast_control,
                name="residual_control",
            )
        if self.residual:
            self.modification = Modification(
                frame_basech=self.frame_basech,
                kernel_size=5,
                norm=self.norm,
                activation=self.activation,
                fused=self.fast_mod,
                name="modification",
            )
        self.recon_up = ConvLayer(
            self.frame_basech * 4, 3, 1, 1, None, self.norm, name="recon_up"
        )
        self.recon_mid = ConvLayer(
            self.frame_basech, 3, 1, 1, self.activation, self.norm, name="recon_mid"
        )
        self.recon_out = ConvLayer(3, 3, 1, 1, "Sigmoid", self.norm, name="recon_out")
        if self.detail_enabled:
            self.detail = UNet3d18(
                channels=self.channels, fast_tail=self.fast_detail, name="detail"
            )

    # ------------------------------------------------------------------ #
    # T-independent trunk

    def blurry_level(self, frame: jax.Array) -> jax.Array:
        """On-device blurriness map per `BlurryFashion`
        (model_singleframe.py:310-325)."""
        # laplacian_response computes in exact integer arithmetic and returns
        # f32; cast back so mixed-precision (bf16) graphs stay homogeneous.
        lap = lambda f: laplacian_response(f).astype(f.dtype)
        if self.blurry_fashion == "DarkCh":
            return dark_channel(frame)
        if self.blurry_fashion == "Lap":
            return lap(frame)
        if self.blurry_fashion == "RGB":
            return frame
        if self.blurry_fashion == "RGBDark":
            return jnp.concatenate([frame, dark_channel(frame)], axis=-1)
        if self.blurry_fashion == "RGBLap":
            return jnp.concatenate([frame, lap(frame)], axis=-1)
        raise ValueError(f"Wrong blurry conversion fashion {self.blurry_fashion!r}")

    def features(
        self, frame: jax.Array, event: jax.Array, gt_ex: Optional[jax.Array] = None
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """Everything that does not depend on T.

        frame: (B, H, W, 3) padded to /8; event: (B, H, W, 2*TB) same.
        Returns (frame_feat, event_feat, ex, frame_padded).
        """
        frame_feat = self.frame_feat_extract(frame)
        event_feat = self.event_feat_extract(event)

        if self.use_gt_ex:
            if self.fix_ex:
                raise ValueError("set UseGTEx, but FixEx is given!")
            if gt_ex is None:
                raise ValueError("set UseGTEx, but NO GTEx provided!")
            ex = gt_ex
        elif self.fix_ex:
            if not (0.0 <= self.fix_ex <= 1.0):
                raise ValueError("Wrong FixEx!")
            ex = jnp.full((frame.shape[0], 1), self.fix_ex, frame.dtype)
        else:
            ex = self.exposure_decision(event, self.blurry_level(frame))
        return frame_feat, event_feat, ex.astype(frame.dtype), frame

    # ------------------------------------------------------------------ #
    # T-dependent tail

    def from_timestamp(
        self,
        frame_feat: jax.Array,
        event_feat: jax.Array,
        ex: jax.Array,
        frame: jax.Array,
        t: jax.Array,
    ) -> Tuple[jax.Array, jax.Array]:
        """(sharp, final) at timestamp t (B, 1), on the padded grid."""
        processed_ev = (
            self.residual_control(event_feat, ex, t) if self.dual_path else event_feat
        )
        processed_fr = (
            self.modification(frame_feat, processed_ev) if self.residual else frame_feat
        )
        use_s2d = (
            self.fast_recon
            and not self.is_initializing()
            and self.activation == "LeakyReLU"
            and self.norm is None
        )
        if use_s2d:
            from ..ops.s2d import recon_s2d

            cv = lambda m: m.variables["params"]["Conv_0"]
            sharp = recon_s2d(
                processed_fr,
                cv(self.recon_up)["kernel"], cv(self.recon_up)["bias"],
                cv(self.recon_mid)["kernel"], cv(self.recon_mid)["bias"],
                cv(self.recon_out)["kernel"], cv(self.recon_out)["bias"],
            )
        else:
            up = pixel_shuffle(self.recon_up(processed_fr), 2)
            up = nn.leaky_relu(up, 0.01)
            sharp = self.recon_out(self.recon_mid(up))

        if self.detail_enabled:
            final = sharp + self.detail(frame, sharp)
        else:
            final = sharp
        return sharp, final

    def hoist(self, trunk) -> dict:
        """Precompute the tail work that is T-independent *per stage* (the
        inference engine shares one trunk across all N timestamps of a
        blurry frame): ResidualControl stage-0 partials and the
        frame-feature half of Modification's kernel-bank conv.  Requires
        dual_path and residual (the flagship config)."""
        frame_feat, event_feat, ex, frame = trunk
        h = {
            "rc": self.residual_control(event_feat, ex, None, mode="hoist"),
            "mod": self.modification(frame_feat, None, mode="hoist"),
        }
        if self.detail_enabled and self.fast_detail:
            h["stem"] = self.detail(frame, frame, mode="stem_hoist")
        return h

    def from_timestamp_shared(
        self, trunk, hoisted: dict, t: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """(sharp, final) for N timestamps sharing one trunk: trunk tensors
        stay at B=1 (broadcast against the per-timestamp batch N), the
        hoisted partials replace their recomputation.  Same math as N
        `from_timestamp` calls up to float reassociation (and, on TPU with
        fast_mod, the shared Pallas kernel's ff-bank band scratch in the
        compute dtype — see ops/pallas/mod_fac.py)."""
        frame_feat, event_feat, ex, frame = trunk
        N = t.shape[0]
        S = self.rc_tail_subchunk
        if S and N > S and N % S == 0:
            processed_ev = jnp.concatenate(
                [
                    self.residual_control(
                        None, None, t[i * S : (i + 1) * S],
                        mode="tail", hoisted=hoisted["rc"],
                    )
                    for i in range(N // S)
                ],
                axis=0,
            )
        else:
            processed_ev = self.residual_control(
                None, None, t, mode="tail", hoisted=hoisted["rc"]
            )
        processed_fr = self.modification(
            frame_feat, processed_ev, mode="tail", hoisted=hoisted["mod"]
        )
        use_s2d = (
            self.fast_recon
            and not self.is_initializing()
            and self.activation == "LeakyReLU"
            and self.norm is None
        )
        if use_s2d:
            from ..ops.s2d import depth_to_space, recon_s2d

            cv = lambda m: m.variables["params"]["Conv_0"]
            sharp_pk = recon_s2d(
                processed_fr,
                cv(self.recon_up)["kernel"], cv(self.recon_up)["bias"],
                cv(self.recon_mid)["kernel"], cv(self.recon_mid)["bias"],
                cv(self.recon_out)["kernel"], cv(self.recon_out)["bias"],
                return_packed=True,
            )
            if self.detail_enabled and "stem" in hoisted:
                # packed pipeline: recon's 2x2-packed RGB feeds the detail
                # stem directly and the residual add + single unpack happen
                # in packed space — no depth/space round trips of sharp
                det_pk = self.detail(
                    None, sharp_pk, stem_pre=hoisted["stem"], packed_io=True
                )
                return depth_to_space(sharp_pk), depth_to_space(sharp_pk + det_pk)
            sharp = depth_to_space(sharp_pk)
        else:
            up = pixel_shuffle(self.recon_up(processed_fr), 2)
            up = nn.leaky_relu(up, 0.01)
            sharp = self.recon_out(self.recon_mid(up))

        if self.detail_enabled:
            if "stem" in hoisted:
                final = sharp + self.detail(None, sharp, stem_pre=hoisted["stem"])
            else:
                frame_n = jnp.broadcast_to(frame, (N, *frame.shape[1:]))
                final = sharp + self.detail(frame_n, sharp)
        else:
            final = sharp
        return sharp, final

    # ------------------------------------------------------------------ #

    def __call__(
        self,
        frame: jax.Array,
        event: jax.Array,
        t: jax.Array,
        gt_ex: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Full forward (model_singleframe.py:277-348).

        frame: (B, H, W, 3); event: (B, H, W, 2*TB); t, gt_ex: (B, 1).
        Returns (sharp, final), each (B, H, W, 3).
        """
        B, H, W, _ = frame.shape
        pt, pb, pl, pr = pad_amounts_to_multiple(H, W, 8, 8)
        need_crop = (pt or pb or pl or pr)
        if need_crop:
            frame = jnp.pad(frame, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
            event = jnp.pad(event, ((0, 0), (pt, pb), (pl, pr), (0, 0)))

        trunk = self.features(frame, event, gt_ex)
        sharp, final = self.from_timestamp(*trunk, t)

        if need_crop:
            sharp = sharp[:, pt : pt + H, pl : pl + W, :]
            final = final[:, pt : pt + H, pl : pl + W, :]
        return sharp, final
