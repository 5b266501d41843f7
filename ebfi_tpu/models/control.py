"""ResidualControl: the time-exposure control stack.

Reference: models/Ours/model_singleframe.py:79-136 — `step` (default 12)
sequential stages, each modulating the event features by broadcast scalars
of exposure `Ex` and timestamp `T` through two residual conv paths fused by
a conv:

    exx = lrelu(conv3b(lrelu(conv3a(x))))
    tx  = lrelu(conv4b(lrelu(conv4a(x))))
    x'  = lrelu(conv5(concat(ex_scale*exx + x, t_scale*tx + x)))

TPU-first: the module owns stacked per-stage parameters and offers two
numerically-matched execution paths — an XLA path (`lax.scan` over the
stacked weights; the parity oracle) and the row-packed `fast` variant
(`_rows2_path` below).  A fully-fused Pallas stage kernel was prototyped
in round 1/2 and deleted in round 3: exact parity, but ~35% slower than
XLA's convs at 360x640x64 (K=64 tap dots underutilize the MXU) and ~2.5x
slower than the rows2 block-conv formulation — see IMPLEMENTATION_NOTES.md
"Retired prototypes".

The Ex/T modulation scales are an affine map of a scalar (the reference's
1x1 conv over a 1x1 "image"), computed for all stages at once.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from .layers import activation_fn, kaiming_in_init


def _conv3x3(x, w, b):
    """NHWC 3x3 conv, padding 1.  w: (3, 3, Cin, Cout)."""
    y = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + b


class ResidualControl(nn.Module):
    basech: int = 16
    step: int = 4
    norm: Optional[str] = None
    activation: str = "LeakyReLU"
    unroll: bool = True          # XLA path: unroll the stage scan
    # Execution variant (ops/s2d.py): run the whole stack in row-packed
    # space — every 3x3 conv becomes a VALID (2,3) block conv at 2C=128
    # channels (full MXU lanes, 4/3 FLOP tax), stage parities alternate so
    # no relayout is ever needed between convs.  Same math up to float
    # reassociation; params unchanged.
    fast: bool = False

    @nn.compact
    def __call__(
        self,
        data: jax.Array,
        ex: jax.Array,
        t: Optional[jax.Array] = None,
        mode: str = "full",
        hoisted: Optional[dict] = None,
    ) -> jax.Array:
        """data: (B, H, W, C); ex, t: (B, 1) -> (B, H, W, C).

        mode='full' is the reference computation.  The 'hoist'/'tail' pair
        splits stage 0's T-independent work out of a multi-timestamp sweep:
        everything in stage 0 except ``conv5v(t_scale*tx + x)`` depends only
        on (data, ex), which the inference engine shares across all
        timestamps of one blurry frame — 'hoist' computes those partials
        once at B=1 and 'tail' (t at batch N, broadcasting against the B=1
        hoisted tensors) runs only the per-timestamp remainder.  Same math
        as 'full' up to float reassociation; params unchanged.
        """
        if self.norm is not None:
            raise NotImplementedError("ResidualControl supports norm=None")
        C, S = self.basech, self.step
        init = kaiming_in_init(0.1)
        zeros = nn.initializers.zeros
        p = {
            "d1": self.param("d1", init, (S, 1, C)),
            "d1_b": self.param("d1_b", zeros, (S, C)),
            "d2": self.param("d2", init, (S, 1, C)),
            "d2_b": self.param("d2_b", zeros, (S, C)),
            "conv3a": self.param("conv3a", init, (S, 3, 3, C, C)),
            "conv3a_b": self.param("conv3a_b", zeros, (S, C)),
            "conv3b": self.param("conv3b", init, (S, 3, 3, C, C)),
            "conv3b_b": self.param("conv3b_b", zeros, (S, C)),
            "conv4a": self.param("conv4a", init, (S, 3, 3, C, C)),
            "conv4a_b": self.param("conv4a_b", zeros, (S, C)),
            "conv4b": self.param("conv4b", init, (S, 3, 3, C, C)),
            "conv4b_b": self.param("conv4b_b", zeros, (S, C)),
            "conv5": self.param("conv5", init, (S, 3, 3, 2 * C, C)),
            "conv5_b": self.param("conv5_b", zeros, (S, C)),
        }
        act = activation_fn(self.activation)
        dtype = (
            data.dtype if data is not None else jax.tree.leaves(hoisted)[0].dtype
        )
        p = jax.tree.map(lambda v: v.astype(dtype), p)

        # per-stage modulation scales from the scalars: (S, B, C)
        if mode != "tail":
            ex_scales = act(
                jnp.einsum("bi,sic->sbc", ex.astype(dtype), p["d1"])
                + p["d1_b"][:, None, :]
            )
        if mode != "hoist":
            t_scales = act(
                jnp.einsum("bi,sic->sbc", t.astype(dtype), p["d2"])
                + p["d2_b"][:, None, :]
            )

        if mode == "hoist":
            if self.fast and data.shape[1] % 2 == 0:
                return self._rows2_hoist(data, p, ex_scales, act)
            return self._xla_hoist(data, p, ex_scales, act)
        if mode == "tail":
            if "xs" in hoisted:  # rows2 hoist marker (static dict key)
                return self._rows2_tail(hoisted, p, t_scales, act)
            return self._xla_tail(hoisted, p, t_scales, act)
        if self.fast and data.shape[1] % 2 == 0:
            return self._rows2_path(data, p, ex_scales, t_scales, act)
        return self._xla_path(data, p, ex_scales, t_scales, act)

    # ------------------------------------------------------------------ #
    # hoist/tail split (multi-timestamp inference)

    def _xla_hoist(self, data, p, ex_scales, act):
        """Stage 0's T-independent partials at B=1 (broadcast in the tail):
        tx0 (the T-path pre-modulation features) and hu0 = conv5u(u) + bias
        (the exposure half of stage 0's fuse conv, u = ex_scale*exx + x)."""
        C = self.basech
        x = data
        a3 = act(_conv3x3(x, p["conv3a"][0], p["conv3a_b"][0]))
        exx = act(_conv3x3(a3, p["conv3b"][0], p["conv3b_b"][0]))
        a4 = act(_conv3x3(x, p["conv4a"][0], p["conv4a_b"][0]))
        tx = act(_conv3x3(a4, p["conv4b"][0], p["conv4b_b"][0]))
        u = ex_scales[0][:, None, None, :] * exx + x
        hu = _conv3x3(u, p["conv5"][0, :, :, :C, :], p["conv5_b"][0])
        return {"x": x, "tx0": tx, "hu0": hu, "ex_scales": ex_scales}

    def _xla_tail(self, hoisted, p, t_scales, act):
        """Per-timestamp remainder: stage 0 needs only conv5v; stages 1+
        run in full at batch N."""
        C, S = self.basech, self.step
        x, ex_scales = hoisted["x"], hoisted["ex_scales"]
        v = t_scales[0][:, None, None, :] * hoisted["tx0"] + x
        out = act(hoisted["hu0"] + _conv3x3(v, p["conv5"][0, :, :, C:, :], 0.0))
        for s in range(1, S):
            wa = jnp.concatenate([p["conv3a"][s], p["conv4a"][s]], axis=-1)
            ba = jnp.concatenate([p["conv3a_b"][s], p["conv4a_b"][s]], axis=-1)
            a = _conv3x3(out, wa, ba)
            exx = act(_conv3x3(act(a[..., :C]), p["conv3b"][s], p["conv3b_b"][s]))
            tx = act(_conv3x3(act(a[..., C:]), p["conv4b"][s], p["conv4b_b"][s]))
            u = ex_scales[s][:, None, None, :] * exx + out
            v = t_scales[s][:, None, None, :] * tx + out
            out = act(
                _conv3x3(u, p["conv5"][s, :, :, :C, :], p["conv5_b"][s])
                + _conv3x3(v, p["conv5"][s, :, :, C:, :], 0.0)
            )
        return out

    def _rows2_hoist(self, data, p, ex_scales, act):
        """Stage 0 parity-A partials in row-packed space at B=1."""
        from ..ops.s2d import (
            conv23_valid,
            conv3x3_weight_to_rows2,
            rows2_pack_shifted,
        )

        C = self.basech
        t2 = lambda b: jnp.tile(b, 2)
        pad1 = lambda x: jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        xs = rows2_pack_shifted(data)
        hp = xs.shape[1]
        mask = jnp.ones((1, hp, 1, 2 * C), data.dtype)
        mask = mask.at[:, 0, :, :C].set(0.0).at[:, hp - 1, :, C:].set(0.0)

        w3a = conv3x3_weight_to_rows2(p["conv3a"][0])
        w4a = conv3x3_weight_to_rows2(p["conv4a"][0])
        w3b = conv3x3_weight_to_rows2(p["conv3b"][0])
        w4b = conv3x3_weight_to_rows2(p["conv4b"][0])
        w5u = conv3x3_weight_to_rows2(p["conv5"][0, :, :, :C, :])
        a3 = act(conv23_valid(xs, w3a) + t2(p["conv3a_b"][0]))
        a4 = act(conv23_valid(xs, w4a) + t2(p["conv4a_b"][0]))
        exx = act(conv23_valid(pad1(a3), w3b) + t2(p["conv3b_b"][0])) * mask
        tx = act(conv23_valid(pad1(a4), w4b) + t2(p["conv4b_b"][0])) * mask
        u = t2(ex_scales[0][:, None, None, :]) * exx + xs
        hu = conv23_valid(u, w5u)  # standard packing, bias added in the tail
        return {"xs": xs, "tx0": tx, "hu0": hu, "ex_scales": ex_scales}

    def _rows2_tail(self, hoisted, p, t_scales, act):
        from ..ops.s2d import (
            conv23_valid,
            conv3x3_weight_to_rows2,
            rows2_unpack_shifted,
            rows2_unpack_standard,
        )

        C, S = self.basech, self.step
        t2 = lambda b: jnp.tile(b, 2)
        xs, ex_scales = hoisted["xs"], hoisted["ex_scales"]
        w5v = conv3x3_weight_to_rows2(p["conv5"][0, :, :, C:, :])
        v = t2(t_scales[0][:, None, None, :]) * hoisted["tx0"] + xs
        y = act(hoisted["hu0"] + conv23_valid(v, w5v) + t2(p["conv5_b"][0]))
        out = self._rows2_stages(y, p, ex_scales, t_scales, act, start=1)
        if S % 2 == 0:
            return rows2_unpack_shifted(out)
        return rows2_unpack_standard(out)

    # ------------------------------------------------------------------ #

    def _xla_path(self, data, p, ex_scales, t_scales, act):
        C = self.basech

        def stage(x, s):
            # conv3a|conv4a merged on the output axis (one 64->128 conv);
            # conv5(concat(u, v)) == conv5u(u) + conv5v(v) — identical math,
            # fewer materialized intermediates
            a = _conv3x3(x, s["wa"], s["ba"])
            exx = act(_conv3x3(act(a[..., :C]), s["conv3b"], s["conv3b_b"]))
            tx = act(_conv3x3(act(a[..., C:]), s["conv4b"], s["conv4b_b"]))
            u = s["ex"][:, None, None, :] * exx + x
            v = s["t"][:, None, None, :] * tx + x
            out = act(
                _conv3x3(u, s["w5u"], s["conv5_b"]) + _conv3x3(v, s["w5v"], 0.0)
            )
            return out.astype(x.dtype), None

        stacked = {
            k: p[k] for k in ("conv3b", "conv3b_b", "conv4b", "conv4b_b", "conv5_b")
        }
        stacked["wa"] = jnp.concatenate([p["conv3a"], p["conv4a"]], axis=-1)
        stacked["ba"] = jnp.concatenate([p["conv3a_b"], p["conv4a_b"]], axis=-1)
        stacked["w5u"] = p["conv5"][:, :, :, :C, :]
        stacked["w5v"] = p["conv5"][:, :, :, C:, :]
        stacked["ex"] = ex_scales
        stacked["t"] = t_scales
        out, _ = lax.scan(
            stage, data, stacked, unroll=self.step if self.unroll else 1
        )
        return out

    def _rows2_path(self, data, p, ex_scales, t_scales, act):
        """Row-packed execution (ops/s2d.py): stage parities alternate
        between a shifted-packing input (A) and a standard-packing input
        (B); the (2,3) block-conv weight mapping is parity-independent, so
        the only per-parity differences are one zero-block pad and a
        boundary mask on odd-alignment intermediates.  The residual adds
        align for free via the pixel-pair identity (alignment +1 block m
        holds the same pixel rows as alignment -1 block m+1)."""
        from ..ops.s2d import (
            conv23_valid,
            conv3x3_weight_to_rows2,
            rows2_pack_shifted,
            rows2_unpack_shifted,
            rows2_unpack_standard,
        )

        C, S = self.basech, self.step
        xs = rows2_pack_shifted(data)                # (B, h+1, W, 2C)
        xs = self._rows2_stages(xs, p, ex_scales, t_scales, act, start=0)
        if S % 2 == 0:
            return rows2_unpack_shifted(xs)
        return rows2_unpack_standard(xs)

    def _rows2_stages(self, xs, p, ex_scales, t_scales, act, start: int):
        """Stages ``start..S-1`` on row-packed tensors; the input packing is
        shifted (h+1 blocks) when start is even, standard (h blocks) when
        odd.  Returns the final packed tensor (caller unpacks by S's
        parity)."""
        from ..ops.s2d import conv23_valid, conv3x3_weight_to_rows2

        C, S = self.basech, self.step
        w3a = conv3x3_weight_to_rows2(p["conv3a"])   # (S, 2, 3, 2C, 2C)
        w4a = conv3x3_weight_to_rows2(p["conv4a"])
        w3b = conv3x3_weight_to_rows2(p["conv3b"])
        w4b = conv3x3_weight_to_rows2(p["conv4b"])
        w5u = conv3x3_weight_to_rows2(p["conv5"][:, :, :, :C, :])
        w5v = conv3x3_weight_to_rows2(p["conv5"][:, :, :, C:, :])
        t2 = lambda b: jnp.tile(b, 2)
        pad1 = lambda x: jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))

        hp = xs.shape[1] + (start % 2)  # h+1 regardless of entry parity
        # odd-alignment arrays carry pixel rows -1 and H in their first
        # block's row-0 half and last block's row-1 half — those are the
        # conv zero-pad positions and must be masked to zero
        mask = jnp.ones((1, hp, 1, 2 * C), xs.dtype)
        mask = mask.at[:, 0, :, :C].set(0.0).at[:, hp - 1, :, C:].set(0.0)

        for s in range(start, S):
            exs = t2(ex_scales[s][:, None, None, :])
            tss = t2(t_scales[s][:, None, None, :])
            if s % 2 == 0:  # parity A: input shifted (h+1 blocks)
                a3 = act(conv23_valid(xs, w3a[s]) + t2(p["conv3a_b"][s]))
                a4 = act(conv23_valid(xs, w4a[s]) + t2(p["conv4a_b"][s]))
                exx = act(conv23_valid(pad1(a3), w3b[s]) + t2(p["conv3b_b"][s])) * mask
                tx = act(conv23_valid(pad1(a4), w4b[s]) + t2(p["conv4b_b"][s])) * mask
                u = exs * exx + xs
                v = tss * tx + xs
                y = act(
                    conv23_valid(u, w5u[s]) + conv23_valid(v, w5v[s])
                    + t2(p["conv5_b"][s])
                )
                xs = y  # standard packing (h blocks) — parity B input
            else:  # parity B: input standard (h blocks)
                yp = pad1(xs)
                a3 = act(conv23_valid(yp, w3a[s]) + t2(p["conv3a_b"][s])) * mask
                a4 = act(conv23_valid(yp, w4a[s]) + t2(p["conv4a_b"][s])) * mask
                exx = act(conv23_valid(a3, w3b[s]) + t2(p["conv3b_b"][s]))
                tx = act(conv23_valid(a4, w4b[s]) + t2(p["conv4b_b"][s]))
                u = exs * exx + xs
                v = tss * tx + xs
                y = act(
                    conv23_valid(pad1(u), w5u[s]) + conv23_valid(pad1(v), w5v[s])
                    + t2(p["conv5_b"][s])
                ) * mask
                xs = y  # shifted packing (h+1 blocks) — parity A input

        return xs

