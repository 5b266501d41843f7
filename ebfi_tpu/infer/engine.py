"""Jitted inference engine with multi-timestamp trunk reuse.

The reference re-runs the ENTIRE network once per requested timestamp
(infer_ours.py:105-118; train loop likewise train_ours.py:245-256), although
only the control/modification/reconstruction tail depends on T.  Here the
T-independent trunk (feature extraction + exposure decision + blurriness
map) is computed once per blurry frame and a `lax.scan` sweeps the tail
over all requested timestamps — identical outputs, ~NumI x less trunk
compute, one compiled program.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..models import EVFIAutoEx
from ..ops import pad_amounts_to_multiple


class InferenceEngine:
    """Wraps (model, params) into jitted single- and multi-timestamp calls.

    precision: 'f32' for strict parity; 'bf16' for production throughput
    (params stay fp32 on the host; compute casts to bfloat16 — MXU-native).
    """

    def __init__(
        self,
        model: EVFIAutoEx,
        params,
        precision: str = "f32",
        multi_chunk: int = 16,
        fast_math: Optional[bool] = None,
    ):
        """fast_math: use throughput execution variants (s2d reconstruction
        head — same math up to float reassociation).  Defaults to True for
        bf16 (production) and False for f32 (strict reference parity)."""
        if fast_math is None:
            fast_math = precision == "bf16"
        if fast_math and getattr(model, "fast_recon", None) is False:
            model = model.clone(
                fast_recon=True, fast_detail=True, fast_mod=True, fast_control=True
            )
        self.model = model
        self.params = params
        self.precision = precision
        self.multi_chunk = multi_chunk
        # hoisted tail: share the T-independent per-stage work across all
        # timestamps of one frame (reassociation-level math change, so it
        # rides the fast-math flag; see EVFIAutoEx.hoist)
        self._hoist = fast_math
        if precision == "bf16":
            from ..utils.precision import to_bf16

            self._compute_params = to_bf16(params)
            self._cast_in = to_bf16
        elif precision == "f32":
            self._compute_params = params
            self._cast_in = lambda x: x
        else:
            raise ValueError(f"unknown precision {precision!r}")
        self._single = jax.jit(self._single_fn)
        self._multi_cache = {}

    def _single_fn(self, frame, event, t, gt_ex):
        s, f = self.model.apply(
            self._compute_params, *self._cast_in((frame, event, t, gt_ex))
        )
        return s.astype(jnp.float32), f.astype(jnp.float32)

    def forward(self, frame, event, t, gt_ex=None):
        """(sharp, final) for one timestamp — reference-equivalent call."""
        return self._single(frame, event, t, gt_ex)

    def _build_multi(self, mode: str, outputs: str = "both"):
        model, params = self.model, self._compute_params
        cast_in = self._cast_in
        want_sharp = outputs == "both"

        def run(frame, event, ts, gt_ex):
            """frame (B,H,W,3), event (B,H,W,2TB), ts (B,N), gt_ex (B,1)."""
            B, H, W, _ = frame.shape
            N = ts.shape[1]
            frame, event, ts, gt_ex = cast_in((frame, event, ts, gt_ex))
            pt, pb, pl, pr = pad_amounts_to_multiple(H, W, 8, 8)
            if pt or pb or pl or pr:
                frame = jnp.pad(frame, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
                event = jnp.pad(event, ((0, 0), (pt, pb), (pl, pr), (0, 0)))

            trunk = model.apply(params, frame, event, gt_ex, method=EVFIAutoEx.features)

            use_hoist = (
                mode == "batched"
                and self._hoist
                and model.dual_path
                and model.residual
            )
            if use_hoist and B == 1:
                # B=1 production path: the trunk is never repeated; the
                # T-independent stage partials are computed once and the
                # per-timestamp tail runs at batch `chunk`
                hoisted = model.apply(params, trunk, method=EVFIAutoEx.hoist)
                chunk = min(N, self.multi_chunk)
                n_chunks = -(-N // chunk)
                ts_p = jnp.pad(ts, ((0, 0), (0, n_chunks * chunk - N)), mode="edge")
                ts_chunks = ts_p.reshape(n_chunks, chunk)

                def tail_h(carry, t_chunk):
                    sharp, final = model.apply(
                        params, trunk, hoisted, t_chunk[:, None],
                        method=EVFIAutoEx.from_timestamp_shared,
                    )
                    outs = (final.astype(jnp.float32),)
                    if want_sharp:
                        outs = (sharp.astype(jnp.float32),) + outs
                    return carry, outs

                _, outs = lax.scan(tail_h, 0, ts_chunks)
                # (n_chunks, chunk, Hp, Wp, 3) -> (N, 1, Hp, Wp, 3)
                outs = [
                    o.reshape(n_chunks * chunk, *o.shape[2:])[:N, None] for o in outs
                ]
            elif use_hoist:
                # F>1 blurry frames in ONE program: the features trunk runs
                # batched over the F frames (better MXU utilization than F
                # separate calls), then an outer lax.scan sweeps frames —
                # each step hoists its frame's stage partials at B=1 (the
                # hoist dict carries a stage-stacked leaf, so it cannot ride
                # the scan's leading axis) and runs the SAME chunk-batched
                # tail as the B=1 path, reusing the shared Pallas mod_fac
                # kernel and the packed detail pipeline unchanged.  Per-call
                # dispatch and host-sync floors amortize over all F*N
                # output frames.
                chunk = min(N, self.multi_chunk)
                n_chunks = -(-N // chunk)
                ts_p = jnp.pad(ts, ((0, 0), (0, n_chunks * chunk - N)), mode="edge")
                ts_chunks = ts_p.reshape(B, n_chunks, chunk)

                def tail_frame(carry, xs_f):
                    tr_f, ts_f = xs_f
                    tr_f = jax.tree.map(lambda x: x[None], tr_f)
                    h_f = model.apply(params, tr_f, method=EVFIAutoEx.hoist)

                    def tail_h(c2, t_chunk):
                        sharp, final = model.apply(
                            params, tr_f, h_f, t_chunk[:, None],
                            method=EVFIAutoEx.from_timestamp_shared,
                        )
                        outs = (final.astype(jnp.float32),)
                        if want_sharp:
                            outs = (sharp.astype(jnp.float32),) + outs
                        return c2, outs

                    _, outs_f = lax.scan(tail_h, 0, ts_f)
                    return carry, outs_f

                _, outs = lax.scan(tail_frame, 0, (trunk, ts_chunks))
                # (B, n_chunks, chunk, Hp, Wp, 3) -> (N, B, Hp, Wp, 3)
                outs = [
                    o.reshape(B, n_chunks * chunk, *o.shape[3:])[:, :N]
                    .transpose(1, 0, 2, 3, 4)
                    for o in outs
                ]
            elif mode == "scan":
                # memory-lean: one tail per step (good for large N / big B)
                def tail(carry, t_col):
                    sharp, final = model.apply(
                        params, *carry, t_col[:, None], method=EVFIAutoEx.from_timestamp
                    )
                    outs = (final.astype(jnp.float32),)
                    if want_sharp:
                        outs = (sharp.astype(jnp.float32),) + outs
                    return carry, outs

                _, outs = lax.scan(tail, trunk, ts.T)  # each (N, B, ...)
                outs = list(outs)
            else:
                # throughput mode: fold timestamps into the batch so the tail
                # convs run at batch B*chunk (far better MXU utilization than
                # B=1 sequential steps).  Chunked to bound the FAC kernel-bank
                # footprint (C*K^2 channels x B*chunk at half-res).
                chunk = min(N, self.multi_chunk)
                n_chunks = -(-N // chunk)
                pad_n = n_chunks * chunk - N
                ts_p = jnp.pad(ts, ((0, 0), (0, pad_n)), mode="edge")
                frame_feat, event_feat, ex, frame_p = trunk
                rep = lambda x: jnp.repeat(x, chunk, axis=0)
                trunk_rep = (rep(frame_feat), rep(event_feat), rep(ex), rep(frame_p))
                # (n_chunks, B, chunk)
                ts_chunks = ts_p.reshape(B, n_chunks, chunk).transpose(1, 0, 2)

                def tail(carry, t_chunk):
                    sharp, final = model.apply(
                        params, *carry, t_chunk.reshape(B * chunk, 1),
                        method=EVFIAutoEx.from_timestamp,
                    )
                    Hp, Wp = sharp.shape[1:3]
                    tr = lambda x: x.reshape(B, chunk, Hp, Wp, 3).transpose(
                        1, 0, 2, 3, 4
                    ).astype(jnp.float32)
                    outs = (tr(final),)
                    if want_sharp:
                        outs = (tr(sharp),) + outs
                    return carry, outs

                _, outs = lax.scan(tail, trunk_rep, ts_chunks)
                # (n_chunks, chunk, B, ...) -> (N, B, ...)
                outs = [
                    o.reshape(n_chunks * chunk, B, *o.shape[3:])[:N] for o in outs
                ]

            # (N, B, Hp, Wp, 3) -> crop
            outs = [o[:, :, pt : pt + H, pl : pl + W, :] for o in outs]
            if want_sharp:
                return outs[0], outs[1]
            return None, outs[0]

        return jax.jit(run)

    def interpolate(
        self,
        frame,
        event,
        ts,
        gt_ex=None,
        mode: str = "batched",
        outputs: str = "both",
    ):
        """All timestamps at once with trunk reuse.

        ts: (B, N) normalized timestamps.  Returns (sharp, final) each
        (N, B, H, W, 3).  For non-fast-math engines the results are
        numerically identical to N calls of `forward`; with fast_math=True
        the hoisted tail is reassociation-equivalent, and on TPU the shared
        Pallas kernel accumulates the ff bank half via a band scratch in
        the input dtype (bf16 for the production engine).
        mode: 'batched' folds timestamps into the batch (throughput);
        'scan' sweeps them sequentially (memory-lean for large N).
        outputs: 'both' or 'final' — 'final' skips materializing the
        coarse sharp output (returned as None; the reference's inference
        loop likewise discards it, infer_ours.py:113-118).
        """
        key = (mode, outputs)
        if key not in self._multi_cache:
            self._multi_cache[key] = self._build_multi(mode, outputs)
        if gt_ex is None:
            gt_ex = jnp.zeros((frame.shape[0], 1), frame.dtype)
        return self._multi_cache[key](frame, event, ts, gt_ex)
