"""The jitted train/eval steps (data-parallel over the mesh).

Loss recipe mirrors train_ours.py:258-268: Laplacian + census on both heads
with phase-switched weights — (pre=1.0, final=0.1) for the first 10k
iterations, swapped afterwards; detail-free models use a single term.  The
phase switch is a `jnp.where` on the step counter, so one compiled program
covers both phases (no retrace at iteration 10k).

Gradient accumulation uses optax.MultiSteps (average over `accu_step`
micro-steps == the reference's loss/accu_step division + deferred
optimizer.step, train_ours.py:266-277).  Data parallelism: params
replicated, batch sharded on ``data``; XLA inserts the gradient all-reduce
over ICI (the correct version of the reference's disabled-by-`no_sync` DDP
all-reduce, train_ours.py:250).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import laplacian_loss, census_loss, charbonnier_loss


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def create_train_state(model, params, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def _pair_loss(pred, target):
    return laplacian_loss(pred, target) + census_loss(pred, target)


def make_loss_fn(
    detail_enabled: bool,
    phase_switch_iter: int = 10_000,
    compute_dtype=None,
):
    def loss_fn(params, apply_fn, batch, step):
        target = batch["target"]
        if compute_dtype is not None:
            # mixed precision: bf16 forward/backward, f32 master params &
            # loss reductions (grads of the cast are f32 automatically)
            from ..utils.precision import tree_to_dtype

            params = tree_to_dtype(params, compute_dtype)
            batch = tree_to_dtype(batch, compute_dtype)
        sharp, final = apply_fn(
            params, batch["frame"], batch["event"], batch["t"], batch.get("gt_ex")
        )
        sharp = sharp.astype(jnp.float32)
        final = final.astype(jnp.float32)
        if detail_enabled:
            early = step < phase_switch_iter
            w_final = jnp.where(early, 0.1, 1.0)
            w_pre = jnp.where(early, 1.0, 0.1)
            loss = w_final * _pair_loss(final, target) + w_pre * _pair_loss(sharp, target)
        else:
            loss = _pair_loss(final, target)
        return loss, {"sharp": sharp, "final": final}

    return loss_fn


def make_train_step(
    model,
    mesh=None,
    detail_enabled: bool = True,
    phase_switch_iter: int = 10_000,
    donate: bool = True,
    compute_dtype=None,
    spatial: bool = False,
):
    """Returns jitted (state, batch) -> (state, metrics).

    batch: frame (B,H,W,3), event (B,H,W,2TB), t (B,1), gt_ex (B,1) or
    absent, target (B,H,W,3).  compute_dtype=jnp.bfloat16 enables
    mixed-precision training (f32 master params).

    spatial: DP x SP — NHWC batch entries are additionally sharded along H
    over the mesh's ``model`` axis; XLA's SPMD partitioner inserts the conv
    halo exchanges in forward AND backward, and the gradient all-reduce
    spans both mesh axes (params stay fully replicated).  Loss/grads are
    identical to the DP-only step (tested on the virtual CPU mesh); use it
    to fit larger per-chip resolutions or cut per-step latency.
    """
    loss_fn = make_loss_fn(detail_enabled, phase_switch_iter, compute_dtype)

    if mesh is not None and spatial:
        from jax.sharding import NamedSharding, PartitionSpec as P

        img_sh = NamedSharding(mesh, P("data", "model"))

        def constrain(batch):
            return {
                k: jax.lax.with_sharding_constraint(v, img_sh) if v.ndim >= 4 else v
                for k, v in batch.items()
            }
    else:
        constrain = lambda batch: batch

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jax.Array]]:
        batch = constrain(batch)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.apply_fn, batch, state.step
        )
        new_state = state.apply_gradients(grads)
        return new_state, {"train_loss": loss}

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        return jax.jit(
            step_fn,
            in_shardings=(repl, batch_sh),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model, mesh=None):
    """Validation: Charbonnier on the final head (train_ours.py:588)."""

    def eval_fn(params, batch):
        sharp, final = model.apply(
            params, batch["frame"], batch["event"], batch["t"], batch.get("gt_ex")
        )
        return {"valid_loss": charbonnier_loss(final, batch["target"])}

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        return jax.jit(eval_fn, in_shardings=(repl, batch_sh), out_shardings=repl)
    return jax.jit(eval_fn)
