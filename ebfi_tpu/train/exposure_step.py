"""Stage-1 ExposureDecision pretrain steps.

Mirrors train_ours_exposuredecision.py:233-253: compute the blurriness map
from the real blurry frame (fashion DarkCh/Lap/RGB/RGBDark/RGBLap, same
menu as the full model), regress the exposure duty from (events, map), MSE
vs the GT duty derived from the H5 exposure attrs.  Data-parallel like the
main train step.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..losses import mse_loss
from ..ops import dark_channel, laplacian_response
from .train_step import TrainState


def blurry_level_map(frame: jax.Array, fashion: str) -> jax.Array:
    lap = lambda f: laplacian_response(f).astype(f.dtype)
    if fashion == "DarkCh":
        return dark_channel(frame)
    if fashion == "Lap":
        return lap(frame)
    if fashion == "RGB":
        return frame
    if fashion == "RGBDark":
        return jnp.concatenate([frame, dark_channel(frame)], axis=-1)
    if fashion == "RGBLap":
        return jnp.concatenate([frame, lap(frame)], axis=-1)
    raise ValueError(f"Wrong blurry conversion fashion {fashion!r}")


def make_exposure_train_step(model, blurry_fashion: str, mesh=None):
    def loss_fn(params, batch):
        bl = blurry_level_map(batch["frame"], blurry_fashion)
        ex = model.apply(params, batch["event"], bl)  # (B, 1)
        return mse_loss(ex, batch["gt_ex"])

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jax.Array]]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        return state.apply_gradients(grads), {"train_loss": loss}

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        return jax.jit(step_fn, in_shardings=(repl, batch_sh),
                       out_shardings=(repl, repl), donate_argnums=(0,))
    return jax.jit(step_fn, donate_argnums=(0,))


def make_exposure_eval_step(model, blurry_fashion: str, mesh=None):
    def eval_fn(params, batch):
        bl = blurry_level_map(batch["frame"], blurry_fashion)
        ex = model.apply(params, batch["event"], bl)
        return {"valid_loss": mse_loss(ex, batch["gt_ex"])}

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        return jax.jit(eval_fn, in_shardings=(repl, batch_sh), out_shardings=repl)
    return jax.jit(eval_fn)
