"""Checkpoint save/restore (Orbax) with the reference's resume semantics.

Checkpoint contents mirror `_save_checkpoint` (train_ours.py:621-671):
model name + params, optimizer name + state, trainer progress
(training_mode, iteration/epoch, monitor_best), and the resolved config —
so inference can rebuild the architecture from the checkpoint alone
(infer_ours.py:163-165).  `Resumer`-style name guards refuse to restore a
component whose configured class name differs (myutils/utils.py:185-209);
`reset=True` keeps weights but resets trainer/optimizer state
(train_ours.py:683-712).

Filenames: ``checkpoint-iteration{N}`` / ``model_best_until_iteration{N}``
(or `-epoch{N}`), rank-0-only in multi-process runs (Orbax handles
multi-host arrays natively).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp
import yaml


def _ckptr():
    return ocp.StandardCheckpointer()


def save_checkpoint(
    save_dir: str,
    tag: str,
    params: Any,
    opt_state: Any,
    step: int,
    config: dict,
    trainer_state: Dict[str, Any],
    model_name: str = "EVFIAutoEx",
    optimizer_name: str = "Adam",
    scheduler_name: Optional[str] = "StepLR",
) -> str:
    import numpy as np

    path = os.path.abspath(os.path.join(save_dir, tag))
    # Materialize to host numpy: checkpoints stay portable across device
    # topologies (save on an 8-chip mesh, restore on 1 chip or CPU).
    to_np = lambda t: jax.tree.map(lambda x: np.asarray(x), t)
    with ocp.StandardCheckpointer() as ck:
        ck.save(
            path,
            {
                "model_states": to_np(params),
                "opt_states": to_np(opt_state) if opt_state is not None else {},
                "step": int(step),
            },
            force=True,
        )
    if jax.process_index() == 0:  # sidecar written by the primary host only
        meta = {
            "model": {"name": model_name},
            "optimizer": {"name": optimizer_name},
            "lr_scheduler": {"name": scheduler_name},
            "trainer": trainer_state,
            "config": config,
        }
        with open(os.path.join(path, "meta.yml"), "w") as f:
            yaml.safe_dump(meta, f, sort_keys=False)
    return path


def load_meta(path: str) -> dict:
    with open(os.path.join(path, "meta.yml")) as f:
        return yaml.safe_load(f)


def restore_checkpoint(path: str, template: Any = None) -> Dict[str, Any]:
    """Returns {'model_states', 'opt_states', 'step', 'meta'}.  `template`
    is a matching pytree (e.g. {'model_states': params, ...}) for
    shape/dtype/sharding restoration."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ck:
        if template is not None:
            restored = ck.restore(path, template)
        else:
            restored = ck.restore(path)
    restored = dict(restored)
    restored["meta"] = load_meta(path)
    return restored


def resume(
    path: str,
    template: Any,
    model_name: str,
    optimizer_name: str,
    reset: bool = False,
) -> Dict[str, Any]:
    """Name-guarded restore (Resumer semantics, myutils/utils.py:185-209)."""
    restored = restore_checkpoint(path, template)
    meta = restored["meta"]
    if meta["model"]["name"] != model_name:
        raise ValueError(
            f"Checkpoint model {meta['model']['name']!r} != configured {model_name!r}"
        )
    if reset:
        restored["opt_states"] = None
        restored["step"] = 0
        meta["trainer"] = {}
    elif meta["optimizer"]["name"] != optimizer_name:
        raise ValueError(
            f"Checkpoint optimizer {meta['optimizer']['name']!r} != configured "
            f"{optimizer_name!r}"
        )
    return restored
