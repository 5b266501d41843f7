"""Optimizer + LR-schedule construction.

Mirrors the reference's optimizer config (Adam 1e-4, betas (0.9, 0.999),
config/train_ours.yml:62-68) and StepLR(step_size=2e5, gamma=0.5)
(train_ours.yml:76-80) including the `lr_min` gate: the scheduler stops
decaying once the lr would drop below `lr_min` (train_ours.py:335-338).
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import optax


def build_lr_schedule(
    name: str,
    base_lr: float,
    args: dict,
    lr_min: float = 0.0,
    lr_change_rate: int = 1,
) -> Callable[[int], float]:
    """Returns schedule(step) -> lr.

    `lr_change_rate` mirrors iteration_based_train.lr_change_rate: the
    scheduler's internal step advances once per `lr_change_rate` train
    iterations (train_ours.py:335-338).
    """
    if name == "StepLR":
        size = int(args["step_size"]) * lr_change_rate
        gamma = float(args["gamma"])
        # number of decays until lr < lr_min (the reference stops stepping
        # once get_last_lr() < lr_min, freezing at the last value >= lr_min)
        if lr_min > 0 and gamma < 1:
            k_max = max(0, math.floor(math.log(lr_min / base_lr, gamma)))
        else:
            k_max = 10**9

        def schedule(step):
            import jax.numpy as jnp

            k = jnp.minimum(step // size, k_max)
            return base_lr * (gamma ** k)

        return schedule
    if name == "ExponentialLR":
        gamma = float(args["gamma"])

        def schedule(step):
            import jax.numpy as jnp

            lr = base_lr * (gamma ** (step // lr_change_rate))
            return jnp.maximum(lr, lr_min) if lr_min > 0 else lr

        return schedule
    raise ValueError(f"Unknown lr_scheduler {name}")


def subtree_freeze_labels(frozen_key: str) -> Callable:
    """params -> {"trainable"|"frozen"} label tree for optax.multi_transform.

    Every leaf under any dict key equal to `frozen_key` (at any depth) is
    labeled "frozen".  Used for the reference's FrozenEX: the pretrained
    ExposureDecision subnet is frozen during stage-2 training
    (model_singleframe.py:51-54, wired via train_ours.py:181-185).
    """

    def walk(node, frozen):
        if isinstance(node, dict):
            return {k: walk(v, frozen or k == frozen_key) for k, v in node.items()}
        return "frozen" if frozen else "trainable"

    def label_fn(params):
        if hasattr(params, "unfreeze"):  # flax FrozenDict
            params = params.unfreeze()
        return walk(dict(params), False)

    return label_fn


def build_optimizer(
    optimizer_cfg: dict,
    scheduler_cfg: Optional[dict] = None,
    lr_min: float = 0.0,
    lr_change_rate: int = 1,
    accumulate_steps: int = 1,
    freeze_subtree: Optional[str] = None,
) -> Tuple[optax.GradientTransformation, Callable[[int], float]]:
    """(tx, schedule).  Supported names: Adam, AdamW, SGD, Adamax, RMSprop.

    `freeze_subtree`: name of a param-dict key whose whole subtree receives
    zero updates (FrozenEX — see subtree_freeze_labels)."""
    name = optimizer_cfg["name"]
    args = dict(optimizer_cfg.get("args", {}))
    base_lr = float(args.pop("lr", 1e-4))

    if scheduler_cfg is not None:
        schedule = build_lr_schedule(
            scheduler_cfg["name"], base_lr, scheduler_cfg.get("args", {}),
            lr_min=lr_min, lr_change_rate=lr_change_rate,
        )
    else:
        schedule = lambda step: base_lr

    betas = tuple(args.pop("betas", (0.9, 0.999)))
    wd = float(args.pop("weight_decay", 0.0))
    args.pop("amsgrad", None)

    if name == "Adam":
        if wd:
            tx = optax.adamw(schedule, b1=betas[0], b2=betas[1], weight_decay=wd)
        else:
            tx = optax.adam(schedule, b1=betas[0], b2=betas[1])
    elif name == "AdamW":
        tx = optax.adamw(schedule, b1=betas[0], b2=betas[1], weight_decay=wd)
    elif name == "Adamax":
        tx = optax.adamax(schedule, b1=betas[0], b2=betas[1])
    elif name == "SGD":
        tx = optax.sgd(schedule, momentum=args.pop("momentum", 0.0))
    elif name == "RMSprop":
        tx = optax.rmsprop(schedule)
    else:
        raise ValueError(f"Unknown optimizer {name}")

    if freeze_subtree:
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()},
            subtree_freeze_labels(freeze_subtree),
        )
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx, schedule
