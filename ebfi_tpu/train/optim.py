"""Optimizer + LR-schedule construction.

Mirrors the reference's optimizer config (Adam 1e-4, betas (0.9, 0.999),
config/train_ours.yml:62-68) and StepLR(step_size=2e5, gamma=0.5)
(train_ours.yml:76-80) with the EXACT iteration semantics of its loop:
`lr_scheduler.step()` runs at the END of every iteration whose index is a
nonzero multiple of `lr_change_rate` (train_ours.py:335-338, increment at
:348), so the optimizer update at iteration i sees max(i-1, 0) //
lr_change_rate completed scheduler steps — the k-th decay first applies at
iteration k*step_size + 1, not k*step_size.  The `lr_min` gate likewise
mirrors the reference: it steps WHILE the current lr >= lr_min, so the lr
freezes one decay BELOW lr_min (the crossing step happens).  Verified
against torch Adam+StepLR in lockstep by
tests/test_reference_parity.py::test_reference_multi_step_training_parity.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import optax


def _decays_until_below(base_lr: float, gamma: float, lr_min: float) -> int:
    """Smallest k with base*gamma^k < lr_min (the reference's frozen decay
    count); a huge sentinel when the gate never engages."""
    if lr_min <= 0 or not (0 < gamma < 1):
        return 10**9
    k = 0
    lr = base_lr
    while lr >= lr_min and k < 200:
        lr *= gamma
        k += 1
    return k


def build_lr_schedule(
    name: str,
    base_lr: float,
    args: dict,
    lr_min: float = 0.0,
    lr_change_rate: int = 1,
) -> Callable[[int], float]:
    """Returns schedule(step) -> lr, where `step` is the 0-based optimizer
    update index (== the reference's train_iter_idx at update time)."""

    def sched_count(step):
        import jax.numpy as jnp

        # scheduler.step() calls completed before update `step`
        return jnp.maximum(step - 1, 0) // lr_change_rate

    if name == "StepLR":
        size = int(args["step_size"])
        gamma = float(args["gamma"])
        k_max = _decays_until_below(base_lr, gamma, lr_min)

        def schedule(step):
            import jax.numpy as jnp

            k = jnp.minimum(sched_count(step) // size, k_max)
            return base_lr * (gamma ** k)

        return schedule
    if name == "ExponentialLR":
        gamma = float(args["gamma"])
        n_max = _decays_until_below(base_lr, gamma, lr_min)

        def schedule(step):
            import jax.numpy as jnp

            n = jnp.minimum(sched_count(step), n_max)
            return base_lr * (gamma ** n)

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
