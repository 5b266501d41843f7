"""Training CLI — the `train_ours.py` harness equivalent.

Usage (mirrors scripts/train_ours.sh, minus torch.distributed.launch —
multi-chip is one process per host via jax.distributed + the device mesh):

    python -m ebfi_tpu.train -c configs/train_evfi.yml -id my_run

Assembles: config -> loaders (train/valid) -> model (factory) -> optimizer
(Adam + StepLR w/ lr_min gate, grad accumulation) -> DP train/eval steps
over the mesh -> Trainer (iteration/epoch modes, early stop, checkpoints).
Two trainable targets, selected by config model.name:
  - EVFIAutoEx          : full model, Lap+census loss (train_ours.py)
  - ExposureDecision    : stage-1 pretrain, MSE vs GT duty on the real-data
                          loader (train_ours_exposuredecision.py)
"""
from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataloader import EBFIDataLoader
from ..models.factory import build_model
from ..parallel import make_mesh, dp_shardings, local_shard_info
from .config import ConfigParser
from .checkpoint import resume as resume_checkpoint
from .optim import build_optimizer
from .train_step import (
    build_adversarial,
    create_train_state,
    init_adv_state,
    make_eval_step,
    make_train_step,
)
from .trainer import Trainer
from .exposure_step import make_exposure_train_step, make_exposure_eval_step
from .exposure_trainer import ExposureTrainer


def init_seeds(seed: int = 0) -> None:
    """Determinism plumbing (train_ours.py:29-45): numpy/python seeds; JAX
    randomness is already explicit via keys."""
    import os
    import random

    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)


def _make_loader(cfg: dict, shard_index: int, num_shards: int, real_data: bool, seed: int):
    # config batch_size is GLOBAL; each process loads its 1/num_shards slice
    # and the global batch is assembled across processes (put_global_batch)
    batch_size = cfg.get("batch_size", 1)
    num_shards = max(num_shards, 1)
    if batch_size % num_shards != 0:
        raise ValueError(
            f"batch_size ({batch_size}) must be divisible by the number of "
            f"data-loading processes ({num_shards}) — the global batch is "
            "assembled as num_shards equal per-process slices"
        )
    per_process = batch_size // num_shards
    return EBFIDataLoader(
        cfg["path_to_datalist_txt"],
        cfg["dataset"],
        batch_size=per_process,
        shuffle=cfg.get("shuffle", False),
        drop_last=cfg.get("drop_last", False),
        shard_index=shard_index,
        num_shards=num_shards,
        real_data=real_data,
        seed=seed,
        num_threads=cfg.get("num_workers", 2),
        fast=cfg.get("fast", False),
    )


def make_writer(log_dir: str):
    """TensorBoard writer (logger/visualization.py:5-73) — tensorboardX,
    gracefully absent."""
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(log_dir)
    except ImportError:  # pragma: no cover
        logging.getLogger("trainer").warning("tensorboardX unavailable; TB logging off")
        return None


def main(argv=None):
    # multi-process rendezvous via the reference's env contract
    # (RANK/WORLD_SIZE/MASTER_ADDR/MASTER_PORT, train_ours.py:63-84)
    from ..parallel import maybe_init_distributed

    maybe_init_distributed()
    cp = ConfigParser.from_args(argv)
    from ..utils.profiling import enable_compile_cache

    enable_compile_cache()
    init_seeds(cp.config.get("seed", 0) + jax.process_index())
    logger = logging.getLogger("train")

    model_cfg = cp["model"]
    model = build_model(model_cfg)
    model_name = model_cfg["name"]
    exposure_only = model_name == "ExposureDecision"

    # Data-parallel width: all devices by default, clamped so the global
    # batch divides evenly (configurable via `parallel: {data_parallel: N}`).
    import math

    batch_size = int(cp["train_dataloader"].get("batch_size", 1))
    dp = (cp.config.get("parallel") or {}).get("data_parallel") or jax.device_count()
    dp = math.gcd(int(dp), batch_size) or 1
    if dp != jax.device_count():
        logger.warning(
            f"using {dp}/{jax.device_count()} devices for data parallelism "
            f"(batch_size={batch_size} must divide evenly)"
        )
    mesh = make_mesh(num_devices=dp)
    batch_sh, repl = dp_shardings(mesh)
    shard_index, num_shards = local_shard_info(mesh)

    seed = cp.config.get("seed", 0)
    train_loader = _make_loader(
        cp["train_dataloader"], shard_index, num_shards,
        real_data=exposure_only or cp["train_dataloader"].get("real_data", False),
        seed=seed,
    )
    valid_loader = _make_loader(
        cp["valid_dataloader"], shard_index, num_shards,
        real_data=exposure_only or cp["valid_dataloader"].get("real_data", False),
        seed=seed,
    ) if "valid_dataloader" in cp.config else None

    tcfg = cp["trainer"]
    accu = int(tcfg.get("accu_step", 1))
    lr_change = int(tcfg.get("iteration_based_train", {}).get("lr_change_rate", 1))
    # FrozenEX (model_singleframe.py:51-54, train_ours.py:181-185): the
    # pretrained ExposureDecision subtree receives zero updates in stage 2.
    margs = model_cfg.get("args") or {}
    frozen_ex = bool(margs.get("FrozenEX", margs.get("frozen_ex", False)))
    tx, _ = build_optimizer(
        cp["optimizer"], cp.get("lr_scheduler"),
        lr_min=float(tcfg.get("lr_min", 0.0)),
        lr_change_rate=lr_change, accumulate_steps=accu,
        freeze_subtree="exposure_decision" if (frozen_ex and not exposure_only) else None,
    )

    # init params at a small spatial size (params are resolution-independent)
    ds = cp["train_dataloader"]["dataset"]
    tb = int(ds["time_bins"])
    rng_key = jax.random.key(seed)
    if exposure_only:
        bl_in = model.bl_in
        params = model.init(
            rng_key, jnp.zeros((1, 64, 64, 2 * tb)), jnp.zeros((1, 64, 64, bl_in))
        )
    else:
        params = model.init(
            rng_key,
            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 2 * tb)),
            jnp.zeros((1, 1)), jnp.zeros((1, 1)),
        )
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    logger.info(f"{model_name}: {n_params:,} parameters")

    # optional stage-1 ExposureDecision pretrain weights
    pretrain_path = (model_cfg.get("args") or {}).get("PretrainedEXPath")
    load_pretrain = (model_cfg.get("args") or {}).get("LoadPretrainEX") or (
        model_cfg.get("args") or {}
    ).get("LoadPretrain")
    if not exposure_only and load_pretrain and pretrain_path:
        from .checkpoint import restore_checkpoint

        ex_params = restore_checkpoint(pretrain_path)["model_states"]
        params = _graft_exposure_params(params, ex_params)
        logger.info("Loaded pretrained ExposureDecision!")

    state = jax.device_put(create_train_state(model, params, tx), repl)

    if cp.resume:
        template = {"model_states": state.params, "opt_states": state.opt_state, "step": 0}
        restored = resume_checkpoint(
            cp.resume, template, model_name, cp["optimizer"]["name"],
            reset=getattr(cp, "reset", False),
        )
        state = state.replace(
            params=restored["model_states"],
            opt_state=restored["opt_states"] or state.opt_state,
            step=jnp.asarray(restored["step"] or 0, jnp.int32),
        )
        logger.info(f"Resumed from {cp.resume} at step {int(state.step)}")

    writer = make_writer(cp.log_dir) if (
        jax.process_index() == 0 and tcfg.get("tensorboard", False)
    ) else None

    if exposure_only:
        blurry_fashion = (model_cfg.get("args") or {}).get(
            "BlurryFashion", (model_cfg.get("args") or {}).get("blurry_fashion", "RGBLap")
        )
        trainer = ExposureTrainer(
            cp, model, state,
            make_exposure_train_step(model, blurry_fashion, mesh=mesh),
            make_exposure_eval_step(model, blurry_fashion, mesh=mesh),
            train_loader, valid_loader, writer=writer, batch_sharding=batch_sh,
        )
    else:
        detail = (model_cfg.get("args") or {}).get(
            "DetailEnabled", (model_cfg.get("args") or {}).get("detail_enabled", True)
        )
        compute_dtype = (
            jnp.bfloat16 if tcfg.get("precision", "f32") == "bf16" else None
        )
        loss_cfg = tcfg.get("loss")
        adv = build_adversarial(loss_cfg)
        if adv is not None:
            # discriminator shapes follow the training frames: the crop
            # when cropping is on, else the dataset's full resolution
            da = cp["train_dataloader"]["dataset"].get("data_augment", {})
            hw = None
            if da.get("enabled"):
                for k in ("random_crop", "center_crop"):
                    sub = da.get(k, {})
                    if sub.get("enabled"):
                        hw = tuple(sub["size"])
                        break
            if hw is None:
                hw = tuple(train_loader.datasets[0].spec.gt_resolution)
            sample = {
                "target": jnp.zeros((1, *hw, 3)),
                "frame": jnp.zeros((1, *hw, 3)),
            }
            state = state.replace(
                adv_state=jax.device_put(
                    init_adv_state(adv, jax.random.key(seed + 1), sample), repl
                )
            )
            logger.info(f"Adversarial loss enabled: {adv.gan_type}")
        trainer = Trainer(
            cp, model, state,
            make_train_step(model, mesh=mesh, detail_enabled=bool(detail),
                            compute_dtype=compute_dtype, loss_cfg=loss_cfg),
            make_eval_step(model, mesh=mesh),
            train_loader, valid_loader, writer=writer, batch_sharding=batch_sh,
            model_name=model_name,
            use_gt_ex=bool((model_cfg.get("args") or {}).get("UseGTEx", True)),
        )
    trainer.train()
    return trainer


def _graft_exposure_params(params, ex_params):
    """Insert pretrained ExposureDecision params under the full model's
    exposure_decision scope (model_singleframe.py:44-54 analogue)."""
    import flax

    p = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else dict(params)
    ex = ex_params["params"] if "params" in ex_params else ex_params
    p["params"] = dict(p["params"])
    p["params"]["exposure_decision"] = ex
    return p


if __name__ == "__main__":
    main()
