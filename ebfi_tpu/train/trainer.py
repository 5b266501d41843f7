"""Trainer: iteration/epoch training loops, validation, early-stop,
checkpoint cadence, logging.

Mirrors the reference Trainer's control surface (train_ours.py:87-435):
iteration-based mode with `train_log_step`/`valid_step`/`save_period`
cadences, `min|max <metric>` monitor with `early_stop` patience, lr-min
gating (in the schedule), per-window flattening of the (L, NumI) loops into
per-timestamp training iterations, and gradient accumulation (inside
optax.MultiSteps).  Epoch-based mode iterates full epochs with the same
machinery (the reference's epoch path is vestigial/dead code —
SURVEY.md §7 quirks — but the capability is kept).

TPU specifics: one jitted train step serves all iterations (the loss phase
switch is data-dependent, not trace-dependent); host->device transfer is
overlapped via `device_prefetch`; metrics come back as device scalars and
are only synced at logging boundaries.
"""
from __future__ import annotations

import logging
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataloader import device_prefetch
from ..utils.metrics import MetricTracker
from .checkpoint import save_checkpoint
from .train_step import TrainState


class Trainer:
    def __init__(
        self,
        config_parser,
        model,
        state: TrainState,
        train_step,
        eval_step,
        train_loader,
        valid_loader=None,
        writer=None,
        batch_sharding=None,
        model_name: str = "EVFIAutoEx",
        use_gt_ex: bool = True,
    ):
        self.cp = config_parser
        self.model = model
        self.state = state
        self.train_step = train_step
        self.eval_step = eval_step
        self.train_loader = train_loader
        self.valid_loader = valid_loader
        self.writer = writer
        self.batch_sharding = batch_sharding
        self.model_name = model_name
        self.use_gt_ex = use_gt_ex
        self.logger = logging.getLogger("trainer")

        tcfg = self.cp["trainer"]
        if tcfg.get("iteration_based_train", {}).get("enabled"):
            self.mode = "iteration_based_train"
        elif tcfg.get("epoch_based_train", {}).get("enabled"):
            self.mode = "epoch_based_train"
        else:
            raise ValueError("Incorrect training config!")
        mcfg = tcfg[self.mode]
        self.iterations = int(float(mcfg.get("iterations", 0)))
        self.epochs = int(mcfg.get("epochs", 0))
        self.save_period = int(mcfg.get("save_period", 1000))
        self.train_log_step = int(mcfg.get("train_log_step", 50))
        self.valid_step = int(mcfg.get("valid_step", 5000))
        self.do_validation = tcfg.get("do_validation", True) and valid_loader is not None

        vis_cfg = tcfg.get("vis", {})
        self.vis_enabled = bool(vis_cfg.get("enabled", False))
        self.vis_step = int(vis_cfg.get("train_img_writer_num", 20))

        monitor = tcfg.get("monitor", "off")
        if monitor == "off":
            self.mnt_mode = "off"
            self.mnt_best = 0.0
        else:
            self.mnt_mode, self.mnt_metric = monitor.split()
            assert self.mnt_mode in ("min", "max")
            self.mnt_best = math.inf if self.mnt_mode == "min" else -math.inf
        self.early_stop = int(tcfg.get("early_stop", 10))
        self.not_improved = 0

        self.train_metrics = MetricTracker(["train_loss"])
        self.valid_metrics = MetricTracker(["valid_loss"])

    # -------------------------------------------------------------- #

    def _batches_from_window(self, window: Dict[str, np.ndarray]):
        """Flatten a loaded window into per-timestamp training batches
        (train_ours.py:226-256).

        Multi-period loads (``NumPeriodPerLoad > 1``) are flattened into
        the batch stream: each period contributes its own blurry frame /
        exposure duty / relative-timestamp row, and the targets are the
        load's ``NumP * NumF`` latents (the reference's
        ``view(B, NumP*NumF, ...)``, train_ours.py:238).  This is the
        generalization the reference's loop *intends* — as shipped its
        ``SeqBlurryF[idxL].squeeze(1)`` is a no-op for NumP > 1 and the
        5-D frame crashes in conv2d (train_ours.py:239), so only NumP == 1
        actually runs there; here both work.
        """
        blurry = window["blurry"]        # (B, L, NumP, H, W, 3)
        events = window["events"]        # (B, L, H, W, 2TB)
        rel_ts = window["relative_ts"]   # (B, L, NumP, NumP*NumF)
        exposure = window["exposure"]    # (B, L, NumP, 1)
        latent = window.get("latent")    # (B, L, NumP, NumF', H, W, 3) or None
        B, L, num_p = blurry.shape[:3]
        num_i = rel_ts.shape[-1]
        if latent is not None:
            # (B, L, NumP, NumF', H, W, 3) -> (B, L, NumP*NumF', H, W, 3)
            lat_flat = latent.reshape(B, L, -1, *latent.shape[4:])
        for idx_l in range(L):
            for p in range(num_p):
                for i in range(num_i):
                    batch = {
                        "frame": blurry[:, idx_l, p],
                        "event": events[:, idx_l],
                        "t": rel_ts[:, idx_l, p, [i]],
                        "target": lat_flat[:, idx_l, i] if latent is not None else None,
                    }
                    if self.use_gt_ex:
                        batch["gt_ex"] = exposure[:, idx_l, p]
                    yield {k: v for k, v in batch.items() if v is not None}

    def _put(self, batch):
        if self.batch_sharding is not None:
            from ..parallel import put_global_batch

            return put_global_batch(batch, self.batch_sharding)
        return batch

    # -------------------------------------------------------------- #

    def train(self):
        if self.mode == "iteration_based_train":
            self.iteration_based_training()
        else:
            self.epoch_based_training()

    def iteration_based_training(self):
        it = int(self.state.step)
        epoch = 0
        stop = False
        while not stop:
            self.train_loader.set_epoch(epoch)
            for window in device_prefetch(iter(self.train_loader), n_prefetch=2):
                for batch in self._batches_from_window(window):
                    self.state, metrics = self.train_step(self.state, self._put(batch))
                    it = int(self.state.step)
                    stop = self._post_step(it, metrics, batch)
                    if stop or it >= self.iterations:
                        stop = True
                        break
                if stop:
                    break
            epoch += 1
        self.logger.info("Training completes!" if it >= self.iterations else "Early stop.")

    def epoch_based_training(self):
        for epoch in range(1, self.epochs + 1):
            self.train_loader.set_epoch(epoch)
            for window in device_prefetch(iter(self.train_loader), n_prefetch=2):
                for batch in self._batches_from_window(window):
                    self.state, metrics = self.train_step(self.state, self._put(batch))
                    self._log(int(self.state.step), metrics)
            val = self._valid() if self.do_validation else {}
            stop, best = self._eval_performance(val)
            self._save(int(self.state.step), best=best, tag=f"checkpoint-epoch{epoch}")
            if stop:
                break

    # -------------------------------------------------------------- #

    def _post_step(self, it: int, metrics, batch=None) -> bool:
        """Logging / validation / checkpoint cadence after an iteration
        (train_ours.py:278-347).  Returns stop_training."""
        self._log(it, metrics)
        if (
            self.vis_enabled
            and self.writer is not None
            and batch is not None
            and it % self.vis_step == 0
        ):
            self._log_images(it, batch)
        stop = False
        if self.do_validation and it % self.valid_step == 0 and it != 0:
            val = self._valid()
            for k, v in val.items():
                self.logger.info(f"    {k:25s}: {v}")
                if self.writer is not None:
                    self.writer.add_scalar(f"stamp_{k}", v, it)
            stop, best = self._eval_performance(val)
            if best:
                self._save(it, best=True)
        if it % self.save_period == 0 and it != 0:
            self._save(it)
        return stop

    def _log(self, it: int, metrics):
        if it % self.train_log_step == 0:
            import time

            loss = float(metrics["train_loss"])
            self.train_metrics.update("train_loss", loss)
            now = time.perf_counter()
            sps = None
            if getattr(self, "_last_log", None) is not None:
                dt = now - self._last_log[1]
                if dt > 0:
                    sps = (it - self._last_log[0]) / dt
            self._last_log = (it, now)
            if self.writer is not None:
                self.writer.add_scalar("train_loss", loss, it)
                if sps is not None:
                    # steps_per_sec auto-metric (logger/visualization.py:44-50)
                    self.writer.add_scalar("steps_per_sec", sps, it)
            msg = f"Iteration: {it}/{self.iterations} train_loss: {loss:.4e}"
            if sps is not None:
                msg += f" steps/sec: {sps:.2f}"
            self.logger.info(msg)

    def _log_images(self, it: int, batch) -> None:
        """TB image panels: events / blurry / sharp / gt
        (train_ours.py:297-308)."""
        try:
            from ..utils.vis import render_event_cnt, stack_to_cnt

            sharp, final = self.model.apply(
                self.state.params,
                jnp.asarray(batch["frame"][:1]),
                jnp.asarray(batch["event"][:1]),
                jnp.asarray(batch["t"][:1]),
                jnp.asarray(batch["gt_ex"][:1]) if "gt_ex" in batch else None,
            )
            ev_img = render_event_cnt(stack_to_cnt(np.asarray(batch["event"][0])))
            self.writer.add_image("train_HR_events", ev_img, it, dataformats="HWC")
            self.writer.add_image(
                "train_blurry_frame",
                (np.asarray(batch["frame"][0]) * 255).astype("uint8"), it,
                dataformats="HWC",
            )
            self.writer.add_image(
                "train_sharp_frame",
                (np.clip(np.asarray(final[0]), 0, 1) * 255).astype("uint8"), it,
                dataformats="HWC",
            )
            if "target" in batch:
                self.writer.add_image(
                    "train_gt_frame",
                    (np.asarray(batch["target"][0]) * 255).astype("uint8"), it,
                    dataformats="HWC",
                )
        except Exception as e:  # pragma: no cover - vis must never kill training
            self.logger.warning(f"image logging failed: {e}")

    def _valid(self) -> Dict[str, float]:
        self.valid_metrics.reset()
        for window in device_prefetch(iter(self.valid_loader), n_prefetch=2):
            for batch in self._batches_from_window(window):
                m = self.eval_step(self.state.params, self._put(batch))
                self.valid_metrics.update("valid_loss", float(m["valid_loss"]))
        return self.valid_metrics.result()

    def _eval_performance(self, val_log: Dict[str, float]):
        """Monitor + early stop (train_ours.py:392-435)."""
        if self.mnt_mode == "off" or not val_log:
            return False, False
        value = val_log[self.mnt_metric]
        improved = value <= self.mnt_best if self.mnt_mode == "min" else value >= self.mnt_best
        if improved:
            self.mnt_best = value
            self.not_improved = 0
            return False, True
        self.not_improved += 1
        if self.not_improved > self.early_stop:
            self.logger.info(
                f"Validation performance didn't improve for {self.early_stop} stamps. "
                "Training stops."
            )
            return True, False
        return False, False

    def _save(self, it: int, best: bool = False, tag: Optional[str] = None):
        # ALL processes enter (orbax coordinates multi-process saves with
        # internal barriers; only the primary host writes — gating here
        # would deadlock rank 0's barrier, cf. reference rank-0-only
        # torch.save which has no such coordination, train_ours.py:331)
        tag = tag or (
            f"model_best_until_iteration{it}" if best else f"checkpoint-iteration{it}"
        )
        trainer_state = {
            "training_mode": self.mode,
            "iteration": it,
            "monitor_best": float(self.mnt_best),
        }
        save_checkpoint(
            self.cp.save_dir,
            tag,
            self.state.params,
            self.state.opt_state,
            it,
            self.cp.config,
            trainer_state,
            model_name=self.model_name,
            optimizer_name=self.cp["optimizer"]["name"],
            scheduler_name=(self.cp.get("lr_scheduler") or {}).get("name"),
        )
        self.logger.info(f"Saving checkpoint: {tag}")
