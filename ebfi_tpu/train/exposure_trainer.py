"""Trainer for the ExposureDecision pretrain stage.

Same control surface as the full Trainer but one iteration per loaded
real-data window (no per-timestamp inner loop;
train_ours_exposuredecision.py:188-260)."""
from __future__ import annotations

from .trainer import Trainer


class ExposureTrainer(Trainer):
    def __init__(self, *args, **kwargs):
        kwargs.setdefault("model_name", "ExposureDecision")
        super().__init__(*args, **kwargs)

    def _batches_from_window(self, window):
        blurry = window["blurry"]      # (B, L, NumP, H, W, 3)
        events = window["events"]      # (B, L, H, W, 2TB)
        exposure = window["exposure"]  # (B, L, NumP, 1)
        L = blurry.shape[1]
        if blurry.shape[2] != 1:
            raise ValueError("exposure pretrain consumes NumPeriodPerLoad == 1 windows")
        for idx_l in range(L):
            yield {
                "frame": blurry[:, idx_l, 0],
                "event": events[:, idx_l],
                "gt_ex": exposure[:, idx_l, 0],
            }

    def _valid(self):
        self.valid_metrics.reset()
        from ..data.dataloader import device_prefetch

        for window in device_prefetch(iter(self.valid_loader), n_prefetch=2):
            for batch in self._batches_from_window(window):
                m = self.eval_step(self.state.params, self._put(batch))
                self.valid_metrics.update("valid_loss", float(m["valid_loss"]))
        return self.valid_metrics.result()
