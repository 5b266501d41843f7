"""RAM-preloading dataset variant.

Equivalent of dataloader/h5dataset_fast.py: decodes EVERY item at
construction into host memory so `get` is a dict lookup — trades RAM for
the per-item H5 decode latency on the training hot path (useful on hosts
where the input pipeline, not the TPU, is the bottleneck).  Like the
reference, augmentation still runs per-fetch (fresh seeds each epoch) and
NeighborGT is unsupported.
"""
from __future__ import annotations

import random
from typing import Dict, Optional

import numpy as np

from .h5dataset import H5ClipDataset, augment


class H5ClipDatasetFast(H5ClipDataset):
    def __init__(self, h5_path: str, config: dict):
        if config.get("NeedNeighborGT"):
            raise ValueError("fast dataset drops NeighborGT support "
                             "(h5dataset_fast.py behaviour)")
        # Preload with augmentation disabled; re-apply per fetch.
        self._aug_cfg = config["data_augment"]
        preload_cfg = dict(config)
        preload_cfg["data_augment"] = dict(config["data_augment"], enabled=False)
        super().__init__(h5_path, preload_cfg)
        self._cache = [super(H5ClipDatasetFast, self).get(i) for i in range(len(self))]
        self.h5.close()

    def get(self, index: int, seed: Optional[int] = None) -> Dict[str, np.ndarray]:
        if seed is None:
            seed = random.randint(0, 2**32)
        item = dict(self._cache[index])
        if self._aug_cfg.get("enabled"):
            spatial = {k: item[k] for k in ("latent", "blurry", "events") if k in item}
            kinds = {"latent": "frame", "blurry": "frame", "events": "event"}
            spatial = augment(spatial, kinds, self._aug_cfg, seed, self.spec.gt_resolution)
            item.update({k: np.ascontiguousarray(v) for k, v in spatial.items()})
        return item
