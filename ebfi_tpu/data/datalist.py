"""Datalist construction: sample train/valid H5 lists from directories.

Port of datalist/generate_datalist.py:28-108 — four sampling modes:
  0: sample `num` training clips from data_path
  1: sample `num` train + `valid_num` valid (disjoint) from data_path
  2: split data_path by `portion` into train/valid
  3: sample train from data_path and valid from valid_data_path
"""
from __future__ import annotations

import glob
import os
import random
from typing import List, Optional, Tuple


def write_txt(path: str, items: List[str]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(items) + "\n")


def build_datalist(
    data_path: str,
    mode: int = 0,
    num: Optional[int] = None,
    valid_num: Optional[int] = None,
    portion: Optional[float] = None,
    valid_data_path: Optional[str] = None,
    seed: int = 0,
) -> Tuple[List[str], List[str]]:
    """Returns (train_paths, valid_paths); valid is empty for mode 0."""
    paths = sorted(glob.glob(os.path.join(data_path, "*.h5")))
    n = len(paths)
    rnd = random.Random(seed)
    if mode == 0:
        k = num if num is not None else n
        return sorted(rnd.sample(paths, k)), []
    if mode == 1:
        train = rnd.sample(paths, num)
        left = sorted(set(paths) - set(train))
        valid = sorted(random.Random(seed).sample(left, valid_num))
        return train, valid
    if mode == 2:
        k = int(n * portion)
        train = rnd.sample(paths, k)
        valid = sorted(set(paths) - set(train))
        return train, valid
    if mode == 3:
        vpaths = sorted(glob.glob(os.path.join(valid_data_path, "*.h5")))
        train = sorted(rnd.sample(paths, num))
        valid = sorted(random.Random(seed).sample(vpaths, valid_num))
        return train, valid
    raise ValueError(f"Invalid mode {mode}")
