"""Build train/valid datalist txts (port of datalist/generate_datalist.py).

Usage:
  python tools/generate_datalist.py --data_path /path/to/h5dir --mode 2 \
      --portion 0.9 --train_txt train.txt --valid_txt valid.txt
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ebfi_tpu.data.datalist import build_datalist, write_txt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--valid_data_path", default=None)
    p.add_argument("--mode", type=int, default=0)
    p.add_argument("--num", type=int, default=None)
    p.add_argument("--valid_num", type=int, default=None)
    p.add_argument("--portion", type=float, default=None)
    p.add_argument("--train_txt", default="train.txt")
    p.add_argument("--valid_txt", default="valid.txt")
    p.add_argument("--seed", type=int, default=0)
    flags = p.parse_args()

    train, valid = build_datalist(
        flags.data_path, flags.mode, flags.num, flags.valid_num,
        flags.portion, flags.valid_data_path, flags.seed,
    )
    write_txt(flags.train_txt, train)
    print(f"wrote {flags.train_txt}: {len(train)} clips")
    if valid:
        write_txt(flags.valid_txt, valid)
        print(f"wrote {flags.valid_txt}: {len(valid)} clips")


if __name__ == "__main__":
    main()
