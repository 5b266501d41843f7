#!/usr/bin/env bash
# Stage-1 ExposureDecision pretrain on real-data clips
# (counterpart of train_ours_exposuredecision.py's launch).
set -e
python -m ebfi_tpu.train \
    -c configs/train_exposure.yml \
    -id "${1:-exposure0}"
