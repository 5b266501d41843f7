#!/usr/bin/env bash
# Full-model training (counterpart of the reference's scripts/train_ours.sh).
# Multi-chip: one process per host; the device mesh handles all local chips
# and jax.distributed extends across hosts (no torch.distributed.launch).
set -e
python -m ebfi_tpu.train \
    -c configs/train_evfi.yml \
    -id "${1:-run0}"
