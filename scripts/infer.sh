#!/usr/bin/env bash
# Inference recipes (counterpart of scripts/infer_ours.sh).
set -e

############## synthetic data
python -m ebfi_tpu.infer \
    --model_path /path/to/checkpoint \
    --data_list /path/to/test.txt \
    --output_path /path/to/output \
    --scale 2 \
    --ori_scale down2 \
    --time_bins 16 \
    --num_frame_per_period 16 \
    --num_frame_per_blurry 3 \
    --num_period_per_seq 2 \
    --sliding_window_seq 2 \
    --num_period_per_load 1 \
    --sliding_window_load 1 \
    --exposure_method Fixed \
    --noise_enabled

############## real-world data: RealBlur-DAVIS
python -m ebfi_tpu.infer \
    --model_path /path/to/checkpoint \
    --data_list /path/to/test.txt \
    --output_path /path/to/output \
    --scale 2 \
    --ori_scale down2 \
    --time_bins 16 \
    --interp_num 256 \
    --num_period_per_seq 2 \
    --sliding_window_seq 2 \
    --num_period_per_load 1 \
    --sliding_window_load 1 \
    --noise_enabled \
    --real_blur
