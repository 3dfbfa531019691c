#!/bin/bash
# Canonical local-pose prior training (reference: networks/train_local.sh)
python -m globalegomocap_tpu.cli.train --train_data_path "$1" \
  --latent_dim 2048 --seq_length 10 --fps 25 --kl_weight 0.5 \
  --epoch 20 --batch_size 64 --slide_window_step 1 --local_pose true
