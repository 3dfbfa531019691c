#!/bin/bash
# Canonical global relative-pose prior training (reference hyperparams:
# networks/train_global.sh — latent 2048, kl 0.5, seq 10, batch 64, fps 25)
python -m globalegomocap_tpu.cli.train --train_data_path "$1" \
  --latent_dim 2048 --seq_length 10 --fps 25 --kl_weight 0.5 \
  --epoch 20 --batch_size 64 --slide_window_step 1
