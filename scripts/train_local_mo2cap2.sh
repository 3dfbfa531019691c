#!/bin/bash
# Local prior on the mo2cap2 subset (reference: networks/train_local_mo2cap2.sh)
python -m globalegomocap_tpu.cli.train --train_data_path "$1" \
  --latent_dim 2048 --seq_length 10 --fps 25 --kl_weight 0.5 \
  --epoch 20 --batch_size 64 --local_pose true --with_mo2cap2_names "$2"
