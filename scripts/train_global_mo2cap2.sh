#!/bin/bash
# Global prior restricted to the mo2cap2 motion subset
# (reference: networks/train_global_mo2cap2.sh); $2 = sequence-name list
python -m globalegomocap_tpu.cli.train --train_data_path "$1" \
  --latent_dim 2048 --seq_length 10 --fps 25 --kl_weight 0.5 \
  --epoch 20 --batch_size 64 --with_mo2cap2_names "$2"
