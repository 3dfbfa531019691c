"""VAE training pipeline (data-parallel over a TPU mesh)."""

from globalegomocap_tpu.train.train_vae import (
    Trainer, TrainState, make_train_step, make_eval_step)
