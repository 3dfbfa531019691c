"""Motion-prior models: the convolutional sequence VAE and its tooling."""

from globalegomocap_tpu.models.conv_vae import (
    ConvVAE,
    VAEOutput,
    reparameterize,
    vae_loss,
)
