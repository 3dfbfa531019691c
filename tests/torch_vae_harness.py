"""Test-only torch harness: an independent PyTorch build of the ConvVAE
architecture (per its published description: 5 conv blocks, fc heads, linear
decoder input, 4 deconv blocks + final block) whose state_dict uses the same
key names as reference checkpoints.  Used to validate the torch->flax
converter and for golden-value cross-checks, exactly as the reference's own
torch-vs-numpy `__main__` cross-checks did (SURVEY.md §4)."""

import torch
import torch.nn as nn


class TorchConvVAE(nn.Module):
    def __init__(self, in_channels=45, out_channels=45, latent_dim=64,
                 seq_len=10, hidden_dims=(64, 64, 128, 256, 512)):
        super().__init__()
        self.seq_len = seq_len
        self.latent_dim = latent_dim
        self.hidden_dims = hidden_dims

        blocks = []
        c = in_channels
        for h in hidden_dims:
            blocks.append(nn.Sequential(
                nn.Conv1d(c, h, kernel_size=3, stride=1, padding=1),
                nn.BatchNorm1d(h),
                nn.LeakyReLU()))
            c = h
        self.encoder = nn.Sequential(*blocks)
        flat = hidden_dims[-1] * seq_len
        self.fc_mu = nn.Linear(flat, latent_dim)
        self.fc_var = nn.Linear(flat, latent_dim)

        self.decoder_input = nn.Linear(latent_dim, flat)
        rev = list(reversed(hidden_dims))
        blocks = []
        for i in range(len(rev) - 1):
            blocks.append(nn.Sequential(
                nn.ConvTranspose1d(rev[i], rev[i + 1], kernel_size=3,
                                   stride=1, padding=1, output_padding=0),
                nn.BatchNorm1d(rev[i + 1]),
                nn.LeakyReLU()))
        self.decoder = nn.Sequential(*blocks)
        self.final_layer = nn.Sequential(
            nn.ConvTranspose1d(rev[-1], rev[-1], kernel_size=3, stride=1,
                               padding=1, output_padding=0),
            nn.BatchNorm1d(rev[-1]),
            nn.LeakyReLU(),
            nn.Conv1d(rev[-1], out_channels, kernel_size=3, padding=1))

    def encode(self, pose_btc: torch.Tensor):
        """pose: (B, T, C) -> (mu, log_var)."""
        x = pose_btc.permute(0, 2, 1).contiguous()
        h = self.encoder(x)
        h = torch.flatten(h, start_dim=1)
        return self.fc_mu(h), self.fc_var(h)

    def decode(self, z: torch.Tensor):
        """z: (B, latent) -> (B, T, C)."""
        h = self.decoder_input(z)
        h = h.view(-1, self.hidden_dims[-1], self.seq_len)
        h = self.decoder(h)
        h = self.final_layer(h)
        return h.permute(0, 2, 1)
