"""Convert released PyTorch ConvVAE checkpoints (.pth.tar) to Flax variables.

The reference ships its motion priors as torch checkpoints
({'epoch','args','state_dict','eval_result','optimizer'} — reference:
networks/train.py:102-108).  This converter maps that state_dict onto the
Flax `ConvVAE` parameter tree, handling the three layout differences:

  1. torch Conv1d weight (out, in, k)      -> flax kernel (k, in, out)
  2. torch ConvTranspose1d weight (in, out, k) with stride 1, padding 1 is
     equivalent to a Conv1d whose kernel is flipped along time:
     flax kernel = flip(W, axis=k).transpose(k, in, out)
  3. torch flattens sequences channel-major (C, T) while the Flax model
     flattens time-major (T, C); the Linear layers touching the flattened
     512*T activations (fc_mu, fc_var, decoder_input) get their weight
     rows/columns permuted accordingly.

BatchNorm running statistics are carried over into `batch_stats` so the
optimizer's eval-mode decoding matches the reference bit-for-bit
(SURVEY.md §7 "BatchNorm semantics" risk).

Only `numpy` is required at call time if the state dict is already loaded;
`torch` is imported lazily to read .pth.tar files.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _perm_ct_to_tc(n_channels: int, seq_len: int) -> np.ndarray:
    """Index permutation mapping torch's (C, T)-flattened feature order to
    the (T, C) order used by the Flax model: out[i_tc] = in[perm[i_tc]]."""
    idx = np.arange(n_channels * seq_len).reshape(n_channels, seq_len)
    return idx.T.reshape(-1)  # position (t, c) -> torch index c*T + t


def _conv_to_flax(w: np.ndarray) -> np.ndarray:
    # (out, in, k) -> (k, in, out)
    return np.transpose(w, (2, 1, 0))


def _convT_to_flax(w: np.ndarray) -> np.ndarray:
    # (in, out, k) -> flip k -> (k, in, out)
    return np.transpose(w[:, :, ::-1], (2, 0, 1))


def _dense_to_flax(w: np.ndarray) -> np.ndarray:
    # (out, in) -> (in, out)
    return np.transpose(w)


def torch_state_dict_to_flax(state_dict: Mapping[str, np.ndarray],
                             seq_len: int,
                             hidden_dims=(64, 64, 128, 256, 512)):
    """Build {'params': ..., 'batch_stats': ...} for `ConvVAE` from a torch
    state_dict (tensor values or numpy arrays)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value, dtype=np.float32)

    def conv_block(dst_name, conv_prefix, bn_prefix, transposed):
        w = sd[f"{conv_prefix}.weight"]
        kernel = _convT_to_flax(w) if transposed else _conv_to_flax(w)
        put(params, (dst_name, "conv", "kernel"), kernel)
        put(params, (dst_name, "conv", "bias"), sd[f"{conv_prefix}.bias"])
        put(params, (dst_name, "bn", "scale"), sd[f"{bn_prefix}.weight"])
        put(params, (dst_name, "bn", "bias"), sd[f"{bn_prefix}.bias"])
        put(stats, (dst_name, "bn", "mean"), sd[f"{bn_prefix}.running_mean"])
        put(stats, (dst_name, "bn", "var"), sd[f"{bn_prefix}.running_var"])

    # encoder: torch names encoder.{i}.0 (conv) / encoder.{i}.1 (bn)
    for i in range(len(hidden_dims)):
        conv_block(f"enc_{i}", f"encoder.{i}.0", f"encoder.{i}.1",
                   transposed=False)

    c_last = hidden_dims[-1]
    perm = _perm_ct_to_tc(c_last, seq_len)

    # fc heads read the flattened (C*T) activations: permute input columns
    for torch_name, flax_name in (("fc_mu", "fc_mu"), ("fc_var", "fc_var")):
        w = _dense_to_flax(sd[f"{torch_name}.weight"])  # (in, out)
        put(params, (flax_name, "kernel"), w[perm, :])
        put(params, (flax_name, "bias"), sd[f"{torch_name}.bias"])

    # decoder_input writes flattened (C*T) activations: permute output rows
    w = _dense_to_flax(sd["decoder_input.weight"])  # (in, out)
    put(params, ("decoder_input", "kernel"), w[:, perm])
    put(params, ("decoder_input", "bias"), sd["decoder_input.bias"][perm])

    # decoder blocks: decoder.{i}.0 ConvTranspose1d / decoder.{i}.1 BN
    for i in range(len(hidden_dims) - 1):
        conv_block(f"dec_{i}", f"decoder.{i}.0", f"decoder.{i}.1",
                   transposed=True)

    # final layer: final_layer.0 ConvT, final_layer.1 BN, final_layer.3 Conv
    conv_block("final_block", "final_layer.0", "final_layer.1",
               transposed=True)
    put(params, ("final_conv", "kernel"),
        _conv_to_flax(sd["final_layer.3.weight"]))
    put(params, ("final_conv", "bias"), sd["final_layer.3.bias"])

    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str, seq_len: int,
                          hidden_dims=(64, 64, 128, 256, 512)):
    """Read a reference .pth.tar checkpoint and return Flax variables.

    Accepts both the full training checkpoint dict (with a 'state_dict'
    key) and a bare state_dict."""
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    return torch_state_dict_to_flax(sd, seq_len, hidden_dims)


def flax_to_torch_state_dict(variables, seq_len: int,
                             hidden_dims=(64, 64, 128, 256, 512)):
    """Inverse conversion: export Flax ConvVAE variables as a torch-style
    state_dict (numpy values), so models trained here remain loadable by
    reference-compatible torch tooling."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    c_last = hidden_dims[-1]
    perm = _perm_ct_to_tc(c_last, seq_len)
    inv_perm = np.argsort(perm)
    out: dict = {}

    def block_out(dst_conv, dst_bn, src, transposed):
        kernel = np.asarray(params[src]["conv"]["kernel"])
        if transposed:
            out[f"{dst_conv}.weight"] = np.transpose(
                kernel, (1, 2, 0))[:, :, ::-1].copy()
        else:
            out[f"{dst_conv}.weight"] = np.transpose(kernel, (2, 1, 0))
        out[f"{dst_conv}.bias"] = np.asarray(params[src]["conv"]["bias"])
        out[f"{dst_bn}.weight"] = np.asarray(params[src]["bn"]["scale"])
        out[f"{dst_bn}.bias"] = np.asarray(params[src]["bn"]["bias"])
        out[f"{dst_bn}.running_mean"] = np.asarray(stats[src]["bn"]["mean"])
        out[f"{dst_bn}.running_var"] = np.asarray(stats[src]["bn"]["var"])
        out[f"{dst_bn}.num_batches_tracked"] = np.asarray(0)

    for i in range(len(hidden_dims)):
        block_out(f"encoder.{i}.0", f"encoder.{i}.1", f"enc_{i}", False)
    for name in ("fc_mu", "fc_var"):
        w = np.asarray(params[name]["kernel"])  # (in_perm, out)
        out[f"{name}.weight"] = np.transpose(w[inv_perm, :])
        out[f"{name}.bias"] = np.asarray(params[name]["bias"])
    w = np.asarray(params["decoder_input"]["kernel"])
    out["decoder_input.weight"] = np.transpose(w[:, inv_perm])
    out["decoder_input.bias"] = np.asarray(
        params["decoder_input"]["bias"])[inv_perm]
    for i in range(len(hidden_dims) - 1):
        block_out(f"decoder.{i}.0", f"decoder.{i}.1", f"dec_{i}", True)
    block_out("final_layer.0", "final_layer.1", "final_block", True)
    out["final_layer.3.weight"] = np.transpose(
        np.asarray(params["final_conv"]["kernel"]), (2, 1, 0))
    out["final_layer.3.bias"] = np.asarray(params["final_conv"]["bias"])
    return out
