"""Collapse the ConvVAE decoder into a chain of dense matmuls.

Why: the latent solver's objective evaluation is op-latency-bound, not
FLOP-bound (solver_floor.json — a value-only eval costs nearly as much as
value+grad).  The decoder's per-layer cost at T=10 is a tiny conv kernel
plus bias/activation launches; with k=3, stride 1, SAME padding every layer
is a LINEAR map of the flattened (T*C) sequence, so the whole stack can be
re-expressed as ONE banded (T*C_in, T*C_out) matmul per layer — the MXU's
native op — cutting the kernel count of every objective eval (and of its
VJP, which is again a matmul chain).

The band matrices are built by pushing the identity basis through each conv
layer once, which is exact by construction (including the SAME-padding
edges and the ConvTranspose-as-flipped-conv equivalence already baked into
the weights by models/torch_convert.py).  BatchNorm must be folded first
(models/fold_bn.py) — eval-mode BN is an affine map absorbed by the band
matrix.

Reference behaviour reproduced: `ConvVAE.decode` /
`decode_to_bodypose` (reference: networks/models/SeqConvVAE.py:118-140) —
this is a mathematically identical re-association, verified to float
tolerance in tests/test_dense_decoder.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from globalegomocap_tpu.models.conv_vae import ConvVAE
from globalegomocap_tpu.models.fold_bn import fold_batchnorm


def _conv_band_matrix(kernel: jnp.ndarray, bias: jnp.ndarray,
                      seq_len: int, dtype) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Equivalent dense matrix of a k=3/stride-1/SAME Conv1d over a length-T
    sequence, acting on the row-major (T, C)-flattened vector.

    kernel: (k, C_in, C_out) in flax WIO layout.  Returns (W, b) with
    W: (T*C_in, T*C_out), b: (T*C_out,).
    """
    _, cin, cout = kernel.shape
    basis = jnp.eye(seq_len * cin, dtype=dtype).reshape(
        seq_len * cin, seq_len, cin)
    out = jax.lax.conv_general_dilated(
        basis, kernel.astype(dtype), window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"))
    w = out.reshape(seq_len * cin, seq_len * cout)
    b = jnp.tile(bias.astype(dtype), seq_len)
    return w, b


def make_dense_decoder(model: ConvVAE, variables, compute_dtype=None):
    """Build `decode_to_bodypose(z: (B, latent)) -> (B, T, 15, 3)` as a
    pure matmul chain from a ConvVAE's variables.

    Accepts either folded (use_bn=False style) or raw variables — BN is
    folded here if running statistics are present.  Safe to call inside a
    jit trace: the band-matrix construction is loop-invariant, so solvers
    built on the returned closure hoist it out of their iteration loop.

    compute_dtype=bfloat16 stores the band matrices (the dominant HBM
    traffic of every eval: ~72 MB of bands at full size) in bf16; the MXU
    computes f32-in matmuls at bf16 precision anyway (the TPU default), so
    this halves weight streaming at unchanged matmul precision.  The
    returned poses are always float32.
    """
    if variables.get("batch_stats"):
        variables = fold_batchnorm(variables)
    params = variables["params"]
    t = model.seq_len
    dtype = compute_dtype if compute_dtype is not None else model.dtype

    din = params["decoder_input"]
    first_w = din["kernel"].astype(dtype)      # (latent, T*rev0)
    first_b = din["bias"].astype(dtype)

    mid = []
    n_dec = len(model.hidden_dims) - 1
    for name in [f"dec_{i}" for i in range(n_dec)] + ["final_block"]:
        conv = params[name]["conv"]
        mid.append(_conv_band_matrix(conv["kernel"], conv["bias"], t, dtype))

    fc = params["final_conv"]
    last_w, last_b = _conv_band_matrix(fc["kernel"], fc["bias"], t, dtype)

    out_ch = model.out_channels

    def decode_to_bodypose(z: jnp.ndarray) -> jnp.ndarray:
        h = z.astype(dtype) @ first_w + first_b
        for w, b in mid:
            h = jax.nn.leaky_relu(h @ w + b, negative_slope=0.01)
        h = h @ last_w + last_b
        return h.astype(jnp.float32).reshape(-1, t, out_ch // 3, 3)

    return decode_to_bodypose


def make_shift_decoder(model: ConvVAE, variables, compute_dtype=None):
    """`decode_to_bodypose` as SHIFT-MATMULS: each k=3/stride-1 conv layer
    is computed as three (B*T, C_in) x (C_in, C_out) matmuls over the
    -1/0/+1 time shifts of the padded sequence.

    Same re-association family as the band matrices of
    `make_dense_decoder`, but without their FLOP inflation: the band
    matmul spends T/k = ~3.3x the FLOPs and streams T*T/k ~ 33x the
    weight bytes of the underlying conv (72 MB of bands vs ~2.6 MB of raw
    kernels at full size, per objective eval).  The shifted formulation
    keeps the MXU matmul large (rows = B*T) while touching only the true
    kernel weights — strictly less HBM traffic AND fewer FLOPs, at the
    cost of ~3 fused kernels per layer instead of 1.

    Exact to float tolerance vs the conv stack (tests/test_dense_decoder).
    """
    if variables.get("batch_stats"):
        variables = fold_batchnorm(variables)
    params = variables["params"]
    t = model.seq_len
    dtype = compute_dtype if compute_dtype is not None else model.dtype

    din = params["decoder_input"]
    first_w = din["kernel"].astype(dtype)      # (latent, T*rev0)
    first_b = din["bias"].astype(dtype)
    rev0 = tuple(reversed(model.hidden_dims))[0]

    layers = []
    n_dec = len(model.hidden_dims) - 1
    for name in [f"dec_{i}" for i in range(n_dec)] + ["final_block",
                                                      "final_conv"]:
        p = params[name]["conv"] if "conv" in params.get(name, {}) else \
            params[name]
        layers.append((p["kernel"].astype(dtype),      # (3, Cin, Cout)
                       p["bias"].astype(dtype)))

    def conv_layer(h, kernel, bias):
        """h: (B, T, Cin) -> (B, T, Cout), SAME-padded k=3 stride-1."""
        hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))
        out = (jnp.einsum("btc,cd->btd", hp[:, :-2], kernel[0])
               + jnp.einsum("btc,cd->btd", hp[:, 1:-1], kernel[1])
               + jnp.einsum("btc,cd->btd", hp[:, 2:], kernel[2]))
        return out + bias

    out_ch = model.out_channels

    def decode_to_bodypose(z: jnp.ndarray) -> jnp.ndarray:
        h = (z.astype(dtype) @ first_w + first_b).reshape(-1, t, rev0)
        for kernel, bias in layers[:-1]:
            h = jax.nn.leaky_relu(conv_layer(h, kernel, bias),
                                  negative_slope=0.01)
        h = conv_layer(h, *layers[-1])
        return h.astype(jnp.float32).reshape(-1, t, out_ch // 3, 3)

    return decode_to_bodypose
