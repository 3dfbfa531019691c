"""Motion-VAE training: jit-compiled, data-parallel over a 1-D device mesh.

Reference training loop (networks/train.py:35-134): Adam(lr 1e-4, wd 0),
batch 64, 20 epochs, ELBO with M_N = kl_weight * batch / len(dataset),
per-epoch eval = reconstruction MPJPE, checkpoint every epoch.  The local
trainer (train_local.py) is the same loop over local-pose windows — here
that's just `TrainConfig.local_pose=True`.

TPU re-design: the train step jit-compiles once with the batch axis sharded
over the mesh ('dp'); XLA inserts the gradient all-reduce over ICI.
BatchNorm batch statistics are computed per shard and averaged into the
running stats (sync-BN-free, matching the reference's per-device BN
semantics on a single device; with data parallelism the running stats see
every shard through the merged updates).
"""

from __future__ import annotations

import json
import math
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from globalegomocap_tpu.config import TrainConfig
from globalegomocap_tpu.data.amass import AmassWindows
from globalegomocap_tpu.models.conv_vae import ConvVAE, vae_loss
from globalegomocap_tpu.parallel.mesh import (
    make_mesh, replicate, shard_batch)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(cfg: TrainConfig, total_steps: int = 0):
    """Adam/AdamW with an optional cosine-decay schedule.

    The reference trains with a fixed Adam lr (networks/train.py:96); the
    'cosine' schedule (warmup -> cosine to cfg.lr_final over `total_steps`)
    is a rebuild addition that stabilizes long runs on small corpora, where
    a fixed lr oscillates around the recon floor (prior_recon_sweep.json).
    """
    lr = cfg.learning_rate
    if cfg.lr_schedule == "cosine" and total_steps > 0:
        warm = min(cfg.lr_warmup_steps, max(total_steps - 1, 0))
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warm else cfg.learning_rate,
            peak_value=cfg.learning_rate,
            warmup_steps=warm,
            decay_steps=total_steps,
            end_value=cfg.lr_final)
    if cfg.weight_decay:
        return optax.adamw(lr, weight_decay=cfg.weight_decay)
    return optax.adam(lr)


def make_train_step(model: ConvVAE, tx, kld_weight: float):
    """Jittable train step: (state, batch (B, T, 45), rng) ->
    (state, metrics)."""

    def step(state: TrainState, batch: jnp.ndarray, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, True, rng, mutable=["batch_stats"])
            loss, recon, kld = vae_loss(out.reconstruction, batch, out.mu,
                                        out.log_var, kld_weight)
            return loss, (recon, kld, updates.get("batch_stats", {}))

        (loss, (recon, kld, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_stats,
                                  opt_state=opt_state)
        metrics = {"loss": loss, "recon_loss": recon, "kld_loss": kld}
        return new_state, metrics

    return step


def make_eval_step(model: ConvVAE):
    """Eval = deterministic (z = mu) reconstruction MPJPE
    (reference: networks/train.py:110-129).

    Takes a per-window validity mask so padded rows (added to make the
    sharded batch axis divide the device count) don't bias the mean;
    returns (sum of per-window MPJPE over valid rows, valid count)."""

    def step(state: TrainState, batch: jnp.ndarray, mask: jnp.ndarray):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, False)
        pred = out.reconstruction.reshape(batch.shape[0], -1, 15, 3)
        gt = batch.reshape(batch.shape[0], -1, 15, 3)
        per_window = jnp.mean(jnp.linalg.norm(pred - gt, axis=-1),
                              axis=(1, 2))
        return jnp.sum(per_window * mask), jnp.sum(mask)

    return step


def make_epoch_step(model: ConvVAE, tx, kld_weight: float):
    """A whole epoch as ONE program: lax.scan of the train step over the
    stacked (S, B, T, 45) shuffled batches.  Same math and rng semantics
    as the eager loop (the loop passes one constant rng to every step),
    so trajectories coincide; per-step metrics are summed on device."""
    step = make_train_step(model, tx, kld_weight)

    def epoch(state: TrainState, batches: jnp.ndarray, rng):
        def body(st, batch):
            st, metrics = step(st, batch, rng)
            return st, metrics
        state, ms = jax.lax.scan(body, state, batches)
        return state, jax.tree_util.tree_map(jnp.sum, ms)

    return epoch


class Trainer:
    """End-to-end trainer over window datasets.

    train_ds/test_ds are duck-typed: anything with `__len__` and
    `epoch_batches(rng, batch_size, drop_last=..., shuffle=...)` —
    materialized AmassWindows or the streaming HDF5WindowStream
    (data/hdf5.py) for AMASS-scale corpora that don't fit in RAM."""

    def __init__(self, cfg: TrainConfig, train_ds: AmassWindows,
                 test_ds: AmassWindows, model: ConvVAE | None = None):
        self.cfg = cfg
        self.train_ds = train_ds
        self.test_ds = test_ds
        dt = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
              else jnp.float32)
        self.model = model or ConvVAE(latent_dim=cfg.latent_dim,
                                      seq_len=cfg.seq_length,
                                      logvar_bias_init=cfg.logvar_init_bias,
                                      dtype=dt)
        steps_per_epoch = max(1, len(train_ds) // max(1, cfg.batch_size))
        self.tx = make_optimizer(cfg, total_steps=steps_per_epoch
                                 * cfg.epochs)

        self.mesh = make_mesh(cfg.num_devices or None)
        self._repl = replicate(self.mesh)
        self._batch_sh = shard_batch(self.mesh)

        rng = jax.random.PRNGKey(cfg.seed)
        x0 = jnp.zeros((2, cfg.seq_length, 45))
        variables = self.model.init(rng, x0, False)
        state = TrainState(
            step=jnp.asarray(0),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]))
        self.state = jax.device_put(state, self._repl)

        # M_N of the reference: kl_weight * batch / dataset_len
        kld_weight = cfg.kl_weight * cfg.batch_size / max(1, len(train_ds))
        self._train_step = jax.jit(
            make_train_step(self.model, self.tx, kld_weight),
            in_shardings=(self._repl, self._batch_sh, None),
            out_shardings=(self._repl, self._repl),
            donate_argnums=(0,))
        self._eval_step = jax.jit(
            make_eval_step(self.model),
            in_shardings=(self._repl, self._batch_sh, self._batch_sh))
        if cfg.epoch_scan:
            from jax.sharding import NamedSharding, PartitionSpec
            # (S, B, ...) scan input: batch axis 1 carries the dp sharding
            self._scan_sh = NamedSharding(self.mesh,
                                          PartitionSpec(None, "dp"))
            self._epoch_step = jax.jit(
                make_epoch_step(self.model, self.tx, kld_weight),
                in_shardings=(self._repl, self._scan_sh, None),
                out_shardings=(self._repl, self._repl),
                donate_argnums=(0,))

        self.history: list[dict] = []

        # prior-regime statistic (optimize/prior_bank.py, VERDICT r3 #7):
        # the training windows' mean per-frame acceleration magnitude,
        # recorded in checkpoint metadata so deployment can detect a
        # prior/input motion-regime mismatch (SequenceOptimizer.
        # prior_accel_mean) or auto-select from a PriorBank without
        # re-reading the training corpus.  None for streaming datasets
        # (HDF5WindowStream) that don't expose materialized windows.
        self.motion_stats = None
        if hasattr(train_ds, "windows"):
            from globalegomocap_tpu.optimize.prior_bank import (
                windows_accel_stat)
            stat = windows_accel_stat(train_ds.windows)
            if math.isfinite(stat):    # empty/degenerate window sets
                self.motion_stats = {"accel_mean": stat}

    @property
    def variables(self):
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats}

    def _device_batch(self, batch: np.ndarray) -> jnp.ndarray:
        return jax.device_put(jnp.asarray(batch), self._batch_sh)

    def train(self, log_fn=print, checkpoint_dir: str | None = None,
              checkpoint_format: str = "msgpack"):
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed + 1)
        np_rng = np.random.default_rng(cfg.seed + 2)
        count = 0
        # metric accumulation stays ON DEVICE: a per-step float() readback
        # would force a host sync every step (through the TPU tunnel that
        # is ~the entire step time at small batches); values are read back
        # only at log_step boundaries / epoch ends.
        zero = jnp.zeros((), jnp.float32)
        running = {"loss": zero, "recon_loss": zero}
        for epoch in range(cfg.epochs):
            t0 = time.perf_counter()
            epoch_steps = 0
            if cfg.epoch_scan:
                # consume the batch stream in blocks of <= scan_block
                # steps (bounded host memory for streaming corpora);
                # full blocks run as one scan launch, trailing steps
                # (fewer than a block) run eagerly so only one scan
                # shape ever compiles
                block = max(1, cfg.scan_block)
                pending: list = []

                def flush_scan():
                    nonlocal epoch_steps, count
                    arr = jax.device_put(
                        jnp.asarray(np.stack(pending)), self._scan_sh)
                    self.state, msums = self._epoch_step(self.state, arr,
                                                         rng)
                    running["loss"] = running["loss"] + msums["loss"]
                    running["recon_loss"] = (running["recon_loss"]
                                             + msums["recon_loss"])
                    epoch_steps += len(pending)
                    count += len(pending)
                    pending.clear()

                for batch in self.train_ds.epoch_batches(np_rng,
                                                         cfg.batch_size):
                    pending.append(batch)
                    if len(pending) == block:
                        flush_scan()
                if len(pending) >= 2:
                    # the trailing block scans too — its length repeats
                    # every epoch (fixed dataset, drop_last), so this
                    # adds at most one extra compiled shape
                    flush_scan()
                for batch in pending:  # a single leftover step: eager
                    self.state, metrics = self._train_step(
                        self.state, self._device_batch(batch), rng)
                    running["loss"] = running["loss"] + metrics["loss"]
                    running["recon_loss"] = (running["recon_loss"]
                                             + metrics["recon_loss"])
                    epoch_steps += 1
                    count += 1
                if cfg.log_step and epoch_steps \
                        and count % cfg.log_step < epoch_steps:
                    vals = {k: float(v) for k, v in running.items()}
                    log_fn(f"step {count}: running loss "
                           f"{vals['loss']:.5f} recon "
                           f"{vals['recon_loss']:.5f}")
                    self.history.append({"step": count, **vals})
                    running = {"loss": zero, "recon_loss": zero}
            else:
                for batch in self.train_ds.epoch_batches(np_rng,
                                                         cfg.batch_size):
                    epoch_steps += 1
                    self.state, metrics = self._train_step(
                        self.state, self._device_batch(batch), rng)
                    running["loss"] = running["loss"] + metrics["loss"]
                    running["recon_loss"] = (running["recon_loss"]
                                             + metrics["recon_loss"])
                    count += 1
                    if cfg.log_step and count % cfg.log_step == 0:
                        vals = {k: float(v) for k, v in running.items()}
                        log_fn(f"step {count}: running loss "
                               f"{vals['loss']:.5f} recon "
                               f"{vals['recon_loss']:.5f}")
                        self.history.append({"step": count, **vals})
                        running = {"loss": zero, "recon_loss": zero}
            if epoch_steps == 0:
                log_fn(f"WARNING: epoch {epoch} ran 0 steps — batch_size "
                       f"({cfg.batch_size}) exceeds the dataset "
                       f"({len(self.train_ds)} windows) with drop_last")
            dt = time.perf_counter() - t0
            if max(1, cfg.eval_every) == 1 \
                    or (epoch + 1) % max(1, cfg.eval_every) == 0 \
                    or epoch == cfg.epochs - 1:
                eval_mpjpe = self.evaluate()
                log_fn(f"epoch {epoch}: eval reconstruction MPJPE "
                       f"{eval_mpjpe:.5f}  ({dt:.1f}s)")
                self.history.append({"epoch": epoch,
                                     "eval_mpjpe": eval_mpjpe})
                if checkpoint_dir:
                    self.save_checkpoint(checkpoint_dir, epoch, eval_mpjpe,
                                         fmt=checkpoint_format)
        return self.state

    def evaluate(self) -> float:
        total, count = 0.0, 0.0
        np_rng = np.random.default_rng(0)
        for batch in self.test_ds.epoch_batches(np_rng, self.cfg.batch_size,
                                                drop_last=False,
                                                shuffle=False):
            # pad so the sharded axis divides the device count; the mask
            # zeroes the padded rows out of the statistics
            n = batch.shape[0]
            d = self.mesh.size
            pad = (-n) % d
            mask = np.ones(n + pad, dtype=np.float32)
            if pad:
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], pad, axis=0)])
                mask[n:] = 0.0
            s, c = self._eval_step(self.state, self._device_batch(batch),
                                   self._device_batch(mask))
            total += float(s)
            count += float(c)
        return total / count if count else float("nan")

    def save_checkpoint(self, directory: str, epoch: int,
                        eval_result: float, fmt: str = "msgpack"):
        """Epoch checkpoint with the reference's payload shape
        ({'epoch','args','state_dict'-equivalent,'eval_result','optimizer'},
        networks/train.py:102-108).  fmt='msgpack' writes one flax msgpack
        file; fmt='orbax' writes an async-capable Orbax directory (the
        TPU-production format)."""
        os.makedirs(directory, exist_ok=True)
        state_host = jax.device_get(self.state)
        payload = {
            "params": state_host.params,
            "batch_stats": state_host.batch_stats,
            "opt_state": state_host.opt_state,
            "step": state_host.step,
        }
        if fmt == "orbax":
            import orbax.checkpoint as ocp
            path = os.path.join(os.path.abspath(directory), f"{epoch}.orbax")
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path, payload)
            ckptr.wait_until_finished()
        else:
            from flax import serialization
            blob = serialization.to_bytes(payload)
            path = os.path.join(directory, f"{epoch}.msgpack")
            with open(path, "wb") as f:
                f.write(blob)
        meta = {"epoch": epoch + 1, "eval_result": eval_result,
                "args": {k: getattr(self.cfg, k)
                         for k in self.cfg.__dataclass_fields__
                         if isinstance(getattr(self.cfg, k),
                                       (int, float, str, bool))}}
        if self.motion_stats:
            meta["motion_stats"] = self.motion_stats
        with open(os.path.join(directory, f"{epoch}.json"), "w") as f:
            json.dump(meta, f)
        return path

    def load_checkpoint(self, path: str):
        """Resume training state from an epoch checkpoint (msgpack file or
        Orbax directory) — the resume path the reference lacks
        (SURVEY.md §5 checkpoint/resume)."""
        state_host = jax.device_get(self.state)
        target = {"params": state_host.params,
                  "batch_stats": state_host.batch_stats,
                  "opt_state": state_host.opt_state,
                  "step": state_host.step}
        if os.path.isdir(path):
            import orbax.checkpoint as ocp
            ckptr = ocp.StandardCheckpointer()
            restored = ckptr.restore(os.path.abspath(path), target=target)
        else:
            from flax import serialization
            with open(path, "rb") as f:
                blob = f.read()
            restored = serialization.from_bytes(target, blob)
        self.state = jax.device_put(
            TrainState(step=jnp.asarray(restored["step"]),
                       params=restored["params"],
                       batch_stats=restored["batch_stats"],
                       opt_state=restored["opt_state"]),
            self._repl)
        return self.state
