"""Joint local+global prior training.

The working rebuild of the reference's joint trainer intent
(networks/train_local_global.py, whose model imports are bit-rotted): one
data-parallel loop trains both priors with the geometric consistency tie,
then `split_branches` hands the two branch variable dicts straight to the
two-stage optimizer.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax

from globalegomocap_tpu.config import TrainConfig
from globalegomocap_tpu.models.joint_vae import (
    JointLocalGlobalVAE, joint_loss, split_branches)
from globalegomocap_tpu.parallel.mesh import (
    make_mesh, replicate, shard_batch)
from globalegomocap_tpu.train.train_vae import TrainState, make_optimizer


def make_joint_train_step(model: JointLocalGlobalVAE, tx,
                          kld_weight: float,
                          consistency_weight: float = 1.0):
    def step(state: TrainState, poses: jnp.ndarray, cameras: jnp.ndarray,
             rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                poses, cameras, True, rng, mutable=["batch_stats"])
            total, metrics = joint_loss(out, poses, cameras, kld_weight,
                                        consistency_weight)
            return total, (metrics, updates["batch_stats"])

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **metrics}
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=new_stats,
                             opt_state=opt_state), metrics

    return step


class JointTrainer:
    """Data-parallel trainer over (windows, cameras) pairs."""

    def __init__(self, cfg: TrainConfig, poses: np.ndarray,
                 cameras: np.ndarray,
                 model: JointLocalGlobalVAE | None = None,
                 consistency_weight: float = 1.0):
        """poses: (W, T, 45) local windows; cameras: (W, T, 4, 4)."""
        assert len(poses) == len(cameras)
        self.cfg = cfg
        self.poses = poses
        self.cameras = cameras
        self.model = model or JointLocalGlobalVAE(
            latent_dim=cfg.latent_dim, seq_len=cfg.seq_length)
        self.tx = make_optimizer(cfg)

        self.mesh = make_mesh(cfg.num_devices or None)
        self._repl = replicate(self.mesh)
        self._batch_sh = shard_batch(self.mesh)

        x0 = jnp.zeros((2, cfg.seq_length, 45))
        c0 = jnp.broadcast_to(jnp.eye(4), (2, cfg.seq_length, 4, 4))
        variables = self.model.init(jax.random.PRNGKey(cfg.seed), x0, c0,
                                    False)
        state = TrainState(step=jnp.asarray(0),
                           params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=self.tx.init(variables["params"]))
        self.state = jax.device_put(state, self._repl)

        kld_weight = cfg.kl_weight * cfg.batch_size / max(1, len(poses))
        self._step = jax.jit(
            make_joint_train_step(self.model, self.tx, kld_weight,
                                  consistency_weight),
            in_shardings=(self._repl, self._batch_sh, self._batch_sh,
                          None),
            out_shardings=(self._repl, self._repl),
            donate_argnums=(0,))

    def train(self, log_fn=print):
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed + 1)
        np_rng = np.random.default_rng(cfg.seed + 2)
        n = len(self.poses)
        history = []
        for epoch in range(cfg.epochs):
            order = np_rng.permutation(n)
            end = n - n % cfg.batch_size
            for i in range(0, end, cfg.batch_size):
                sel = order[i:i + cfg.batch_size]
                self.state, metrics = self._step(
                    self.state,
                    jax.device_put(jnp.asarray(self.poses[sel]),
                                   self._batch_sh),
                    jax.device_put(jnp.asarray(self.cameras[sel]),
                                   self._batch_sh),
                    rng)
            history.append({k: float(v) for k, v in metrics.items()})
            log_fn(f"epoch {epoch}: " + " ".join(
                f"{k}={float(v):.5f}" for k, v in metrics.items()))
        return history

    def branch_variables(self):
        """(local_variables, global_variables) for the optimizer."""
        return split_branches(self.model, {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats})
