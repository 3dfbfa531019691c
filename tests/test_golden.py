"""Golden-value regression tests: fixed-seed pipeline outputs must stay
bit-stable (within float tolerance) across refactors.

On first run the goldens are generated and stored under tests/golden/
(committed to the repo); later runs compare.  Regenerate intentionally by
deleting the .npz files.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from globalegomocap_tpu.config import (
    OptimizeConfig, SolverConfig, PriorConfig)
from globalegomocap_tpu.data.synthetic import synthetic_chunk
from globalegomocap_tpu.optimize.driver import SequenceOptimizer, build_model

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "golden")


def _cfg(method):
    return OptimizeConfig(
        prior=PriorConfig(latent_dim=32, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method=method, max_iter=6, history_size=6,
                            max_ls_evals=6))


def _run(method):
    cfg = _cfg(method)
    model = build_model(cfg)
    x = jnp.zeros((1, 10, 45))
    v1 = model.init(jax.random.PRNGKey(10), x, False)
    v2 = model.init(jax.random.PRNGKey(11), x, False)
    opt = SequenceOptimizer(model, v1, v2, cfg)
    chunk = synthetic_chunk(n_frames=26, seed=99)
    _, est, mid_local, optimized, gt = opt.run(chunk, with_metrics=False)
    return est, mid_local, optimized, gt


def _check_or_create(name, arrays):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    keys = ["est", "mid_local", "optimized", "gt"]
    if not os.path.exists(path):
        np.savez_compressed(path, **dict(zip(keys, arrays)))
        return
    ref = np.load(path)
    for k, a in zip(keys, arrays):
        np.testing.assert_allclose(a, ref[k], rtol=2e-3, atol=2e-4,
                                   err_msg=f"golden drift in {name}/{k}")


def test_golden_lbfgs():
    _check_or_create("pipeline_lbfgs", _run("lbfgs"))


def test_golden_lbfgs_fixed():
    _check_or_create("pipeline_lbfgs_fixed", _run("lbfgs_fixed"))


def test_golden_metrics():
    """The 17-metric suite on fixed inputs must stay numerically stable."""
    from globalegomocap_tpu.evaluation.metrics import (
        calculate_errors, METRIC_KEYS)
    rng = np.random.default_rng(7)
    est, mid, opt, gt = (jnp.asarray(
        rng.normal(size=(20, 15, 3)).astype(np.float32)) for _ in range(4))
    out = calculate_errors(est, mid, opt, gt)
    vec = np.concatenate([np.atleast_1d(np.asarray(out[k], dtype=np.float64))
                          for k in METRIC_KEYS])
    path = os.path.join(GOLDEN_DIR, "metrics.npz")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    if not os.path.exists(path):
        np.savez_compressed(path, vec=vec)
        return
    ref = np.load(path)["vec"]
    np.testing.assert_allclose(vec, ref, rtol=1e-4, atol=1e-6)
