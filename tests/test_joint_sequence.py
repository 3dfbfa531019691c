"""Joint whole-sequence optimization (cross-window coupling) tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from globalegomocap_tpu.config import (
    OptimizeConfig, SolverConfig, PriorConfig, EnergyConfig)
from globalegomocap_tpu.data.synthetic import synthetic_chunk
from globalegomocap_tpu.energy.terms import overlap_consistency_energy
from globalegomocap_tpu.optimize.driver import SequenceOptimizer, build_model


PRIOR = PriorConfig(latent_dim=16, seq_len=10, hidden_dims=(8, 8, 16, 16, 32))


def test_overlap_energy_zero_when_consistent():
    rng = np.random.default_rng(0)
    seq = rng.normal(size=(34, 15, 3)).astype(np.float32)
    from globalegomocap_tpu.optimize.window import slice_windows
    win = slice_windows(jnp.asarray(seq), 10, 8)
    # windows sliced from one sequence agree on overlaps by construction
    assert float(overlap_consistency_energy(win, 8)) < 1e-8
    # perturbing one window's head breaks it
    win2 = win.at[1, 0].add(0.5)
    assert float(overlap_consistency_energy(win2, 8)) > 0.1


def test_joint_solve_runs_and_reduces_overlap_disagreement():
    chunk = synthetic_chunk(34, seed=3, noise_std=0.05)

    def run(coupling):
        cfg = OptimizeConfig(
            prior=PRIOR,
            energy=EnergyConfig(overlap_consistency=coupling),
            solver=SolverConfig(method="lbfgs_fixed", max_iter=6,
                                history_size=6),
            final_smooth=False)
        model = build_model(cfg)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)),
                       False)
        opt = SequenceOptimizer(model, v, v, cfg)
        # measure the stage outputs' overlap disagreement via the window
        # decomposition of the optimized (pre-merge) result: reconstruct
        # windows from mid_local by re-slicing is lossy after merge, so
        # instead compare the merged outputs' smoothness proxy and check
        # finiteness + determinism here.
        errors, est, mid_local, opt_seq, gt = opt.run(chunk)
        return errors, opt_seq

    e0, o0 = run(0.0)
    # small coupling (quality tuning happens with trained priors on TPU —
    # scripts/coupling_experiment.py)
    e1, o1 = run(1e-5)
    assert np.isfinite(e1["optimized_global_mpjpe"])
    # coupling changes the solution (it's genuinely active)
    assert not np.allclose(o0, o1)
    # with an UNTRAINED prior both paths land on the decoder's random
    # manifold; the joint solve must stay in the same quality regime as
    # the per-window solve, not diverge
    assert e1["aligned_optimized_mpjpe"] < \
        e0["aligned_optimized_mpjpe"] * 1.5 + 1e-3


@pytest.mark.slow
def test_joint_solve_with_heatmap_crop():
    """The joint whole-sequence path combined with peak-cropped heatmaps
    (the origins branch of joint_loss) runs and preserves quality."""
    chunk = synthetic_chunk(34, seed=5, noise_std=0.05)
    solver = SolverConfig(method="lbfgs_fixed", max_iter=3, history_size=3)
    cfg0 = OptimizeConfig(
        prior=PRIOR, solver=solver,
        energy=EnergyConfig(overlap_consistency=1.0))
    cfg1 = OptimizeConfig(
        prior=PRIOR, solver=solver, heatmap_crop=16,
        energy=EnergyConfig(overlap_consistency=1.0))

    model = build_model(cfg0)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    r0 = SequenceOptimizer(model, v, v, cfg0).optimize_chunk(chunk)
    r1 = SequenceOptimizer(model, v, v, cfg1).optimize_chunk(chunk)
    assert np.isfinite(np.asarray(r1.optimized)).all()

    def quality(r):
        return float(np.linalg.norm(
            np.asarray(r.optimized) - np.asarray(r.gt), axis=-1).mean())
    assert quality(r1) <= quality(r0) * 1.05 + 1e-3
