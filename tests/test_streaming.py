"""Streaming (serving) optimizer tests."""

import numpy as np
import jax
import jax.numpy as jnp

from globalegomocap_tpu.config import (
    OptimizeConfig, SolverConfig, PriorConfig)
from globalegomocap_tpu.data.synthetic import synthetic_chunk
from globalegomocap_tpu.optimize.driver import SequenceOptimizer, build_model
from globalegomocap_tpu.optimize.streaming import StreamingOptimizer


def test_streaming_matches_direct():
    cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=16, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=3,
                            history_size=3))
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    opt = SequenceOptimizer(model, v, v, cfg)

    chunks = [synthetic_chunk(26, seed=s) for s in range(4)]
    service = StreamingOptimizer(opt, max_in_flight=2)
    streamed = service.process_all(chunks)
    assert len(streamed) == 4
    assert service.meter.total_units == 4
    assert service.meter.rate > 0

    # results identical to direct per-chunk calls, in order
    for chunk, res in zip(chunks, streamed):
        direct = opt.optimize_chunk(chunk)
        np.testing.assert_array_equal(np.asarray(res.optimized),
                                      np.asarray(direct.optimized))

    # pipeline resets cleanly
    service.submit(chunks[0])
    again = service.drain()
    assert len(again) == 1
