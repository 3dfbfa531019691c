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


def test_multi_stream_priority_scheduling():
    from globalegomocap_tpu.optimize.streaming import MultiStreamOptimizer

    cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=16, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=3,
                            history_size=3))
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    opt = SequenceOptimizer(model, v, v, cfg)

    low = [synthetic_chunk(26, seed=s) for s in (0, 1)]
    high = [synthetic_chunk(26, seed=s) for s in (2, 3)]

    ms = MultiStreamOptimizer(opt, max_in_flight=1)
    ms.open_stream("low", priority=0)
    ms.open_stream("high", priority=5)
    ms.submit("low", low[0])      # takes the only slot immediately
    ms.submit("low", low[1])      # queued
    ms.submit("high", high[0])    # queued, jumps ahead of low[1]
    ms.submit("high", high[1])
    results = ms.drain()

    # priority scheduling: the queued high-priority chunks dispatch before
    # the queued low-priority one
    assert ms.dispatch_order == ["low", "high", "high", "low"]
    assert len(results["low"]) == 2 and len(results["high"]) == 2

    # per-stream results are in submission order and exact
    for stream, chunks in (("low", low), ("high", high)):
        for chunk, res in zip(chunks, results[stream]):
            direct = opt.optimize_chunk(chunk)
            np.testing.assert_array_equal(np.asarray(res.optimized),
                                          np.asarray(direct.optimized))

    # duplicate open / unknown stream are rejected
    import pytest
    with pytest.raises(ValueError):
        ms.open_stream("low")
    with pytest.raises(KeyError):
        ms.submit("nope", low[0])

    # streams stay open after drain
    ms.submit("high", high[0])
    again = ms.drain()
    assert len(again["high"]) == 1 and len(again["low"]) == 0


def test_streaming_guard_policy_resolves_once():
    """guard='first' pays the crop-guard readback once per stream and
    reuses the decision; guard='every' re-resolves per chunk; results are
    identical for stationary map sources."""
    cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=16, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=2,
                            history_size=2),
        heatmap_crop=8)
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    opt = SequenceOptimizer(model, v, v, cfg)
    chunks = [synthetic_chunk(26, seed=s) for s in (61, 62)]

    calls = []
    orig = opt._effective_cfg
    opt._effective_cfg = lambda h: (calls.append(1), orig(h))[1]

    first = StreamingOptimizer(opt, guard="first").process_all(chunks)
    n_first = len(calls)
    every = StreamingOptimizer(opt, guard="every").process_all(chunks)
    n_every = len(calls) - n_first
    off = StreamingOptimizer(opt, guard="off").process_all(chunks)
    assert n_first == 1 and n_every == 2 and len(calls) == n_first + n_every
    for a, b in zip(first, every):
        np.testing.assert_array_equal(np.asarray(a.optimized),
                                      np.asarray(b.optimized))
    for a, b in zip(first, off):
        np.testing.assert_array_equal(np.asarray(a.optimized),
                                      np.asarray(b.optimized))


def test_streaming_submit_batch():
    """submit_batch pipelines whole staged batches (the peak-throughput
    serving shape); results equal direct batched solves, the meter counts
    chunks, and batch/per-chunk submissions interleave safely."""
    cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=16, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=2,
                            history_size=2))
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    opt = SequenceOptimizer(model, v, v, cfg)
    batch_a = [synthetic_chunk(26, seed=s) for s in (81, 82)]
    batch_b = [synthetic_chunk(26, seed=s) for s in (83, 84, 85)]

    service = StreamingOptimizer(opt, max_in_flight=2)
    service.submit_batch(batch_a)                   # list -> staged here
    service.submit_batch(opt.stage(batch_b))        # pre-staged
    out = service.drain()
    assert len(out) == 2
    assert out[0].optimized.shape == (2, 26, 15, 3)
    assert out[1].optimized.shape == (3, 26, 15, 3)
    assert service.meter.total_units == 5

    direct = opt.optimize_chunks_batched(opt.stage(batch_a), mode="flat")
    np.testing.assert_array_equal(np.asarray(out[0].optimized),
                                  np.asarray(direct.optimized))


def test_streaming_backpressure_bounds_in_flight_and_memory():
    """A producer submitting faster than the solve rate must be throttled
    by the bounded in-flight window: the deque never exceeds
    max_in_flight, device-buffer growth is bounded by the depth (not the
    submission count), and every result still comes back in order
    (VERDICT r2 #7)."""
    cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=16, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=2,
                            history_size=2))
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    opt = SequenceOptimizer(model, v, v, cfg)

    depth = 2
    n_subs = 7
    service = StreamingOptimizer(opt, max_in_flight=depth)
    observed = []
    live_bytes = []
    for s in range(n_subs):
        service.submit(synthetic_chunk(18, seed=200 + s))
        observed.append(len(service._in_flight))
        live_bytes.append(sum(a.nbytes for a in jax.live_arrays()))
    assert max(observed) <= depth
    # steady-state live BYTES must not grow by the input size per
    # submission: a chunk's heatmaps are ~4.4 MB (18x64x64x15 f32) and
    # must be retired as the pipeline advances; only the tiny completed
    # pose results (~16 KB each) may accumulate.
    per_sub_growth = (live_bytes[-1] - live_bytes[depth]) / (
        n_subs - depth - 1)
    chunk_input_bytes = 18 * 64 * 64 * 15 * 4
    assert per_sub_growth < 0.2 * chunk_input_bytes, \
        f"inputs not retired: {per_sub_growth / 1e6:.2f} MB/submission " \
        f"retained ({[round(b / 1e6, 1) for b in live_bytes]} MB)"
    out = service.drain()
    assert len(out) == n_subs
    assert all(np.isfinite(np.asarray(r.optimized)).all() for r in out)


def test_stage_prefetcher_matches_inline_staging():
    """StagePrefetcher (worker-thread staging of batch t+1 during the
    solve of batch t) must yield batches in source order whose solve
    results are identical to inline staging, resolve the crop guard once
    ('first' policy, off the submit critical path), pass pre-staged
    batches through untouched, and surface worker exceptions on the
    consumer thread."""
    from globalegomocap_tpu.optimize.streaming import StagePrefetcher

    cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=16, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=2,
                            history_size=2))
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    opt = SequenceOptimizer(model, v, v, cfg)
    batches = [[synthetic_chunk(26, seed=10 * b + i) for i in range(2)]
               for b in range(3)]

    service = StreamingOptimizer(opt, max_in_flight=2)
    for staged in StagePrefetcher(opt, batches, depth=2):
        service.submit_batch(staged)
    out = service.drain()
    assert len(out) == 3
    for batch, res in zip(batches, out):
        direct = opt.optimize_chunks_batched(opt.stage(batch), mode="flat")
        np.testing.assert_array_equal(np.asarray(res.optimized),
                                      np.asarray(direct.optimized))

    # pre-staged batches pass through as-is (same object)
    pre = opt.stage(batches[0])
    got = list(StagePrefetcher(opt, [pre], depth=1))
    assert got[0] is pre

    # a worker exception re-raises at the point of consumption
    def bad_source():
        yield batches[0]
        raise RuntimeError("producer failed")

    it = iter(StagePrefetcher(opt, bad_source(), depth=1))
    next(it)
    try:
        next(it)
        raise AssertionError("expected the producer error to re-raise")
    except RuntimeError as e:
        assert "producer failed" in str(e)
