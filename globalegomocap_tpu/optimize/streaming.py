"""Streaming sequence optimization for serving.

Production-oriented runtime the reference has no equivalent of: a
long-lived service that keeps the compiled two-stage program warm and
pipelines chunk processing — JAX's async dispatch overlaps chunk t+1's
host->device transfer with chunk t's on-device optimization, with a bounded
in-flight window so HBM stays bounded.

Usage:
    service = StreamingOptimizer(seq_optimizer, max_in_flight=2)
    for chunk in chunk_source:
        service.submit(chunk)
    results = service.drain()
"""

from __future__ import annotations

import collections
import time

import jax

from globalegomocap_tpu.data.test_data import TestChunk
from globalegomocap_tpu.optimize.driver import SequenceOptimizer
from globalegomocap_tpu.optimize.pipeline import ChunkResult
from globalegomocap_tpu.utils.profiling import ThroughputMeter


class StreamingOptimizer:
    """Pipelined chunk optimization with bounded in-flight depth.

    guard: crop-mass-guard policy per submitted chunk —
      'first' (default): resolve the guard on the first chunk, reuse the
        decision for the stream (ONE blocking readback total; a capture
        session's maps come from one network, so coverage is stationary);
      'every': re-resolve per chunk (a blocking readback per submit — a
        dispatch-pipeline bubble, only for non-stationary map sources);
      'off': never crop-guard (use the configured heatmap_crop as-is).
    """

    def __init__(self, optimizer: SequenceOptimizer,
                 max_in_flight: int = 2, guard: str = "first",
                 stage_on_host: bool = False):
        if guard not in ("first", "every", "off"):
            raise ValueError(f"unknown guard policy {guard!r}")
        self.optimizer = optimizer
        self.max_in_flight = max_in_flight
        self.guard = guard
        # stage_on_host: crop in numpy BEFORE the host->device transfer
        # (stage(on_host=True)) — for HOST-resident ingest, where shipping
        # full maps through the tunnel is the producer bottleneck
        # (host_ingest_ab.json: 252 vs 24 w/s sustained, 64x less
        # transfer, bit-identical staging).  Also removes the guard's
        # device readback entirely ('first' measures the first batch's
        # coverage on host).  Leave OFF for device-resident chunk pools:
        # np.asarray on device arrays would pull the full maps BACK
        # through the tunnel first.
        self.stage_on_host = stage_on_host
        self._guard_cfg = optimizer.cfg if guard == "off" else None
        self._batch_coverage: float | None = None
        self._in_flight: collections.deque = collections.deque()
        self._completed: list[ChunkResult] = []
        self.meter = ThroughputMeter(unit="chunks")
        self._t_first: float | None = None

    def _chunk_cfg(self, chunk: TestChunk):
        if self.guard == "every":
            return self.optimizer._effective_cfg(chunk.heatmaps)
        if self._guard_cfg is None:
            self._guard_cfg = self.optimizer._effective_cfg(chunk.heatmaps)
        return self._guard_cfg

    def submit(self, chunk: TestChunk) -> None:
        """Enqueue a chunk.  Returns as soon as the work is dispatched;
        blocks only when `max_in_flight` results are already pending (then
        waits for the oldest)."""
        if self._t_first is None:
            self._t_first = time.perf_counter()
        while len(self._in_flight) >= self.max_in_flight:
            self._finish_oldest()
        self._in_flight.append(
            self.optimizer.optimize_chunk(chunk, cfg=self._chunk_cfg(chunk)))

    def submit_batch(self, chunks_or_staged, mode: str = "flat") -> None:
        """Enqueue a whole equal-length chunk batch as ONE device launch
        (a StagedBatch or a chunk list, which is staged here).  This is
        the peak-throughput serving shape: back-to-back staged launches
        pipeline through JAX async dispatch, hiding the per-launch tunnel
        RTT (measured 7363 vs 5667 windows/s at 4-deep; bench.py).  The
        guard policy applies to staging: 'first' measures the crop-guard
        coverage on the first batch only — the measurement's blocking
        readback otherwise head-of-line-blocks on every solve already in
        the device queue (serving_bench.json).  The drained result for a
        batch submission is the batched ChunkResult (leading chunk
        axis)."""
        from globalegomocap_tpu.optimize.driver import StagedBatch
        if not isinstance(chunks_or_staged, StagedBatch):
            if self.guard == "off":
                cov = 1.0
            elif self.guard == "first" and self._batch_coverage is not None:
                cov = self._batch_coverage
            else:
                cov = None   # measure on device (blocks)
            chunks_or_staged = self.optimizer.stage(
                chunks_or_staged, coverage=cov,
                on_host=self.stage_on_host)
            if self._batch_coverage is None:
                self._batch_coverage = chunks_or_staged.crop_coverage
        if self._t_first is None:
            self._t_first = time.perf_counter()
        while len(self._in_flight) >= self.max_in_flight:
            self._finish_oldest()
        self._in_flight.append(self.optimizer.optimize_chunks_batched(
            chunks_or_staged, mode=mode))

    def _finish_oldest(self) -> None:
        result = self._in_flight.popleft()
        jax.block_until_ready(result.optimized)
        self._completed.append(result)
        # a batch submission carries a leading chunk axis -> count chunks
        self.meter.total_units += (1 if result.estimated.ndim == 3
                                   else result.estimated.shape[0])

    def drain(self) -> list[ChunkResult]:
        """Wait for all in-flight work; return every completed result in
        submission order and reset the pipeline."""
        while self._in_flight:
            self._finish_oldest()
        if self._t_first is not None:
            self.meter.total_seconds += time.perf_counter() - self._t_first
        out = self._completed
        self._completed = []
        self._t_first = None
        return out

    def process_all(self, chunks) -> list[ChunkResult]:
        """Convenience: submit everything, drain, return results."""
        for c in chunks:
            self.submit(c)
        return self.drain()


class StagePrefetcher:
    """Overlap staging of batch t+1 with the solve of batch t.

    serving_bench measured submit_block_ms_p50 = 28 ms at the production
    point: `submit_batch` stages on the CALLER thread, so every
    submission pays the staging pass (host crops / device crop-program
    dispatch + transfer) on the critical path even though the device is
    busy solving earlier batches.  This wraps a raw-batch source in a
    single worker thread that keeps up to `depth` staged batches ready;
    the consumer's submit then only dispatches the solve.

    The worker owns the crop-guard readback too ('first' policy: the
    coverage measurement's blocking readback happens off the critical
    path, once).  Iteration yields StagedBatch objects in source order;
    worker exceptions re-raise on the consumer thread at the point of
    consumption.  Bounded queue => bounded staged-batch HBM, mirroring
    StreamingOptimizer's bounded in-flight depth.

    Usage:
        for staged in StagePrefetcher(opt, batches, depth=2):
            service.submit_batch(staged)
    """

    _DONE = object()

    def __init__(self, optimizer: SequenceOptimizer, source,
                 depth: int = 2, on_host: bool = False,
                 guard: str = "first"):
        import queue
        import threading
        if guard not in ("first", "every", "off"):
            raise ValueError(f"unknown guard policy {guard!r}")
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self.optimizer = optimizer
        self.on_host = on_host
        self.guard = guard
        self._coverage: float | None = (1.0 if guard == "off" else None)
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err: BaseException | None = None
        self._thread = threading.Thread(
            target=self._run, args=(iter(source),), daemon=True)
        self._thread.start()

    def _run(self, it) -> None:
        try:
            for batch in it:
                from globalegomocap_tpu.optimize.driver import StagedBatch
                if isinstance(batch, StagedBatch):
                    staged = batch
                else:
                    staged = self.optimizer.stage(
                        batch, coverage=self._coverage,
                        on_host=self.on_host)
                    if self.guard == "first" and self._coverage is None:
                        self._coverage = staged.crop_coverage
                self._q.put(staged)
        except BaseException as e:          # surface on consumer thread
            self._err = e
        finally:
            self._q.put(self._DONE)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._DONE:
                if self._err is not None:
                    raise self._err
                return
            yield item


class MultiStreamOptimizer:
    """Serve MANY concurrent sequences over one compiled program.

    Each stream is a named sequence of chunks with a priority; pending
    chunks across all streams sit in one priority queue (higher priority
    first, FIFO within a priority), and the scheduler keeps at most
    `max_in_flight` device launches outstanding.  Per-stream result order
    is submission order.  There is no reference equivalent — the reference
    processes one sequence at a time end-to-end; this is the production
    serving runtime for multiple simultaneous capture sessions.
    """

    def __init__(self, optimizer: SequenceOptimizer,
                 max_in_flight: int = 2, guard: str = "first"):
        import heapq  # noqa: F401  (documented dependency)
        if guard not in ("first", "every", "off"):
            raise ValueError(f"unknown guard policy {guard!r}")
        self.optimizer = optimizer
        self.max_in_flight = max_in_flight
        self.guard = guard
        self._guard_cfg = optimizer.cfg if guard == "off" else None
        self._pending: list = []           # heap of (-prio, seq, name, chunk)
        self._seq = 0
        self._priorities: dict[str, int] = {}
        self._in_flight: collections.deque = collections.deque()
        self._completed: dict[str, list[ChunkResult]] = {}
        self.dispatch_order: list[str] = []   # stream name per dispatch
        self.meter = ThroughputMeter(unit="chunks")
        self._t_first: float | None = None

    def open_stream(self, name: str, priority: int = 0) -> None:
        if name in self._priorities:
            raise ValueError(f"stream {name!r} already open")
        self._priorities[name] = priority
        self._completed[name] = []

    def submit(self, name: str, chunk: TestChunk) -> None:
        """Enqueue a chunk on an open stream.  Never blocks: chunks beyond
        the in-flight capacity wait in the priority queue and dispatch as
        slots free up (highest priority first)."""
        import heapq
        if name not in self._priorities:
            raise KeyError(f"unknown stream {name!r}; open_stream first")
        if self._t_first is None:
            self._t_first = time.perf_counter()
        heapq.heappush(self._pending,
                       (-self._priorities[name], self._seq, name, chunk))
        self._seq += 1
        self._pump()

    def _pump(self) -> None:
        """Dispatch pending chunks into free in-flight slots, highest
        priority first (FIFO within a priority)."""
        import heapq
        while self._pending and len(self._in_flight) < self.max_in_flight:
            _, _, name, chunk = heapq.heappop(self._pending)
            self.dispatch_order.append(name)
            if self.guard == "every":
                cfg = self.optimizer._effective_cfg(chunk.heatmaps)
            else:
                if self._guard_cfg is None:
                    self._guard_cfg = self.optimizer._effective_cfg(
                        chunk.heatmaps)
                cfg = self._guard_cfg
            self._in_flight.append(
                (name, self.optimizer.optimize_chunk(chunk, cfg=cfg)))

    def _finish_oldest(self) -> None:
        name, result = self._in_flight.popleft()
        jax.block_until_ready(result.optimized)
        self._completed[name].append(result)
        self.meter.total_units += 1

    def drain(self) -> dict[str, list[ChunkResult]]:
        """Wait for everything; return {stream: results in submission
        order} and reset queues (streams stay open)."""
        while self._in_flight or self._pending:
            self._finish_oldest()
            self._pump()
        if self._t_first is not None:
            self.meter.total_seconds += time.perf_counter() - self._t_first
        out = self._completed
        self._completed = {k: [] for k in self._priorities}
        self._t_first = None
        return out
