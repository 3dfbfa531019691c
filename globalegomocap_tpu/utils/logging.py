"""Training/eval metric logging: JSONL always, TensorBoard when available.

The reference logs three scalar streams to TensorBoard
(reference: networks/train.py:63, 88-95, 99); here the canonical record is
an append-only JSONL file (machine-readable, dependency-free) and the same
scalars mirror to TensorBoard via torch's SummaryWriter when torch is
importable.
"""

from __future__ import annotations

import json
import os
import time


class MetricLogger:
    def __init__(self, log_dir: str, tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(log_dir,
                                                      "tensorboard"))
            except Exception:
                self._tb = None

    def scalar(self, name: str, value: float, step: int):
        self._f.write(json.dumps({"t": time.time(), "name": name,
                                  "value": float(value),
                                  "step": int(step)}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(name, float(value), int(step))

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
