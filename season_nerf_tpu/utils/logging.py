"""Metric logging: TensorBoard (same tag names as the reference) + JSONL.

The reference logs per-loss-component scalars under ``Training/*`` /
``Testing/*`` plus validation images (mg_run_NeRF.py:288-338,148-227).  The
TensorBoard dependency is optional — when unavailable we still persist
scalars to a JSONL sidecar so headless runs remain observable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np


class MetricWriter:
    """Writes scalars to TensorBoard + JSONL.  An empty/None logdir makes a
    no-op writer (benchmarks and throwaway trainers)."""

    def __init__(self, logdir: str, use_tensorboard: bool = True):
        self.logdir = logdir
        self._jsonl = None
        self._tb = None
        if not logdir:
            return
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value, step: int):
        if self._jsonl is None:
            return
        v = float(value)
        if self._tb is not None:
            self._tb.add_scalar(tag, v, step)
        self._jsonl.write(json.dumps(
            {"t": time.time(), "tag": tag, "value": v, "step": int(step)}) + "\n")

    def scalars(self, prefix: str, values: Dict[str, float], step: int):
        for k, v in values.items():
            self.scalar(f"{prefix}/{k}", v, step)

    def image(self, tag: str, img: np.ndarray, step: int):
        """img: [H, W, C] float in [0,1] or [H, W]."""
        if self._tb is not None:
            arr = np.asarray(img)
            if arr.ndim == 2:
                arr = arr[..., None]
            self._tb.add_image(tag, np.clip(arr, 0, 1),
                               step, dataformats="HWC")

    def flush(self):
        if self._jsonl is not None:
            self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
