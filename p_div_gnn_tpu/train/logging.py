"""Metrics/observability: JSONL always, TensorBoard when available.

The reference logs train/test NMSE, total loss and divergence terms per
epoch to TensorBoard plus run-parameter text blobs
(`/root/reference/scripts/gnn_train.py:120-133,255-283`). Here the JSONL
stream is the source of truth (machine-readable for the bench/analysis
tooling); TensorBoard event files are written too when the `tensorboard`
package is importable.
"""

from __future__ import annotations

from typing import Any

import json
import time
from pathlib import Path


class MetricsWriter:
    def __init__(self, log_dir: str | Path):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=str(self.log_dir))
        except Exception:
            self._tb = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        rec = {"tag": tag, "value": float(value), "step": int(step),
               "time": time.time()}
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_text(self, tag: str, text: str) -> None:
        rec = {"tag": tag, "text": text, "time": time.time()}
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_text(tag, text)

    def add_histogram(self, tag: str, values: Any, step: int = 0) -> None:
        import numpy as np

        v = np.asarray(values, dtype=float)
        rec = {
            "tag": tag,
            "histogram": {
                "min": float(v.min()) if v.size else 0.0,
                "max": float(v.max()) if v.size else 0.0,
                "mean": float(v.mean()) if v.size else 0.0,
                "count": int(v.size),
            },
            "step": int(step),
            "time": time.time(),
        }
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_histogram(tag, v, step)

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
