"""Structured metric logging.

The reference's only observability is print() of the per-iteration loss
(SURVEY.md §5).  Here: stdout lines plus machine-readable JSONL so runs
can be compared and plotted."""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, name: str = "train"):
        self._fh = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, f"{name}.jsonl"), "a")
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float], prefix: str = ""):
        payload = {
            "step": step,
            "time": round(time.time() - self._t0, 3),
            **{k: float(v) for k, v in metrics.items()},
        }
        line = " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in payload.items()
        )
        print(f"[{prefix or 'train'}] {line}", flush=True)
        if self._fh:
            self._fh.write(json.dumps({"prefix": prefix, **payload}) + "\n")
            self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()
