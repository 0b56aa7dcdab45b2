"""Metrics logging & observability.

The reference logs train/valid scalars with tensorboardX, dumps
``loss_record.npy`` and appends ``results/**/test.txt`` metric lines
(``train.py:120,187,201,209``; ``test.py:102-106``). Here: a structured
JSONL + TensorBoard-compatible scalar writer with no external deps, plus
``jax.profiler`` trace hooks (the replacement for the reference's
``time.time()`` instrumentation, SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    """Append-only JSONL scalar logger + optional TensorBoard event writer."""

    def __init__(self, out_dir: str, session: str = "run", tensorboard: bool = True):
        self.dir = os.path.join(out_dir, session)
        os.makedirs(self.dir, exist_ok=True)
        self.jsonl = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self.tb = None
        if tensorboard:
            try:
                from flax.metrics import tensorboard as flax_tb

                self.tb = flax_tb.SummaryWriter(self.dir)
            except Exception:
                self.tb = None

    def log(self, step: int, scalars: Dict[str, float], prefix: str = ""):
        row = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            name = f"{prefix}{k}" if prefix else k
            row[name] = float(v)
            if self.tb is not None:
                self.tb.scalar(name, float(v), step)
        self.jsonl.write(json.dumps(row) + "\n")
        self.jsonl.flush()

    def log_text(self, line: str, filename: str = "test.txt"):
        """Append-only metric lines (reference ``test.py:102-106`` style)."""
        with open(os.path.join(self.dir, filename), "a") as f:
            f.write(line.rstrip() + "\n")

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.flush()


class ProfilerScope:
    """``jax.profiler`` trace context — per-kernel timing on real TPU runs
    (replaces the reference's wall-clock prints, ``model_cl.py:244-246``)."""

    def __init__(self, log_dir: Optional[str]):
        self.log_dir = log_dir

    def __enter__(self):
        if self.log_dir:
            import jax

            jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        if self.log_dir:
            import jax

            jax.profiler.stop_trace()
        return False
