"""Metric logging: stdout + JSONL (SURVEY.md 5, metrics/observability)."""

from __future__ import annotations

import json
import os
import time


class MetricLogger:
    """JSONL + stdout, with optional TensorBoard scalars (tensorflow is an
    optional dependency; enabled via ``tensorboard=True`` when present)."""

    def __init__(self, log_dir: str | None = None, name: str = "train",
                 tensorboard: bool = False):
        self._fh = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, f"{name}.jsonl"), "a")
            if tensorboard:
                try:
                    import tensorflow as tf

                    self._tb = tf.summary.create_file_writer(
                        os.path.join(log_dir, "tb"))
                except ImportError:
                    pass
        self._t0 = time.time()

    def log(self, step: int, metrics: dict, echo: bool = True) -> None:
        row = {"step": step, "time": round(time.time() - self._t0, 3)}
        row.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        if self._fh:
            self._fh.write(json.dumps(row) + "\n")
            self._fh.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in row.items():
                    if isinstance(v, float) and k not in ("time",):
                        tf.summary.scalar(k, v, step=step)
        if echo:
            parts = " ".join(f"{k}={v:.4g}" if isinstance(v, float)
                             else f"{k}={v}" for k, v in row.items()
                             if k != "time")
            print(f"[{row['time']:9.1f}s] {parts}", flush=True)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
        if self._tb is not None:
            self._tb.close()
