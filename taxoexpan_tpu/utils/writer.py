"""TensorBoard writer wrapper with lazy import + graceful no-op fallback.

Mirrors logger/visualization.py:5-59: if no TensorBoard backend is installed
the writer silently no-ops (reference warns once, :10-16); `set_step` tags
train/valid mode and emits a wall-clock steps_per_sec scalar (:27-34) — the
reference's only built-in throughput counter.
"""
from __future__ import annotations

import logging
from . import Timer

logger = logging.getLogger(__name__)


class TensorboardWriter:
    def __init__(self, log_dir, enabled: bool = True):
        self.writer = None
        if enabled:
            try:  # torch ships a tensorboard writer; tensorboardX also works
                from torch.utils.tensorboard import SummaryWriter
                self.writer = SummaryWriter(str(log_dir))
            except Exception:
                try:
                    from tensorboardX import SummaryWriter
                    self.writer = SummaryWriter(str(log_dir))
                except Exception:
                    logger.warning(
                        "TensorBoard writer unavailable (install torch or "
                        "tensorboardX to enable); logging scalars to the "
                        "python logger only.")
        self.step = 0
        self.mode = ""
        self.timer = Timer()

    def set_step(self, step: int, mode: str = "train") -> None:
        self.mode = mode
        self.step = step
        if step == 0:
            self.timer.reset()
        else:
            duration = self.timer.check()
            if duration > 0:
                self.add_scalar("steps_per_sec", 1.0 / duration)

    def _tag(self, tag: str) -> str:
        return f"{tag}/{self.mode}" if self.mode else tag

    def add_scalar(self, tag: str, value) -> None:
        if self.writer is not None:
            self.writer.add_scalar(self._tag(tag), float(value), self.step)

    def add_text(self, tag: str, text: str) -> None:
        if self.writer is not None:
            self.writer.add_text(self._tag(tag), text, self.step)

    def add_histogram(self, tag: str, values, bins="auto") -> None:
        if self.writer is not None:
            import numpy as np
            self.writer.add_histogram(self._tag(tag), np.asarray(values),
                                      self.step)

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
