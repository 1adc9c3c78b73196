"""Logging / metric smoothing — the reference's utils.py + xllmx MetricLogger.

  * set_logger: stdout + optional file handler (utils.py:56-65)
  * SmoothedValue / MetricLogger: windowed medians/means with periodic
    printing (xllmx/util/misc.py:21-152). Cross-host synchronization is a
    jnp mean under pjit when training (parallel/training.py) — these host
    trackers only smooth what each host already sees globally.
"""

from __future__ import annotations

import logging
import sys
import time
from collections import defaultdict, deque
from typing import Optional


def set_logger(log_file: Optional[str] = None, level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger("sjd_tpu")
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class SmoothedValue:
    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1) -> None:
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        vals = sorted(self.deque)
        return vals[len(vals) // 2] if vals else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    def __str__(self) -> str:
        return self.fmt.format(median=self.median, global_avg=self.global_avg)


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: dict = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __str__(self) -> str:
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def log_every(self, iterable, print_freq: int, logger=None, header: str = ""):
        log = (logger or logging.getLogger("sjd_tpu")).info
        start = time.time()
        for i, obj in enumerate(iterable):
            yield obj
            if i % print_freq == 0:
                elapsed = time.time() - start
                log(f"{header} [{i}] {self}  ({elapsed:.1f}s)")
