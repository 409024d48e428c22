"""Console logging + scalar metric writing.

Parity: the reference's named console loggers
(/root/reference/src/utils/logging_utils.py:28-41) and tensorboard
scalar stream (train.py:444-477). Scalars go to tensorboard (via
tensorboardX when available) AND an append-only metrics.jsonl so
offline tools need no TF reader.
"""

from __future__ import annotations

import json
import logging
import os

_LOGGERS: dict[str, logging.Logger] = {}


def load_logger(name: str) -> logging.Logger:
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "[%(asctime)s|%(name)s] %(message)s", "%H:%M:%S"))
        logger.addHandler(h)
        logger.propagate = False
    _LOGGERS[name] = logger
    return logger


class ScalarWriter:
    """Tensorboard + jsonl scalar writer."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(logdir)
        except Exception:
            pass

    def write(self, step: int, scalars: dict):
        rec = {"step": step, **scalars}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                try:
                    self._tb.add_scalar(k, v, step)
                except Exception:
                    pass

    def write_images(self, tag: str, images, step: int):
        if self._tb is not None:
            try:
                self._tb.add_images(tag, images, step, dataformats="NHWC")
            except Exception:
                pass

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
