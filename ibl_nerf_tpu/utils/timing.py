"""Phase timing utilities.

Parity: /root/reference/src/utils/timing_utils.py:22-60 — the
`time_measure` context manager and a `timeout` decorator (SIGALRM).
Plus a TPU-native `profile_trace` wrapper around jax.profiler.
"""

from __future__ import annotations

import contextlib
import functools
import signal
import time

from ibl_nerf_tpu.utils.logging import load_logger


@contextlib.contextmanager
def time_measure(name: str, logger_name: str = "timing"):
    logger = load_logger(logger_name)
    t0 = time.time()
    try:
        yield
    finally:
        logger.info("%s: %.3fs", name, time.time() - t0)


def timeout(seconds: int):
    """SIGALRM-based timeout decorator (parity timing_utils.py:43-60)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            def handler(signum, frame):
                raise TimeoutError(f"{fn.__name__} timed out after {seconds}s")

            old = signal.signal(signal.SIGALRM, handler)
            signal.alarm(seconds)
            try:
                return fn(*args, **kwargs)
            finally:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old)

        return wrapper

    return deco


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context — the TPU-native replacement for the
    reference's wall-clock-only accounting."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
