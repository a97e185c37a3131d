"""Observability: stdout tee + structured JSONL metrics + profiler hooks.

The reference's only observability is a stdout tee to ./logs/<id>_log.txt
(main.py:17-27) scraped later by regex (tmp/readlines.py). Here the same
human-readable prints are kept by the CLIs, and MetricsLogger adds
machine-readable JSONL records (one object per event) so downstream analysis
needs no log scraping. trace() wraps jax.profiler for TPU timeline captures.
"""
from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from typing import Optional


class Tee:
    """stdout tee (reference main.py:17-27)."""

    def __init__(self, path: str):
        self.terminal = sys.stdout
        self.log = open(path, 'w')

    def write(self, msg):
        self.terminal.write(msg)
        self.log.write(msg)

    def flush(self):
        self.terminal.flush()
        self.log.flush()

    def isatty(self):
        return self.terminal.isatty()

    def fileno(self):
        return self.terminal.fileno()


class MetricsLogger:
    """Append-only JSONL metrics."""

    def __init__(self, path: Optional[str]):
        self.path = path
        self._f = open(path, 'a') if path else None

    def log(self, event: str, **fields):
        if self._f is None:
            return
        rec = {'ts': time.time(), 'event': event, **fields}
        self._f.write(json.dumps(rec) + '\n')
        self._f.flush()

    def close(self):
        if self._f:
            self._f.close()


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/jax-trace'):
    """jax.profiler trace context; view with tensorboard or xprof."""
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
