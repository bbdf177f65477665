"""Singleton, rank-prefixed, leveled logger (reference: lumo/utils/logger.py:57-284).

Process-0 gating comes from ``jax.process_index`` instead of env-var rank
sniffing; inline ``\\r`` updates are kept for the train-loop progress line.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

_LEVELS = {"debug": 10, "info": 20, "warn": 30, "error": 40}


def _rank() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return int(os.environ.get("JAX_PROCESS_INDEX", 0))


class Logger:
    _instance: Optional["Logger"] = None

    def __new__(cls, *a, **k):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
            cls._instance._initialized = False
        return cls._instance

    def __init__(self, level: str = "info"):
        if self._initialized:
            return
        self._initialized = True
        self.level = _LEVELS.get(level, 20)
        self._files = []
        self._inline_active = False
        self.main_only = True

    def add_log_dir(self, path: str) -> str:
        os.makedirs(path, exist_ok=True)
        fname = os.path.join(path, f"log.{time.strftime('%y%m%d-%H%M%S')}.{_rank()}.txt")
        self._files.append(open(fname, "a"))
        return fname

    def _emit(self, level: int, *args, inline: bool = False):
        if level < self.level:
            return
        if self.main_only and _rank() != 0:
            return
        msg = " ".join(str(a) for a in args)
        prefix = f"[{time.strftime('%H:%M:%S')}]"
        line = f"{prefix} {msg}"
        if inline:
            sys.stderr.write("\r" + line[:200].ljust(80))
            sys.stderr.flush()
            self._inline_active = True
        else:
            if self._inline_active:
                sys.stderr.write("\n")
                self._inline_active = False
            sys.stderr.write(line + "\n")
            sys.stderr.flush()
        for f in self._files:
            f.write(line + "\n")
            f.flush()

    def debug(self, *args):
        self._emit(10, *args)

    def info(self, *args):
        self._emit(20, *args)

    def warn(self, *args):
        self._emit(30, *args)

    def error(self, *args):
        self._emit(40, *args)

    def raw(self, *args):
        self._emit(100, *args)

    def inline(self, *args):
        self._emit(20, *args, inline=True)

    def newline(self):
        if self._inline_active:
            sys.stderr.write("\n")
            self._inline_active = False
