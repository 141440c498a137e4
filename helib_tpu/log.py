"""Logger + soft-warning channel (reference src/log.cpp, log.h:25-60)."""

from __future__ import annotations

import sys

_log_file = sys.stderr
_warnings_seen: set = set()


def set_log_file(f):
    global _log_file
    _log_file = f


def helog(msg: str):
    print(f"[helib_tpu] {msg}", file=_log_file)


def warning(msg: str, once: bool = False):
    """Soft failure path (reference Warning())."""
    if once and msg in _warnings_seen:
        return
    _warnings_seen.add(msg)
    helog(f"WARNING: {msg}")
