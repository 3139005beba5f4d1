"""Compile-on-first-use loader for the in-repo C++ libraries.

Shared by render/rasterizer.py and data/exr.py (previously two near-
identical blocks). Concurrency-safe: the dataset loader maps decodes over
a 16-thread pool and a multi-host job runs several processes on one
machine, so the compile is serialized by an fcntl lock and the .so is
written to a temp path then atomically renamed — a reader can never dlopen
a partially-written library.
"""

from __future__ import annotations

import ctypes
import os
import subprocess


def load_native(src_path: str, so_path: str, extra_args: tuple[str, ...] = ()):
    """Compile ``src_path`` to ``so_path`` if missing/stale and dlopen it.

    Returns a ctypes.CDLL; raises on compile/load failure (callers decide
    whether to fall back)."""
    os.makedirs(os.path.dirname(so_path), exist_ok=True)
    lock_path = so_path + ".lock"
    with open(lock_path, "w") as lock:
        try:
            import fcntl

            fcntl.flock(lock, fcntl.LOCK_EX)
        except ImportError:  # non-POSIX: best effort
            pass
        stale = not os.path.exists(so_path) or os.path.getmtime(
            so_path
        ) < os.path.getmtime(src_path)
        if stale:
            tmp = f"{so_path}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src_path, "-o", tmp, *extra_args],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so_path)  # atomic: readers see old or new, never partial
    return ctypes.CDLL(so_path)
