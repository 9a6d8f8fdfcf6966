"""Shared compile-and-load helper for the in-tree C++ sources.

Both native components (utils/native/recordio.cpp, utils/native/tokenizer.cpp)
follow the same lifecycle: compile the source to a shared object next to it
on first use, rebuild when the source is newer, and load via ctypes.  That
logic lives here once so toolchain discovery, staleness rules, and error
reporting cannot drift between the two.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from shutil import which
from typing import Sequence

__all__ = ["toolchain_available", "build_native_lib"]

_locks = {}
_locks_guard = threading.Lock()


def toolchain_available() -> bool:
    return which("g++") is not None or which("c++") is not None


def build_native_lib(src: str, so: str,
                     extra_flags: Sequence[str] = ()) -> ctypes.CDLL:
    """Compile ``src`` -> ``so`` if the object is missing or stale, then
    load it.  Safe to call concurrently across threads (per-target lock)
    AND processes (fcntl file lock + compile-to-temp-then-rename, so a
    concurrent ``ctypes.CDLL`` can never see a half-written object)."""
    with _locks_guard:
        lock = _locks.setdefault(so, threading.Lock())
    with lock:
        if not os.path.exists(so) or (os.path.getmtime(so)
                                      < os.path.getmtime(src)):
            cxx = which("g++") or which("c++")
            if cxx is None:
                raise RuntimeError("no C++ compiler available")
            import fcntl
            with open(so + ".lock", "w") as lf:
                fcntl.flock(lf, fcntl.LOCK_EX)
                # another process may have built it while we waited
                if not os.path.exists(so) or (os.path.getmtime(so)
                                              < os.path.getmtime(src)):
                    tmp = f"{so}.{os.getpid()}.tmp"
                    try:
                        subprocess.run(
                            [cxx, "-O2", "-shared", "-fPIC", "-std=c++17",
                             *extra_flags, src, "-o", tmp],
                            check=True, capture_output=True)
                        os.replace(tmp, so)  # atomic publish
                    except subprocess.CalledProcessError as e:
                        raise RuntimeError(
                            f"native build of {os.path.basename(src)} "
                            f"failed:\n"
                            f"{e.stderr.decode(errors='replace')}") from e
                    finally:
                        if os.path.exists(tmp):
                            os.remove(tmp)
        return ctypes.CDLL(so)
