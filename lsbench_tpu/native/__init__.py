"""Native (C++) runtime components, loaded via ctypes.

Compiled on first use with g++ into `_build/` next to the sources; every
native entry point has a pure-Python fallback, so the package works without
a toolchain (reader falls back to numpy parsing in matrix/io.py).
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading

_HERE = os.path.dirname(__file__)
_BUILD_DIR = os.path.join(_HERE, "_build")
_LOCK = threading.Lock()


class NativeUnavailable(RuntimeError):
    pass


def _compile(src: str, out: str) -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    src_path = os.path.join(_HERE, src)
    out_path = os.path.join(_BUILD_DIR, out)
    if (os.path.exists(out_path)
            and os.path.getmtime(out_path) >= os.path.getmtime(src_path)):
        return out_path
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", out_path, src_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError) as e:
        raise NativeUnavailable(f"failed to build {src}: {e}") from e
    return out_path


def load_library(src: str, out: str):
    import ctypes
    with _LOCK:
        path = _compile(src, out)
    try:
        return ctypes.CDLL(path)
    except OSError as e:
        raise NativeUnavailable(str(e)) from e
