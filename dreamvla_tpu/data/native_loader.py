"""ctypes bindings for the native frame loader (native/frameloader.cpp).

GIL-free parallel npz member extraction for the host data path. Falls back
to numpy transparently when the shared object hasn't been built
(`make -C native`). The npy payload header is parsed in Python (cheap); the
file IO + zip walk + inflate run in C++ threads.
"""

from __future__ import annotations

import ctypes
import io
import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATHS = (
    Path(__file__).resolve().parents[2] / "native" / "libframeloader.so",
    Path(os.environ.get("DREAMVLA_FRAMELOADER", "/nonexistent")),
)


def _try_build() -> None:
    """Build libframeloader.so in-tree on first import (one `make` call;
    ~1 s). Skipped when the source tree is absent (wheel installs ship the
    .so), the toolchain is missing, or DREAMVLA_NO_NATIVE_BUILD is set."""
    if os.environ.get("DREAMVLA_NO_NATIVE_BUILD"):
        return
    src_dir = _LIB_PATHS[0].parent
    if not (src_dir / "Makefile").exists():
        return
    import subprocess

    try:
        subprocess.run(["make", "-C", str(src_dir)], check=True,
                       capture_output=True, timeout=120)
    except Exception as exc:  # toolchain missing / ro filesystem: fall back
        import warnings

        warnings.warn(
            f"native frame loader build failed ({exc}); data loading falls "
            f"back to single-threaded numpy — run `make -C {src_dir}` "
            f"manually or set DREAMVLA_NO_NATIVE_BUILD=1 to silence")


def _load_lib() -> Optional[ctypes.CDLL]:
    if not any(p.exists() for p in _LIB_PATHS):
        _try_build()
    for p in _LIB_PATHS:
        if p.exists():
            lib = ctypes.CDLL(str(p))
            lib.fl_read_member.restype = ctypes.c_int64
            lib.fl_read_member.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
            lib.fl_read_members_batch.restype = ctypes.c_int
            lib.fl_read_members_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
            lib.fl_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
            return lib
    return None


_LIB = _load_lib()


def available() -> bool:
    return _LIB is not None


def _npy_from_bytes(raw: bytes) -> np.ndarray:
    return np.load(io.BytesIO(raw), allow_pickle=False)


def read_members_batch(tasks: Sequence[Tuple[str, str]],
                       n_threads: int = 8) -> List[Optional[np.ndarray]]:
    """tasks: [(npz_path, member_name)] -> arrays (None on failure).

    With the native lib the IO/inflate fan out over C++ threads; otherwise a
    plain numpy loop.
    """
    if _LIB is None:
        out: List[Optional[np.ndarray]] = []
        for path, member in tasks:
            try:
                with np.load(path, allow_pickle=False) as z:
                    out.append(np.asarray(z[member]))
            except Exception:
                out.append(None)
        return out

    n = len(tasks)
    paths = (ctypes.c_char_p * n)(*[t[0].encode() for t in tasks])
    members = (ctypes.c_char_p * n)(*[t[1].encode() for t in tasks])
    bufs = (ctypes.POINTER(ctypes.c_uint8) * n)()
    sizes = (ctypes.c_int64 * n)()
    _LIB.fl_read_members_batch(paths, members, n, bufs, sizes, n_threads)
    out = []
    for i in range(n):
        if sizes[i] < 0:
            out.append(None)
            continue
        raw = ctypes.string_at(bufs[i], sizes[i])
        _LIB.fl_free(bufs[i])
        try:
            out.append(_npy_from_bytes(raw))
        except Exception:
            out.append(None)
    return out


def read_frame_npz(path: str, keys: Sequence[str],
                   n_threads: int = 4) -> Dict[str, np.ndarray]:
    """Read several members of one npz (native batch under the hood)."""
    arrays = read_members_batch([(path, k) for k in keys], n_threads)
    out = {}
    for k, a in zip(keys, arrays):
        if a is None:
            raise KeyError(f"member {k!r} missing/corrupt in {path}")
        out[k] = a
    return out
