"""Native (C++) runtime components, built on demand and loaded via ctypes.

Currently: the POSIX shared-memory observation transport
(`shm_transport.cpp`) used by the vectorized env pool — the TPU-native
answer to the reference's shared-memory observation path
(`async_vector_env.py:163-184, 774-799`).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import sysconfig

log = logging.getLogger(__name__)

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_THIS_DIR, "shm_transport.cpp")
_lib = None
_build_error: str | None = None


def _cache_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "DPPO_TPU_NATIVE_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "dppo_tpu", "native"
        ),
    )
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"libshm_transport-{digest}.so")


def _build(so_path: str) -> None:
    cxx = os.environ.get("CXX", "g++")
    cmd = [
        cxx, "-O2", "-std=c++17", "-shared", "-fPIC",
        "-o", so_path, _SRC, "-lrt", "-pthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def load_shm_lib():
    """Build (cached) + load the transport library; None if unavailable."""
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    so_path = _cache_path()
    try:
        if not os.path.exists(so_path):
            _build(so_path)
        lib = ctypes.CDLL(so_path)
        lib.shm_seg_create.restype = ctypes.c_void_p
        lib.shm_seg_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.shm_seg_attach.restype = ctypes.c_void_p
        lib.shm_seg_attach.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.shm_seg_detach.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.shm_seg_unlink.argtypes = [ctypes.c_char_p]
        lib.shm_seg_write.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
        ]
        lib.shm_seg_read.restype = ctypes.c_uint64
        lib.shm_seg_read.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
        ]
        lib.shm_seg_seq.restype = ctypes.c_uint64
        lib.shm_seg_seq.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception as e:  # compiler missing, etc.
        _build_error = str(e)
        log.warning("native shm transport unavailable: %s", e)
    return _lib


class ShmSegment:
    """A named seqlock-guarded shared-memory buffer (numpy in/out)."""

    def __init__(self, name: str, nbytes: int, create: bool):
        lib = load_shm_lib()
        if lib is None:
            raise RuntimeError(f"shm transport unavailable: {_build_error}")
        self._lib = lib
        self.name = name.encode()
        self.nbytes = nbytes
        self.created = create
        fn = lib.shm_seg_create if create else lib.shm_seg_attach
        self._base = fn(self.name, ctypes.c_uint64(nbytes))
        if not self._base:
            raise OSError(
                f"shm_seg_{'create' if create else 'attach'} failed for "
                f"{name} ({nbytes} bytes)"
            )

    def write(self, arr) -> None:
        import numpy as np

        arr = np.ascontiguousarray(arr)
        assert arr.nbytes <= self.nbytes, (arr.nbytes, self.nbytes)
        self._lib.shm_seg_write(
            ctypes.c_void_p(self._base),
            arr.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_uint64(arr.nbytes),
        )

    def read(self, out) -> int:
        """Read into a preallocated contiguous numpy array; returns seq."""
        assert out.flags["C_CONTIGUOUS"]
        return int(
            self._lib.shm_seg_read(
                ctypes.c_void_p(self._base),
                out.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_uint64(out.nbytes),
            )
        )

    @property
    def seq(self) -> int:
        return int(self._lib.shm_seg_seq(ctypes.c_void_p(self._base)))

    def close(self) -> None:
        if getattr(self, "_base", None):
            self._lib.shm_seg_detach(
                ctypes.c_void_p(self._base), ctypes.c_uint64(self.nbytes)
            )
            self._base = None
            if self.created:
                self._lib.shm_seg_unlink(self.name)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
