"""ctypes bindings for the native host runtime (native/runtime.cc).

The reference's runtime layer is C++ (ROS 2 nodes + DDS, SURVEY.md §1 L0);
the TPU build keeps the host-side hot pieces native too: the SPSC frame
ring (in-process topic analog), the prefetching image-sequence reader
(camera-driver/rosbag analog feeding the ORB frontend), and a ns-resolution
event logger with CSV export (event_logger.cpp analog). Python is the
orchestration layer; these never hold the GIL across IO.

The library builds on demand with `make -C native` (g++ baked into the
image; pybind11 is not, hence the C ABI + ctypes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_NATIVE_DIR = _REPO_ROOT / "native"
_LIB_PATH = _NATIVE_DIR / "libfitslam_runtime.so"
_lib: Optional[ctypes.CDLL] = None


def ensure_built() -> bool:
    """Build the native library if missing. Returns True when available."""
    if _LIB_PATH.exists():
        return True
    if not (_NATIVE_DIR / "Makefile").exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
    except (subprocess.SubprocessError, OSError):
        return False
    return _LIB_PATH.exists()


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native runtime; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not ensure_built():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.fit_now_ns.restype = ctypes.c_int64
    lib.fit_ring_create.restype = ctypes.c_void_p
    lib.fit_ring_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
    lib.fit_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.fit_ring_size.restype = ctypes.c_size_t
    lib.fit_ring_size.argtypes = [ctypes.c_void_p]
    lib.fit_ring_push.restype = ctypes.c_int
    lib.fit_ring_push.argtypes = [ctypes.c_void_p, u8p, ctypes.c_size_t]
    lib.fit_ring_pop.restype = ctypes.c_int
    lib.fit_ring_pop.argtypes = [ctypes.c_void_p, u8p, ctypes.c_size_t]
    lib.fit_seqreader_open.restype = ctypes.c_void_p
    lib.fit_seqreader_open.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.fit_seqreader_width.restype = ctypes.c_int
    lib.fit_seqreader_width.argtypes = [ctypes.c_void_p]
    lib.fit_seqreader_height.restype = ctypes.c_int
    lib.fit_seqreader_height.argtypes = [ctypes.c_void_p]
    lib.fit_seqreader_count.restype = ctypes.c_int64
    lib.fit_seqreader_count.argtypes = [ctypes.c_void_p]
    lib.fit_seqreader_next.restype = ctypes.c_int
    lib.fit_seqreader_next.argtypes = [
        ctypes.c_void_p, u8p, ctypes.c_size_t, ctypes.c_int64,
    ]
    lib.fit_seqreader_close.argtypes = [ctypes.c_void_p]
    lib.fit_eventlog_create.restype = ctypes.c_void_p
    lib.fit_eventlog_destroy.argtypes = [ctypes.c_void_p]
    lib.fit_eventlog_begin.restype = ctypes.c_int64
    lib.fit_eventlog_begin.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.fit_eventlog_end.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.fit_eventlog_count.restype = ctypes.c_int64
    lib.fit_eventlog_count.argtypes = [ctypes.c_void_p]
    lib.fit_eventlog_export_csv.restype = ctypes.c_int64
    lib.fit_eventlog_export_csv.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    _lib = lib
    return _lib


def now_ns() -> int:
    lib = load_library()
    if lib is None:
        import time

        return time.monotonic_ns()
    return int(lib.fit_now_ns())


def _as_u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class SpscRing:
    """Lock-free single-producer single-consumer byte-slot ring."""

    def __init__(self, slot_size: int, n_slots: int):
        self._lib = load_library()
        if self._lib is None:
            raise RuntimeError("native runtime unavailable")
        self.slot_size = slot_size
        self._h = ctypes.c_void_p(self._lib.fit_ring_create(slot_size, n_slots))

    def push(self, data: np.ndarray) -> bool:
        buf = np.ascontiguousarray(data.reshape(-1).view(np.uint8))
        return bool(self._lib.fit_ring_push(self._h, _as_u8p(buf), buf.size))

    def pop(self) -> Optional[np.ndarray]:
        out = np.empty(self.slot_size, np.uint8)
        ok = self._lib.fit_ring_pop(self._h, _as_u8p(out), out.size)
        return out if ok else None

    def __len__(self) -> int:
        return int(self._lib.fit_ring_size(self._h))

    def close(self):
        if self._h:
            self._lib.fit_ring_destroy(self._h)
            self._h = None


class PgmSequenceReader:
    """Prefetching reader over a directory of P5 .pgm frames."""

    def __init__(self, directory: str, prefetch: int = 8):
        self._lib = load_library()
        if self._lib is None:
            raise RuntimeError("native runtime unavailable")
        self._h = ctypes.c_void_p(
            self._lib.fit_seqreader_open(str(directory).encode(), prefetch)
        )
        if not self._h:
            raise FileNotFoundError(f"no .pgm sequence in {directory}")
        self.width = int(self._lib.fit_seqreader_width(self._h))
        self.height = int(self._lib.fit_seqreader_height(self._h))
        self.count = int(self._lib.fit_seqreader_count(self._h))
        self._consumed = 0

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        out = np.empty(self.height * self.width, np.uint8)
        rc = self._lib.fit_seqreader_next(
            self._h, _as_u8p(out), out.size, self._consumed
        )
        if rc == 0:
            raise StopIteration
        if rc < 0:
            raise IOError("pgm sequence read error")
        self._consumed += 1
        return out.reshape(self.height, self.width)

    def close(self):
        if self._h:
            self._lib.fit_seqreader_close(self._h)
            self._h = None


class NativeEventLog:
    """ns-resolution begin/end event log with CSV export."""

    def __init__(self):
        self._lib = load_library()
        if self._lib is None:
            raise RuntimeError("native runtime unavailable")
        self._h = ctypes.c_void_p(self._lib.fit_eventlog_create())

    def begin(self, name: str) -> int:
        return int(self._lib.fit_eventlog_begin(self._h, name.encode()))

    def end(self, idx: int):
        self._lib.fit_eventlog_end(self._h, idx)

    def count(self) -> int:
        return int(self._lib.fit_eventlog_count(self._h))

    def export_csv(self, path: str) -> int:
        return int(self._lib.fit_eventlog_export_csv(self._h, str(path).encode()))

    def close(self):
        if self._h:
            self._lib.fit_eventlog_destroy(self._h)
            self._h = None


def write_pgm(path: str, img: np.ndarray) -> None:
    """Write an 8-bit grayscale image as binary PGM (test fixture/helper)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(f"P5\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
        f.write(img.tobytes())
