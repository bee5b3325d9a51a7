"""Native (C++) runtime components, loaded via ctypes.

`lib()` returns the shared library handle, building it on first use with
g++ (cached under genesis_tpu/native/build/). Returns None when no
toolchain is available — all call sites fall back to pure Python.
"""

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import Optional

_DIR = osp.dirname(osp.abspath(__file__))
_BUILD_DIR = osp.join(_DIR, "build")
_SO_PATH = osp.join(_BUILD_DIR, "libgenesis_native.so")
_SOURCES = [osp.join(_DIR, "tfrecord.cc")]

_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> Optional[str]:
    """Compile the native library. Returns the .so path or None."""
    if not force and osp.exists(_SO_PATH):
        src_mtime = max(os.path.getmtime(s) for s in _SOURCES)
        if os.path.getmtime(_SO_PATH) >= src_mtime:
            return _SO_PATH
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           *_SOURCES, "-o", _SO_PATH, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"genesis_tpu.native: build failed, using pure-Python "
              f"fallback ({msg if msg else e})")
        return None
    return _SO_PATH


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("GENESIS_TPU_NO_NATIVE"):
            return None
        so = build()
        if so is None:
            return None
        cdll = ctypes.CDLL(so)
        cdll.gt_crc32c.restype = ctypes.c_uint32
        cdll.gt_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        cdll.gt_open.restype = ctypes.c_void_p
        cdll.gt_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                 ctypes.c_int]
        cdll.gt_close.argtypes = [ctypes.c_void_p]
        cdll.gt_next.restype = ctypes.c_int64
        cdll.gt_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_int64]
        cdll.gt_skip.restype = ctypes.c_int64
        cdll.gt_skip.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        cdll.gt_extract.restype = ctypes.c_int64
        cdll.gt_extract.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                    ctypes.c_char_p, ctypes.c_int,
                                    ctypes.c_void_p, ctypes.c_int64]
        cdll.gt_bytes_count.restype = ctypes.c_int64
        cdll.gt_bytes_count.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                        ctypes.c_char_p]
        cdll.gt_bytes_at.restype = ctypes.c_int64
        cdll.gt_bytes_at.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                     ctypes.c_char_p, ctypes.c_int64,
                                     ctypes.c_void_p, ctypes.c_int64]
        _lib = cdll
        return _lib
