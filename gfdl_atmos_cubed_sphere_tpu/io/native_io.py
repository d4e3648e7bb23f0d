"""ctypes binding for the native async I/O engine (native/fvio.cpp).

The C++ writer thread streams restart/history arrays to disk while the
model keeps stepping — the role of the reference's FMS I/O stack under
tools/fv_io.F90 / tools/fv_restart.F90. The library is compiled lazily
with g++ on first use and cached; everything degrades gracefully to the
pure-Python npz path if no toolchain is available.

File format ("FVIO1"): see native/fvio.cpp header comment. The reader here
is pure numpy (reads are rare: startup/restart)."""

import ctypes
import os
import struct
import subprocess
import threading

import numpy as np

_DTYPES = {np.dtype("float32"): 0, np.dtype("float64"): 1,
           np.dtype("int32"): 2, np.dtype("int64"): 3,
           np.dtype("uint8"): 4}
_RTYPES = {v: k for k, v in _DTYPES.items()}

_lib = None
_lib_lock = threading.Lock()


def _source_path():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "native", "fvio.cpp")


def _build_dir():
    d = os.path.join(os.path.dirname(_source_path()), "build")
    os.makedirs(d, exist_ok=True)
    return d


def load_library():
    """Compile (once) + dlopen the fvio shared library; None on failure."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        src = _source_path()
        if not os.path.exists(src):
            return None
        so = os.path.join(_build_dir(), "libfvio.so")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            try:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", src, "-o", so],
                    check=True, capture_output=True)
            except (OSError, subprocess.CalledProcessError):
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.fvio_open.restype = ctypes.c_void_p
        lib.fvio_open.argtypes = [ctypes.c_char_p]
        lib.fvio_write.restype = ctypes.c_int
        lib.fvio_write.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_void_p,
            ctypes.c_uint64]
        lib.fvio_pending.restype = ctypes.c_int
        lib.fvio_pending.argtypes = [ctypes.c_void_p]
        lib.fvio_close.restype = ctypes.c_int
        lib.fvio_close.argtypes = [ctypes.c_void_p]
        lib.fvio_crc32.restype = ctypes.c_uint32
        lib.fvio_crc32.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        _lib = lib
        return _lib


class AsyncWriter:
    """Hand arrays to the C++ writer thread; the model thread returns
    immediately (data is copied at submit)."""

    def __init__(self, path):
        lib = load_library()
        if lib is None:
            raise RuntimeError("fvio native library unavailable")
        self._lib = lib
        self._h = lib.fvio_open(str(path).encode())
        if not self._h:
            raise OSError(f"fvio_open failed: {path}")

    def write(self, name, array):
        a = np.ascontiguousarray(array)
        code = _DTYPES.get(a.dtype)
        if code is None:
            a = a.astype(np.float64)
            code = _DTYPES[a.dtype]
        dims = (ctypes.c_uint64 * a.ndim)(*a.shape)
        rc = self._lib.fvio_write(
            self._h, name.encode(), code, a.ndim, dims,
            a.ctypes.data_as(ctypes.c_void_p), a.nbytes)
        if rc != 0:
            raise OSError("fvio_write failed")

    def pending(self):
        return self._lib.fvio_pending(self._h)

    def close(self):
        if self._h:
            self._lib.fvio_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_fvio(path, arrays):
    """Blocking convenience: write a dict of arrays and close."""
    with AsyncWriter(path) as w:
        for k, v in arrays.items():
            w.write(k, np.asarray(v))


def read_fvio(path, verify=True):
    """Read an FVIO container into {name: ndarray}. Pure numpy."""
    out = {}
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic[:5] != b"FVIO\x01":
            raise ValueError(f"not an FVIO file: {path}")
        while True:
            raw = f.read(4)
            if len(raw) < 4:
                raise ValueError("truncated FVIO file")
            (nl,) = struct.unpack("<I", raw)
            if nl == 0:
                break
            name = f.read(nl).decode()
            dtype_c, ndim = struct.unpack("<BB", f.read(2))
            dims = struct.unpack(f"<{ndim}Q", f.read(8 * ndim))
            (nb,) = struct.unpack("<Q", f.read(8))
            payload = f.read(nb)
            (crc,) = struct.unpack("<I", f.read(4))
            if verify:
                lib = load_library()
                if lib is not None:
                    got = lib.fvio_crc32(payload, nb)
                    if got != crc:
                        raise ValueError(f"CRC mismatch for '{name}'")
            out[name] = np.frombuffer(
                payload, dtype=_RTYPES[dtype_c]).reshape(dims)
    return out


def native_available():
    return load_library() is not None
