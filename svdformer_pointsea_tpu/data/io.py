"""Host-side file IO: pcd / npy / h5 / txt / images.

Replaces the reference's open3d dependency (utils/io.py:28-45) with a native
C++ PCD parser (svdformer_pointsea_tpu/native/pcdio.cpp, built on first use
and loaded via ctypes) plus a pure-numpy fallback for ascii/binary PCD.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libpcdio.so"
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load_native():
    """Build (once) and load the native PCD reader; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not _LIB_PATH.exists() or (
                _LIB_PATH.stat().st_mtime
                < (_NATIVE_DIR / "pcdio.cpp").stat().st_mtime
            ):
                subprocess.run(
                    [
                        "g++",
                        "-O3",
                        "-shared",
                        "-fPIC",
                        "-o",
                        str(_LIB_PATH),
                        str(_NATIVE_DIR / "pcdio.cpp"),
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.pcd_read_xyz.restype = ctypes.c_long
            lib.pcd_read_xyz.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ]
            lib.pcd_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def read_pcd(file_path: str) -> np.ndarray:
    """Read the xyz columns of a PCD file -> (N, 3) float32."""
    lib = _load_native()
    if lib is not None:
        out = ctypes.POINTER(ctypes.c_float)()
        n = lib.pcd_read_xyz(str(file_path).encode(), ctypes.byref(out))
        if n >= 0:
            try:
                arr = np.ctypeslib.as_array(out, shape=(n, 3)).copy()
            finally:
                lib.pcd_free(out)
            return arr
    return _read_pcd_python(file_path)


def _read_pcd_python(file_path: str) -> np.ndarray:
    """Numpy fallback parser (ascii + uncompressed binary)."""
    with open(file_path, "rb") as f:
        fields, sizes, types, counts = [], [], [], []
        npoints = None
        mode = None
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if line.startswith("FIELDS"):
                fields = line.split()[1:]
            elif line.startswith("SIZE"):
                sizes = [int(x) for x in line.split()[1:]]
            elif line.startswith("TYPE"):
                types = line.split()[1:]
            elif line.startswith("COUNT"):
                counts = [int(x) for x in line.split()[1:]]
            elif line.startswith("POINTS"):
                npoints = int(line.split()[1])
            elif line.startswith("DATA"):
                mode = line.split()[1]
                break
            elif not line and f.tell() == os.fstat(f.fileno()).st_size:
                raise ValueError(f"truncated PCD header: {file_path}")
        if not counts:
            counts = [1] * len(fields)
        if mode == "ascii":
            data = np.loadtxt(f, dtype=np.float32)
            data = data.reshape(npoints, -1)
            col = 0
            cols = {}
            for name, cnt in zip(fields, counts):
                cols[name] = col
                col += cnt
            return np.stack(
                [data[:, cols["x"]], data[:, cols["y"]], data[:, cols["z"]]], -1
            ).astype(np.float32)
        if mode == "binary":
            np_types = {"F": "f", "I": "i", "U": "u"}
            dt = np.dtype(
                [
                    (name, f"<{np_types[t]}{s}", (c,))
                    for name, t, s, c in zip(fields, types, sizes, counts)
                ]
            )
            raw = np.frombuffer(f.read(dt.itemsize * npoints), dtype=dt, count=npoints)
            return np.stack(
                [raw["x"][:, 0], raw["y"][:, 0], raw["z"][:, 0]], -1
            ).astype(np.float32)
        raise ValueError(
            f"python fallback does not support DATA {mode}: {file_path}"
        )


def write_pcd(file_path: str, points: np.ndarray) -> None:
    """Write an ascii PCD (utils/io.py:_write_pcd equivalent)."""
    points = np.asarray(points, np.float32)
    n = len(points)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\nDATA ascii\n"
    )
    with open(file_path, "w") as f:
        f.write(header)
        np.savetxt(f, points, fmt="%.8g")


# ---------------------------------------------------------------------------
# Optional byte-cache layer — capability parity with the reference's
# memcached client path (utils/io.py:17-24, 60-88). The reference fetches
# raw file bytes from a SenseTime-internal ``mc`` client and decodes them
# in-process; here any object with ``get(path) -> bytes | None`` /
# ``put(path, bytes)`` can be installed via :func:`set_byte_cache` (e.g. a
# real memcached/redis client wrapper), and :class:`LocalByteCache` provides
# an in-process LRU for hot files on slow network filesystems.
# ---------------------------------------------------------------------------

_byte_cache = None


def set_byte_cache(cache) -> None:
    """Install a byte cache with ``get(path)->bytes|None`` and
    ``put(path, bytes)`` (None disables). IO.get decodes npy/pcd/png/jpg
    from cached bytes, reading and populating on miss."""
    global _byte_cache
    _byte_cache = cache


class LocalByteCache:
    """In-process LRU byte cache (bounded by total bytes)."""

    def __init__(self, capacity_bytes: int = 1 << 30):
        import collections

        self.capacity = capacity_bytes
        self.size = 0
        self._d = collections.OrderedDict()
        self._lock = threading.Lock()

    def get(self, path: str):
        with self._lock:
            if path in self._d:
                self._d.move_to_end(path)
                return self._d[path]
        return None

    def put(self, path: str, data: bytes) -> None:
        with self._lock:
            if path in self._d:
                self.size -= len(self._d.pop(path))
            self._d[path] = data
            self.size += len(data)
            while self.size > self.capacity and self._d:
                _, old = self._d.popitem(last=False)
                self.size -= len(old)


def _cached_bytes(file_path: str) -> bytes:
    data = _byte_cache.get(file_path)
    if data is None:
        with open(file_path, "rb") as f:
            data = f.read()
        _byte_cache.put(file_path, data)
    return data


def read_exr_depth(file_path: str) -> np.ndarray:
    """Inverse EXR depth (utils/io.py:91-92 — ``1.0 / Depth.Z``; the
    reference ships this commented out / pyexr-based; we decode via OpenCV's
    OpenEXR backend)."""
    os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
    import cv2

    img = cv2.imread(file_path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
    if img is None:
        raise ValueError(f"could not decode EXR (OpenEXR support?): {file_path}")
    if img.ndim == 3:
        img = img[..., 0]
    return 1.0 / img.astype(np.float32)


class IO:
    """Extension-dispatched reader (utils/io.py:28-45 surface)."""

    @classmethod
    def get(cls, file_path: str) -> np.ndarray:
        ext = os.path.splitext(file_path)[1]
        if ext in (".png", ".jpg"):
            import cv2

            if _byte_cache is not None:
                buf = np.frombuffer(_cached_bytes(file_path), np.uint8)
                return cv2.imdecode(buf, cv2.IMREAD_UNCHANGED) / 255.0
            return cv2.imread(file_path, cv2.IMREAD_UNCHANGED) / 255.0
        if ext == ".npy":
            if _byte_cache is not None:
                import io as _io

                return np.load(_io.BytesIO(_cached_bytes(file_path)))
            return np.load(file_path)
        if ext == ".exr":
            return read_exr_depth(file_path)
        if ext == ".pcd":
            if _byte_cache is not None:
                import io as _io

                data = _cached_bytes(file_path)
                import tempfile

                # PCD can be binary/compressed; decode via the same parsers
                # by round-tripping the cached bytes through a temp file
                # (parse cost is identical; the cache saves the disk read).
                with tempfile.NamedTemporaryFile(suffix=".pcd") as tf:
                    tf.write(data)
                    tf.flush()
                    return read_pcd(tf.name)
            return read_pcd(file_path)
        if ext == ".h5":
            import h5py

            with h5py.File(file_path, "r") as f:
                return f["data"][()]
        if ext == ".txt":
            return np.loadtxt(file_path)
        raise ValueError(f"Unsupported file extension: {ext}")

    @classmethod
    def put(cls, file_path: str, content: np.ndarray) -> None:
        ext = os.path.splitext(file_path)[1]
        if ext == ".pcd":
            write_pcd(file_path, content)
        elif ext == ".h5":
            import h5py

            with h5py.File(file_path, "w") as f:
                f.create_dataset("data", data=content)
        elif ext == ".npy":
            np.save(file_path, content)
        else:
            raise ValueError(f"Unsupported file extension: {ext}")
