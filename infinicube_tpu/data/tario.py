"""Indexed tar I/O: ctypes bindings over the native mmap reader
(native/tario.cpp), with a pure-Python tarfile fallback.

Replaces the reference's webdataset shard reading / writing
(/root/reference/infinicube/utils/wds_utils.py:239 get_sample, :300
write_to_tar). The native path mmaps a shard once and serves member bytes
with no per-member header rescans."""

from __future__ import annotations

import ctypes
import io
import subprocess
import tarfile
from pathlib import Path

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_SO = _NATIVE_DIR / "libtario.so"
_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not _SO.exists() or _SO.stat().st_mtime < \
                (_NATIVE_DIR / "tario.cpp").stat().st_mtime:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", str(_SO),
                 str(_NATIVE_DIR / "tario.cpp")],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        lib.tario_open.restype = ctypes.c_void_p
        lib.tario_open.argtypes = [ctypes.c_char_p]
        lib.tario_count.restype = ctypes.c_int64
        lib.tario_count.argtypes = [ctypes.c_void_p]
        lib.tario_name.restype = ctypes.c_char_p
        lib.tario_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.tario_size.restype = ctypes.c_int64
        lib.tario_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.tario_find.restype = ctypes.c_int64
        lib.tario_find.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.tario_read.restype = ctypes.c_int64
        lib.tario_read.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_char_p, ctypes.c_int64]
        lib.tario_close.argtypes = [ctypes.c_void_p]
        lib.tarw_open.restype = ctypes.c_void_p
        lib.tarw_open.argtypes = [ctypes.c_char_p]
        lib.tarw_add.restype = ctypes.c_int64
        lib.tarw_add.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                 ctypes.c_char_p, ctypes.c_int64]
        lib.tarw_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


class TarReader:
    """Random-access member reads from a tar shard."""

    def __init__(self, path: str | Path):
        self.path = str(path)
        lib = _load_native()
        self._h = None
        self._tf = None
        if lib:
            self._h = lib.tario_open(self.path.encode())
        if not self._h:
            self._tf = tarfile.open(self.path, "r")
            self._members = {m.name: m for m in self._tf.getmembers()
                             if m.isfile()}

    def names(self) -> list[str]:
        if self._h:
            lib = _lib
            return [lib.tario_name(self._h, i).decode()
                    for i in range(lib.tario_count(self._h))]
        return list(self._members)

    def read(self, name: str) -> bytes:
        if self._h:
            lib = _lib
            i = lib.tario_find(self._h, name.encode())
            if i < 0:
                raise KeyError(name)
            size = lib.tario_size(self._h, i)
            buf = ctypes.create_string_buffer(size)
            lib.tario_read(self._h, i, buf, size)
            return buf.raw
        m = self._members.get(name)
        if m is None:
            raise KeyError(name)
        return self._tf.extractfile(m).read()

    def __contains__(self, name: str) -> bool:
        if self._h:
            return _lib.tario_find(self._h, name.encode()) >= 0
        return name in self._members

    def close(self):
        if self._h:
            _lib.tario_close(self._h)
            self._h = None
        if self._tf:
            self._tf.close()
            self._tf = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class TarWriter:
    """Sequential tar shard writer (wds_utils.write_to_tar equivalent)."""

    def __init__(self, path: str | Path):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        self.path = str(path)
        lib = _load_native()
        self._h = lib.tarw_open(self.path.encode()) if lib else None
        self._tf = None if self._h else tarfile.open(self.path, "w")

    def add(self, name: str, data: bytes):
        if self._h:
            _lib.tarw_add(self._h, name.encode(), data, len(data))
        else:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            self._tf.addfile(info, io.BytesIO(data))

    def close(self):
        if self._h:
            _lib.tarw_close(self._h)
            self._h = None
        if self._tf:
            self._tf.close()
            self._tf = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def get_sample(tar_path: str | Path, key: str) -> dict[str, bytes]:
    """All members of one sample key (name = '<key>.<ext...>') from a shard
    (wds_utils.get_sample equivalent)."""
    with TarReader(tar_path) as r:
        out = {}
        for name in r.names():
            stem, _, ext = name.partition(".")
            if stem == key:
                out[ext] = r.read(name)
        return out
