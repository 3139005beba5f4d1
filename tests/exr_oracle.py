"""ctypes loader for the system-OpenEXR test oracle (tests/native/exr_oracle.cpp).

Gives tests an authoritative encode/decode against real OpenEXR so the
in-repo codec (reni_tpu/data/exr.py) is pinned to the published format,
not to its own writer. Skips cleanly (``available() == False``) when the
system library/headers are absent — the production code never needs them.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native", "exr_oracle.cpp")
_SO = os.path.join(_DIR, "native", "_build", "exr_oracle.so")

# Imf::Compression enum values (ImfCompression.h).
COMPRESSION_IDS = {
    "NONE": 0,
    "RLE": 1,
    "ZIPS": 2,
    "ZIP": 3,
    "PIZ": 4,
    "PXR24": 5,
    "B44": 6,
    "B44A": 7,
    "DWAA": 8,
    "DWAB": 9,
}

_lib = None
_failed = False


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    try:
        from reni_tpu.utils.native_build import load_native

        lib = load_native(
            _SRC,
            _SO,
            (
                "-I/usr/include/OpenEXR",
                "-I/usr/include/Imath",
                "-lOpenEXR-3_1",
                "-lImath-3_1",
                "-lIex-3_1",
                "-lIlmThread-3_1",
            ),
        )
        lib.oracle_write.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
        ]
        lib.oracle_write.restype = ctypes.c_int
        lib.oracle_write_multipart.restype = ctypes.c_int
        lib.oracle_write_channels.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_float,
        ]
        lib.oracle_write_channels.restype = ctypes.c_int
        lib.oracle_read_channel.restype = ctypes.c_int
        lib.oracle_read_size.restype = ctypes.c_int
        lib.oracle_read.restype = ctypes.c_int
        lib.oracle_part_count.restype = ctypes.c_int
        lib.oracle_read_part.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _failed = True
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def write(
    path: str,
    img: np.ndarray,
    *,
    compression: str = "ZIP",
    pixel_type: str = "half",
    layout: str = "scanline",
    tile_size: int = 32,
    dwa_level: float = 0.0,
) -> None:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, dtype=np.float32)
    h, w, c = img.shape
    assert c == 3
    rc = lib.oracle_write(
        path.encode(),
        w,
        h,
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        COMPRESSION_IDS[compression],
        0 if pixel_type == "half" else 1,
        {"scanline": 0, "tiled": 1, "mipmap": 2}[layout],
        tile_size,
        dwa_level,
    )
    if rc != 0:
        raise RuntimeError(f"oracle_write failed for {compression}/{layout}")


def write_multipart(
    path: str, imgs: np.ndarray, compressions: list[str], pixel_type: str = "half"
) -> None:
    lib = _load()
    assert lib is not None
    imgs = np.ascontiguousarray(imgs, dtype=np.float32)
    n, h, w, c = imgs.shape
    assert c == 3 and n == len(compressions)
    comp = (ctypes.c_int * n)(*(COMPRESSION_IDS[c_] for c_ in compressions))
    rc = lib.oracle_write_multipart(
        path.encode(),
        w,
        h,
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        comp,
        0 if pixel_type == "half" else 1,
    )
    if rc != 0:
        raise RuntimeError("oracle_write_multipart failed")


_PIXEL_TYPE_IDS = {"uint": 0, "half": 1, "float": 2}


def write_channels(
    path: str,
    names: list[str],
    types: list[str],
    planes: np.ndarray,
    *,
    compression: str = "ZIP",
    dwa_level: float = 0.0,
) -> None:
    """Write arbitrary named channels (planar float data, one plane each)."""
    lib = _load()
    assert lib is not None
    planes = np.ascontiguousarray(planes, dtype=np.float32)
    n, h, w = planes.shape
    assert n == len(names) == len(types)
    tp = (ctypes.c_int * n)(*(_PIXEL_TYPE_IDS[t] for t in types))
    rc = lib.oracle_write_channels(
        path.encode(),
        w,
        h,
        n,
        ";".join(names).encode(),
        tp,
        planes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        COMPRESSION_IDS[compression],
        dwa_level,
    )
    if rc != 0:
        raise RuntimeError("oracle_write_channels failed")


def read_channel(path: str, name: str, shape: tuple[int, int]) -> np.ndarray:
    lib = _load()
    assert lib is not None
    out = np.empty(shape, dtype=np.float32)
    if lib.oracle_read_channel(
        path.encode(), name.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    ):
        raise RuntimeError(f"oracle_read_channel failed: {path} {name}")
    return out


def read(path: str) -> np.ndarray:
    lib = _load()
    assert lib is not None
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.oracle_read_size(path.encode(), ctypes.byref(w), ctypes.byref(h)):
        raise RuntimeError(f"oracle_read_size failed: {path}")
    out = np.empty((h.value, w.value, 3), dtype=np.float32)
    if lib.oracle_read(path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))):
        raise RuntimeError(f"oracle_read failed: {path}")
    return out


def part_count(path: str) -> int:
    lib = _load()
    assert lib is not None
    n = lib.oracle_part_count(path.encode())
    if n < 0:
        raise RuntimeError(f"oracle_part_count failed: {path}")
    return n


def read_part(path: str, part: int, shape: tuple[int, int]) -> np.ndarray:
    lib = _load()
    assert lib is not None
    out = np.empty((shape[0], shape[1], 3), dtype=np.float32)
    if lib.oracle_read_part(
        path.encode(), part, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    ):
        raise RuntimeError(f"oracle_read_part failed: {path} part {part}")
    return out
