"""Minimal OpenEXR codec (pure Python + numpy + zlib).

The reference depends on the native OpenEXR library through imageio for HDR
decode (reference: src/data/datasets.py:80, environment.yml `openexr`); this
module replaces that dependency with a self-contained scanline EXR
reader/writer so the framework has no native image-codec requirement.

Supported (covers the RENI_HDR dataset and everything typical tooling emits):
- single-part scanline images, version 2
- pixel types HALF and FLOAT; channels R, G, B (A and Y read too)
- compression: NONE, ZIPS (1 line/chunk), ZIP (16 lines/chunk)
- increasing-y line order

Unsupported (raises): tiled/deep/multi-part, PIZ/PXR24/B44/DWA compression.

Format reference: the public OpenEXR file-format documentation
(openexr.com/en/latest/OpenEXRFileLayout.html).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = 20000630
_PIXEL_DTYPES = {0: np.uint32, 1: np.float16, 2: np.float32}
_COMPRESSION_LINES = {0: 1, 1: 1, 2: 1, 3: 16}  # NONE, RLE, ZIPS, ZIP
_COMPRESSION_NAMES = {0: "NONE", 1: "RLE", 2: "ZIPS", 3: "ZIP", 4: "PIZ", 5: "PXR24"}


class ExrError(ValueError):
    pass


def _read_cstring(buf: memoryview, pos: int) -> tuple[str, int]:
    end = pos
    while buf[end] != 0:
        end += 1
    return bytes(buf[pos:end]).decode("latin-1"), end + 1


def _parse_channels(data: bytes):
    channels = []
    mv = memoryview(data)
    pos = 0
    while mv[pos] != 0:
        name, pos = _read_cstring(mv, pos)
        ptype, xs, ys = struct.unpack_from("<i4xii", data, pos)
        pos += 16
        channels.append((name, ptype, xs, ys))
    return channels


def _unpredict_deinterleave(raw: bytes) -> np.ndarray:
    """Invert the EXR ZIP pre-filter: delta-decode, then de-interleave the
    two halves (ImfZip.cpp uncompress path)."""
    arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int16)
    arr[1:] -= 128
    arr = np.cumsum(arr, dtype=np.int64).astype(np.uint8)
    n = arr.size
    half = (n + 1) // 2
    out = np.empty(n, dtype=np.uint8)
    out[0::2] = arr[:half]
    out[1::2] = arr[half:]
    return out


def _predict_interleave(data: np.ndarray) -> bytes:
    """The forward ZIP pre-filter (ImfZip.cpp compress path)."""
    n = data.size
    half = (n + 1) // 2
    tmp = np.empty(n, dtype=np.uint8)
    tmp[:half] = data[0::2]
    tmp[half:] = data[1::2]
    d = tmp.astype(np.int16)
    d[1:] = d[1:] - d[:-1] + 128
    return d.astype(np.uint8).tobytes()


def read(path: str) -> np.ndarray:
    """Read an EXR file -> float32 array (H, W, C) with channels ordered
    R, G, B[, A] (or a single luminance channel replicated to 3)."""
    with open(path, "rb") as f:
        data = f.read()
    magic, version = struct.unpack_from("<ii", data, 0)
    if magic != _MAGIC:
        raise ExrError(f"{path}: not an EXR file")
    if version & 0x200 or version & 0x800 or version & 0x1000:
        raise ExrError(f"{path}: tiled/deep/multi-part EXR not supported")

    pos = 8
    attrs = {}
    mv = memoryview(data)
    while True:
        if mv[pos] == 0:
            pos += 1
            break
        name, pos = _read_cstring(mv, pos)
        _type, pos = _read_cstring(mv, pos)
        (size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        attrs[name] = (_type, data[pos : pos + size])
        pos += size

    channels = _parse_channels(attrs["channels"][1])
    compression = attrs["compression"][1][0]
    if compression not in (0, 2, 3):
        raise ExrError(
            f"{path}: compression {_COMPRESSION_NAMES.get(compression, compression)} "
            "not supported (NONE/ZIPS/ZIP only)"
        )
    xmin, ymin, xmax, ymax = struct.unpack("<4i", attrs["dataWindow"][1])
    width, height = xmax - xmin + 1, ymax - ymin + 1
    if any(xs != 1 or ys != 1 for _, _, xs, ys in channels):
        raise ExrError(f"{path}: subsampled channels not supported")

    lines_per_chunk = _COMPRESSION_LINES[compression]
    n_chunks = -(-height // lines_per_chunk)
    # skip the offset table; chunks follow in order for increasing-y files
    pos += 8 * n_chunks

    ch_dtypes = [np.dtype(_PIXEL_DTYPES[pt]).newbyteorder("<") for _, pt, _, _ in channels]
    ch_names = [c[0] for c in channels]
    planes = {
        n: np.empty((height, width), dtype=np.float32) for n in ch_names
    }

    for _ in range(n_chunks):
        y, size = struct.unpack_from("<ii", data, pos)
        pos += 8
        payload = data[pos : pos + size]
        pos += size
        row0 = y - ymin
        nrows = min(lines_per_chunk, height - row0)
        raw_size = nrows * width * sum(d.itemsize for d in ch_dtypes)
        if compression == 0:
            raw = np.frombuffer(payload, dtype=np.uint8)
        else:
            if size >= raw_size:
                raw = np.frombuffer(payload, dtype=np.uint8)  # stored raw
            else:
                raw = _unpredict_deinterleave(zlib.decompress(payload))
        off = 0
        for r in range(nrows):
            for name, dt in zip(ch_names, ch_dtypes):
                nbytes = width * dt.itemsize
                line = np.frombuffer(raw[off : off + nbytes].tobytes(), dtype=dt)
                planes[name][row0 + r] = line.astype(np.float32)
                off += nbytes

    upper = {n.upper(): n for n in ch_names}
    if all(c in upper for c in "RGB"):
        names = [upper["R"], upper["G"], upper["B"]]
        if "A" in upper:
            names.append(upper["A"])
        return np.stack([planes[n] for n in names], axis=-1)
    if "Y" in upper:
        return np.repeat(planes[upper["Y"]][..., None], 3, axis=-1)
    return np.stack([planes[n] for n in ch_names], axis=-1)


def _attr(name: str, atype: str, payload: bytes) -> bytes:
    return (
        name.encode() + b"\0" + atype.encode() + b"\0"
        + struct.pack("<i", len(payload)) + payload
    )


def write(path: str, img: np.ndarray, *, pixel_type: str = "half", compression: str = "ZIP"):
    """Write (H, W, 3|1) float array as a scanline EXR (RGB or Y)."""
    img = np.asarray(img, dtype=np.float32)
    if img.ndim == 2:
        img = img[..., None]
    height, width, nch = img.shape
    if nch == 1:
        names = ["Y"]
    elif nch == 3:
        names = ["B", "G", "R"]  # EXR channels are stored name-sorted
        img = img[..., ::-1]
    else:
        raise ExrError("write supports 1 or 3 channels")

    ptype = 1 if pixel_type == "half" else 2
    dt = np.dtype(_PIXEL_DTYPES[ptype]).newbyteorder("<")
    comp = {"NONE": 0, "ZIPS": 2, "ZIP": 3}[compression]
    lines_per_chunk = _COMPRESSION_LINES[comp]

    chan_entries = b""
    for n in names:
        chan_entries += n.encode() + b"\0" + struct.pack("<i4xii", ptype, 1, 1)
    chan_entries += b"\0"

    header = struct.pack("<ii", _MAGIC, 2)
    header += _attr("channels", "chlist", chan_entries)
    header += _attr("compression", "compression", bytes([comp]))
    box = struct.pack("<4i", 0, 0, width - 1, height - 1)
    header += _attr("dataWindow", "box2i", box)
    header += _attr("displayWindow", "box2i", box)
    header += _attr("lineOrder", "lineOrder", b"\0")
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\0"

    n_chunks = -(-height // lines_per_chunk)
    chunks = []
    for c in range(n_chunks):
        row0 = c * lines_per_chunk
        nrows = min(lines_per_chunk, height - row0)
        lines = []
        for r in range(row0, row0 + nrows):
            for ci in range(len(names)):
                lines.append(img[r, :, ci].astype(dt).tobytes())
        raw = b"".join(lines)
        if comp == 0:
            payload = raw
        else:
            z = zlib.compress(
                _predict_interleave(np.frombuffer(raw, dtype=np.uint8))
            )
            payload = z if len(z) < len(raw) else raw
        chunks.append((row0, payload))

    offset_table_pos = len(header)
    data_pos = offset_table_pos + 8 * n_chunks
    offsets = []
    body = b""
    for row0, payload in chunks:
        offsets.append(data_pos + len(body))
        body += struct.pack("<ii", row0, len(payload)) + payload

    with open(path, "wb") as f:
        f.write(header)
        f.write(struct.pack(f"<{n_chunks}q", *offsets))
        f.write(body)
