"""Pin the in-repo EXR codec against the SYSTEM OpenEXR library.

The reference decodes EXRs through the real OpenEXR
(/root/reference/src/data/datasets.py:80, environment.yml `openexr`);
these tests hold our self-contained codec (reni_tpu/data/exr.py, native
fast path native/exr_decode.cpp) to that same authority: every file the
authoritative encoder produces must decode bit-for-bit identically to
the authoritative decoder, and every file our writer emits must be
accepted and identically decoded by OpenEXR. This breaks the circularity
of pinning the decoder against the in-repo encoder only.

Skipped wholesale when the system library/headers are absent (the
production code path never needs them).
"""

from __future__ import annotations

import numpy as np
import pytest

from reni_tpu.data import exr

from tests import exr_oracle as oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="system OpenEXR (libopenexr-dev) not present"
)

SUPPORTED = (
    "NONE", "RLE", "ZIPS", "ZIP", "PIZ", "PXR24", "B44", "B44A", "DWAA", "DWAB",
)


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    a = rng.gamma(1.5, 1.0, (64, 96, 3)).astype(np.float32)
    # negatives, zeros, huge and tiny magnitudes (subnormal halves)
    a[0, :4] = 0.0
    a[1, :4] = -a[1, :4]
    a[2, :4] *= 1e4
    a[3, :4] *= 1e-7
    return a


@pytest.mark.parametrize("comp", SUPPORTED)
@pytest.mark.parametrize("pt", ["half", "float"])
def test_decode_matches_openexr(tmp_path, img, comp, pt):
    """OpenEXR-encoded file: our decode == OpenEXR's own decode, bitwise."""
    p = str(tmp_path / f"{comp}_{pt}.exr")
    oracle.write(p, img, compression=comp, pixel_type=pt)
    assert np.array_equal(exr.read(p), oracle.read(p))


@pytest.mark.parametrize("comp", SUPPORTED)
@pytest.mark.parametrize("pt", ["half", "float"])
def test_encode_accepted_by_openexr(tmp_path, img, comp, pt):
    """Our writer's files: OpenEXR accepts them and decodes identically."""
    p = str(tmp_path / f"{comp}_{pt}.exr")
    exr.write(p, img, pixel_type=pt, compression=comp)
    assert np.array_equal(oracle.read(p), exr.read(p))


@pytest.mark.parametrize("layout", ["tiled", "mipmap"])
@pytest.mark.parametrize("comp", ["NONE", "ZIP", "PIZ", "B44A", "DWAA"])
def test_tiled_decode_matches_openexr(tmp_path, img, layout, comp):
    """Tiled single-part files (ONE_LEVEL and MIPMAP level 0)."""
    p = str(tmp_path / f"{layout}_{comp}.exr")
    oracle.write(p, img, compression=comp, layout=layout, tile_size=32)
    assert np.array_equal(exr.read(p), oracle.read(p))


@pytest.mark.parametrize("level", [0.0, 200.0])
def test_dwa_channel_classification(tmp_path, level):
    """DWA classifies channels by NAME: Y alone is LOSSY_DCT without the
    RGB->YCbCr decorrelation, A is RLE-coded, and anything else (here Z
    float and an `id` UINT) is an UNKNOWN channel stored losslessly.
    Every decoded sample must equal libOpenEXR's own decode bitwise, at
    the default quantization and at a heavy dwaCompressionLevel=200."""
    rng = np.random.default_rng(7)
    h, w = 33, 41
    y = rng.gamma(1.5, 1.0, (h, w)).astype(np.float32)
    p = str(tmp_path / f"lum_{level}.exr")
    oracle.write_channels(p, ["Y"], ["half"], y[None], compression="DWAA",
                          dwa_level=level)
    got = exr.read(p)  # single luminance channel replicated to 3
    ref = oracle.read_channel(p, "Y", (h, w))
    assert np.array_equal(got[..., 0], ref)
    assert np.array_equal(got[..., 1], ref)

    a = rng.uniform(0.0, 1.0, (h, w)).astype(np.float32)
    z = rng.normal(0, 50.0, (h, w)).astype(np.float32)
    ident = np.arange(h * w, dtype=np.float32).reshape(h, w)
    p2 = str(tmp_path / f"aux_{level}.exr")
    oracle.write_channels(
        p2, ["A", "Z", "id"], ["half", "float", "uint"],
        np.stack([a, z, ident]), compression="DWAB", dwa_level=level,
    )
    got = exr.read(p2)  # no RGB/Y -> file order (alphabetical by writer)
    for i, name in enumerate(["A", "Z", "id"]):
        ref = oracle.read_channel(p2, name, (h, w))
        assert np.array_equal(got[..., i], ref), name
    # UNKNOWN channels are stored losslessly by the format
    assert np.array_equal(got[..., 1], z)
    assert np.array_equal(got[..., 2], ident)


def test_odd_sizes_and_tiny(tmp_path):
    """Chunk-boundary shapes: 1-row, sub-chunk, non-multiple-of-16/32."""
    rng = np.random.default_rng(1)
    for shape in ((1, 7), (5, 3), (17, 33), (31, 2)):
        img = rng.normal(0, 10, (*shape, 3)).astype(np.float32)
        for comp in SUPPORTED:
            p = str(tmp_path / f"s{shape[0]}x{shape[1]}_{comp}.exr")
            oracle.write(p, img, compression=comp)
            assert np.array_equal(exr.read(p), oracle.read(p)), (shape, comp)


def test_multipart_both_directions(tmp_path):
    """Multi-part files (version bit 0x1000): our reader returns OpenEXR's
    part-0 decode from read(), every part via read_part matches the
    library bit-for-bit (native and pure-Python paths), and our
    write_multipart files are accepted and identically decoded by
    OpenEXR. Reference counterpart: imageio/OpenEXR reads the first part
    of a multi-part EXR (src/data/datasets.py:80)."""
    rng = np.random.default_rng(7)
    h, w = 21, 37
    imgs = np.abs(rng.normal(size=(3, h, w, 3))).astype(np.float32)
    comps = ["ZIP", "PIZ", "DWAA"]

    p = str(tmp_path / "mp_oracle.exr")
    oracle.write_multipart(p, imgs, comps)
    assert oracle.part_count(p) == 3
    assert np.array_equal(exr.read(p), oracle.read_part(p, 0, (h, w)))
    for i in range(3):
        ours = exr.read_part(p, i)
        assert np.array_equal(ours, oracle.read_part(p, i, (h, w))), i
        with exr.force_python_decoder():
            assert np.array_equal(exr.read_part(p, i), ours), i

    mine = str(tmp_path / "mp_ours.exr")
    exr.write_multipart(mine, list(imgs), compressions=comps)
    assert oracle.part_count(mine) == 3
    for i in range(3):
        assert np.array_equal(
            exr.read_part(mine, i), oracle.read_part(mine, i, (h, w))
        ), i
