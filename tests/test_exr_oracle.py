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

SUPPORTED = ("NONE", "RLE", "ZIPS", "ZIP", "PIZ", "PXR24", "B44", "B44A")


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
@pytest.mark.parametrize("comp", ["NONE", "ZIP", "PIZ", "B44A"])
def test_tiled_decode_matches_openexr(tmp_path, img, layout, comp):
    """Tiled single-part files (ONE_LEVEL and MIPMAP level 0)."""
    p = str(tmp_path / f"{layout}_{comp}.exr")
    oracle.write(p, img, compression=comp, layout=layout, tile_size=32)
    assert np.array_equal(exr.read(p), oracle.read(p))


def test_odd_sizes_and_tiny(tmp_path):
    """Chunk-boundary shapes: 1-row, sub-chunk, non-multiple-of-16/32."""
    rng = np.random.default_rng(1)
    for shape in ((1, 7), (5, 3), (17, 33), (31, 2)):
        img = rng.normal(0, 10, (*shape, 3)).astype(np.float32)
        for comp in SUPPORTED:
            p = str(tmp_path / f"s{shape[0]}x{shape[1]}_{comp}.exr")
            oracle.write(p, img, compression=comp)
            assert np.array_equal(exr.read(p), oracle.read(p)), (shape, comp)
