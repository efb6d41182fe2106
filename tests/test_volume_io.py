"""Native volume codec + raw loader (reference volume-IO parity)."""

import numpy as np
import pytest

from tpuvr.io import volume as vio


@pytest.fixture(scope="module")
def vol():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(9, 7, 5, 4)).astype(np.float32)
    v[v < 0.8] = 0.0  # mostly zeros => exercises RLE
    return v


@pytest.mark.parametrize("rle", [True, False])
def test_tvol_roundtrip(tmp_path, vol, rle):
    path = str(tmp_path / f"v_{rle}.tvol")
    vio.save_tvol(path, vol, rle=rle)
    out = vio.load_tvol(path)
    np.testing.assert_array_equal(out, vol)


def test_tvol_rle_compresses(tmp_path, vol):
    import os

    p1 = str(tmp_path / "rle.tvol")
    p2 = str(tmp_path / "raw.tvol")
    vio.save_tvol(p1, vol, rle=True)
    vio.save_tvol(p2, vol, rle=False)
    assert os.path.getsize(p1) < os.path.getsize(p2)


def test_native_and_numpy_agree(tmp_path, vol):
    if vio._lib() is None:
        pytest.skip("no native codec in this environment")
    p_native = str(tmp_path / "n.tvol")
    p_numpy = str(tmp_path / "p.tvol")
    vio.save_tvol(p_native, vol, rle=True)
    vio._save_tvol_numpy(p_numpy, vol, rle=True)
    # Cross-decode both ways.
    np.testing.assert_array_equal(vio._load_tvol_numpy(p_native), vol)
    out = vio.load_tvol(p_numpy)
    np.testing.assert_array_equal(out, vol)


def test_raw_loader_and_grid(tmp_path):
    rng = np.random.default_rng(1)
    d = rng.integers(0, 255, size=(4, 5, 6), dtype=np.uint8)
    path = str(tmp_path / "d.raw")
    d.tofile(path)
    density = vio.load_raw(path, (4, 5, 6), np.uint8)
    np.testing.assert_allclose(density, d.astype(np.float32) / 255.0)
    grid = vio.density_to_grid(density, emission=(0.2, 0.4, 0.6))
    assert grid.shape == (4, 5, 6, 4)
    np.testing.assert_allclose(grid[..., 0], density)
    np.testing.assert_allclose(grid[2, 3, 4, 1:], [0.2, 0.4, 0.6])


def test_ppm_native_writer(tmp_path):
    if vio._lib() is None:
        pytest.skip("no native codec in this environment")
    img = np.random.default_rng(2).uniform(size=(8, 6, 3)).astype(np.float32)
    path = str(tmp_path / "img.ppm")
    assert vio.write_ppm_native(path, img)
    with open(path, "rb") as f:
        assert f.readline().strip() == b"P6"
        assert f.readline().strip() == b"6 8"
        assert f.readline().strip() == b"255"
        data = f.read()
    assert len(data) == 8 * 6 * 3


def test_tiff_stack_roundtrip(tmp_path):
    from PIL import Image

    from tpuvr.io.volume import load_tiff_stack

    rng = np.random.default_rng(0)
    vol = rng.integers(0, 65535, size=(5, 8, 6), dtype=np.uint16)
    for z in range(vol.shape[0]):
        Image.fromarray(vol[z]).save(tmp_path / f"slice_{z:03d}.tif")
    out = load_tiff_stack(str(tmp_path / "slice_*.tif"))
    np.testing.assert_allclose(out, vol.astype(np.float32) / 65535.0,
                               atol=1e-7)
    out2 = load_tiff_stack(
        [str(tmp_path / f"slice_{z:03d}.tif") for z in range(5)],
        normalize=False,
    )
    np.testing.assert_allclose(out2, vol.astype(np.float32))
