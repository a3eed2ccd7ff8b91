"""EXR/BMP IO tests: roundtrips, reference layer naming, loader parity."""

import numpy as np
import pytest

from pathtrace_tpu.io.bmp import read_bmp, save_aovs_bitmaps, write_bmp
from pathtrace_tpu.io.exr import (
    load_aovs_exr,
    read_exr,
    save_aovs_exr,
    write_exr,
)


def random_aovs(rng, h=24, w=32):
    return {
        "color": rng.uniform(size=(h, w, 3)).astype(np.float32),
        "normal": rng.normal(size=(h, w, 3)).astype(np.float32),
        "albedo": rng.uniform(size=(h, w, 3)).astype(np.float32),
        "depth": rng.uniform(1, 500, size=(h, w)).astype(np.float32),
        "color_var": rng.uniform(size=(h, w)).astype(np.float32),
        "normal_var": rng.uniform(size=(h, w)).astype(np.float32),
        "albedo_var": rng.uniform(size=(h, w)).astype(np.float32),
        "depth_var": rng.uniform(size=(h, w)).astype(np.float32),
    }


@pytest.mark.parametrize("compression", ["none", "zips", "zip"])
def test_exr_roundtrip(tmp_path, compression):
    rng = np.random.default_rng(0)
    chans = {
        "A": rng.normal(size=(37, 51)).astype(np.float32),
        "B.x": rng.normal(size=(37, 51)).astype(np.float32),
    }
    path = tmp_path / "t.exr"
    write_exr(path, chans, compression=compression)
    back = read_exr(path)
    assert set(back) == set(chans)
    for k in chans:
        np.testing.assert_array_equal(back[k], chans[k])


def test_exr_incompressible_chunk_fallback(tmp_path):
    # Random bytes don't compress; the writer must store raw per spec.
    rng = np.random.default_rng(1)
    chans = {"C": rng.normal(size=(40, 64)).astype(np.float32)}
    path = tmp_path / "raw.exr"
    write_exr(path, chans, compression="zip")
    np.testing.assert_array_equal(read_exr(path)["C"], chans["C"])


def test_aovs_exr_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    aovs = random_aovs(rng)
    path = tmp_path / "aovs.exr"
    save_aovs_exr(path, aovs)
    back = load_aovs_exr(path)
    for k in aovs:
        np.testing.assert_array_equal(back[k], aovs[k])


def test_aovs_exr_channel_names(tmp_path):
    """Exact reference channel naming (OutputBuffer.h:166-188) in
    spec-compliant alphabetical order."""
    rng = np.random.default_rng(3)
    save_aovs_exr(tmp_path / "n.exr", random_aovs(rng))
    names = list(read_exr(tmp_path / "n.exr").keys())
    assert names == sorted(names)
    assert set(names) == {
        "Albedo.B", "Albedo.G", "Albedo.R", "AlbedoVar.Z",
        "Color.B", "Color.G", "Color.R", "ColorVar.Z",
        "Depth.Z", "DepthVar.Z",
        "Normal.X", "Normal.Y", "Normal.Z", "NormalVar.Z",
    }


def test_bmp_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    write_bmp(tmp_path / "t.bmp", img)
    np.testing.assert_array_equal(read_bmp(tmp_path / "t.bmp"), img)


def test_bmp_float_clamping(tmp_path):
    img = np.array([[[-1.0, 0.5, 2.0]]], np.float32)
    write_bmp(tmp_path / "c.bmp", img)
    np.testing.assert_array_equal(read_bmp(tmp_path / "c.bmp")[0, 0], [0, 127, 255])


def test_save_aovs_bitmaps(tmp_path):
    rng = np.random.default_rng(5)
    save_aovs_bitmaps(str(tmp_path / "out"), random_aovs(rng))
    for suffix in ("color", "normal", "albedo", "depth",
                   "color_var", "normal_var", "albedo_var", "depth_var"):
        assert (tmp_path / f"out_{suffix}.bmp").exists()
