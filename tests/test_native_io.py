"""Native (C++) IO vs the pure-Python format oracle: cross-compatibility."""

import numpy as np
import pytest

from pathtrace_tpu.io import native
from pathtrace_tpu.io.bmp import read_bmp, write_bmp
from pathtrace_tpu.io.exr import read_exr, write_exr

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)"
)


def chans(seed=0, h=33, w=47):
    rng = np.random.default_rng(seed)
    return {
        "B.chan": rng.normal(size=(h, w)).astype(np.float32),
        "A.chan": rng.uniform(size=(h, w)).astype(np.float32),
        "C.flat": np.full((h, w), 0.25, np.float32),  # compressible
    }


@pytest.mark.parametrize("compression", ["none", "zips", "zip"])
def test_native_write_python_read(tmp_path, compression):
    c = chans()
    path = tmp_path / "n.exr"
    assert native.write_exr_native(path, c, compression=compression)
    back = read_exr(path)
    assert set(back) == set(c)
    for k in c:
        np.testing.assert_array_equal(back[k], c[k])


@pytest.mark.parametrize("compression", ["none", "zips", "zip"])
def test_python_write_native_read(tmp_path, compression):
    c = chans(seed=1)
    path = tmp_path / "p.exr"
    write_exr(path, c, compression=compression, backend="python")
    back = native.read_exr_native(path)
    assert set(back) == set(c)
    for k in c:
        np.testing.assert_array_equal(back[k], c[k])


def test_native_roundtrip_tall_image(tmp_path):
    # > 16 scanlines exercises multi-chunk ZIP.
    c = {"X": np.random.default_rng(2).normal(size=(100, 64)).astype(np.float32)}
    path = tmp_path / "tall.exr"
    assert native.write_exr_native(path, c, compression="zip")
    back = native.read_exr_native(path)
    np.testing.assert_array_equal(back["X"], c["X"])


def test_native_bmp_matches_python(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(21, 37, 3), dtype=np.uint8)
    native_path = tmp_path / "n.bmp"
    py_path = tmp_path / "p.bmp"
    assert native.write_bmp_native(native_path, img)
    write_bmp(py_path, img, backend="python")
    assert native_path.read_bytes() == py_path.read_bytes()
    np.testing.assert_array_equal(read_bmp(native_path), img)


def test_native_error_on_missing_file():
    with pytest.raises(IOError):
        native.read_exr_native("/nonexistent/x.exr")
