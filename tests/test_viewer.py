"""Live browser viewer: HTTP round-trip drives the FrameStepper with real
WASD/TAB/mouse semantics (reference Window.h:133-169)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from pathtrace_tpu import Camera, RenderConfig, cornell_box
from pathtrace_tpu.io.bmp import encode_bmp, read_bmp
from pathtrace_tpu.interactive import FrameStepper
from pathtrace_tpu.viewer import ViewerServer


@pytest.fixture(scope="module")
def server():
    scene, cam = cornell_box(), Camera.create()
    cfg = RenderConfig(width=64, height=48, spp=1, max_bounces=2, backend="jnp")
    stepper = FrameStepper(scene, cam, cfg)
    srv = ViewerServer(stepper, host="127.0.0.1", port=0, logger=lambda *a: None)
    thread = threading.Thread(target=srv.httpd.serve_forever, daemon=True)
    thread.start()
    yield srv
    srv.httpd.shutdown()


def _post(srv, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/step",
        data=json.dumps(payload).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.read(), dict(resp.headers)


def test_index_page(server):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/", timeout=60
    ) as resp:
        page = resp.read().decode()
    assert "tpu-pathtrace" in page and "/step" in page
    assert 'width="64"' in page and 'height="48"' in page


def test_step_returns_frame_and_applies_input(server):
    before = np.asarray(server.stepper.camera.position).copy()
    body, headers = _post(server, {"keys": ["KeyW"], "dx": 0, "dy": 0})
    assert headers["Content-Type"] == "image/bmp"
    img = read_bmp_bytes(body)
    assert img.shape == (48, 64, 3)
    after = np.asarray(server.stepper.camera.position)
    assert not np.allclose(before, after), "W must move the camera"
    assert headers["X-Denoising"] == "off"
    _, headers2 = _post(server, {"tab": 1})
    assert headers2["X-Denoising"] == "on"
    _post(server, {"tab": 1})  # back off for other tests


def test_mouse_look_changes_yaw(server):
    yaw0 = float(server.stepper.camera.yaw)
    _post(server, {"dx": 50, "dy": 0})
    assert float(server.stepper.camera.yaw) != yaw0


def read_bmp_bytes(body: bytes) -> np.ndarray:
    import io as _io
    import struct

    assert body[:2] == b"BM"
    (offset,) = struct.unpack_from("<I", body, 10)
    _, w, h, _, bpp = struct.unpack_from("<IiiHH", body, 14)
    assert bpp == 24
    row = (w * 3 + 3) & ~3
    rows = np.frombuffer(body, np.uint8, count=row * abs(h), offset=offset)
    img = rows.reshape(abs(h), row)[:, : w * 3].reshape(abs(h), w, 3)[..., ::-1]
    return img[::-1] if h > 0 else img


def test_encode_bmp_roundtrip(tmp_path):
    rgb = (np.random.default_rng(0).uniform(size=(13, 17, 3)) * 255).astype(
        np.uint8
    )
    body = encode_bmp(rgb)
    path = tmp_path / "x.bmp"
    path.write_bytes(body)
    np.testing.assert_array_equal(read_bmp(str(path)), rgb)


def test_spp_header_and_progressive_refinement():
    """A still camera converges: X-Spp grows across idle steps and resets
    on motion (progressive mode is what `serve()` runs)."""
    scene, cam = cornell_box(), Camera.create()
    cfg = RenderConfig(width=32, height=32, spp=2, max_bounces=2, backend="jnp")
    stepper = FrameStepper(scene, cam, cfg, progressive=True)
    srv = ViewerServer(stepper, host="127.0.0.1", port=0, logger=lambda *a: None)
    thread = threading.Thread(target=srv.httpd.serve_forever, daemon=True)
    thread.start()
    try:
        _, h1 = _post(srv, {})
        _, h2 = _post(srv, {})
        assert int(h2["X-Spp"]) > int(h1["X-Spp"]) == 2
        _, h3 = _post(srv, {"keys": ["KeyW"]})
        assert int(h3["X-Spp"]) == 2  # motion resets accumulation
    finally:
        srv.httpd.shutdown()


def test_esc_shuts_down_server():
    """ESC quit parity (Window.h:152-153): the ESC step answers X-Quit and
    the server stops serving."""
    scene, cam = cornell_box(), Camera.create()
    cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=2, backend="jnp")
    stepper = FrameStepper(scene, cam, cfg)
    srv = ViewerServer(stepper, host="127.0.0.1", port=0, logger=lambda *a: None)
    thread = threading.Thread(target=srv.httpd.serve_forever, daemon=True)
    thread.start()
    _, headers = _post(srv, {"esc": 1})
    assert headers["X-Quit"] == "1"
    thread.join(timeout=10)
    assert not thread.is_alive(), "serve_forever must return after ESC"
    srv.httpd.server_close()
