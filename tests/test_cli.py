"""CLI tests (single-frame mode end to end at tiny sizes)."""

import numpy as np

from pathtrace_tpu.cli import build_parser, main
from pathtrace_tpu.io.exr import load_aovs_exr


def test_defaults_match_reference():
    args = build_parser().parse_args([])
    assert args.size == 512
    assert args.samples == 4
    assert args.threads_per_block == 8
    assert args.device == 0
    assert args.output == "output/out"
    assert (args.camera_x, args.camera_y, args.camera_z) == (50.0, 52.0, 295.6)
    assert (args.camera_yaw, args.camera_pitch) == (-90.0, 0.0)
    assert not args.denoising and not args.interactive and not args.nobitmap


def test_single_frame_render(tmp_path, capsys):
    out = tmp_path / "frame"
    rc = main([
        "--size", "32", "-s", "2", "--backend", "jnp",
        "-o", str(out), "--nobitmap",
    ])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "Render completed in" in captured
    aovs = load_aovs_exr(str(out) + ".exr")
    assert aovs["color"].shape == (32, 32, 3)
    assert np.isfinite(aovs["color"]).all()
    assert (aovs["depth"] > 0).all()


def test_single_frame_with_bitmaps(tmp_path):
    out = tmp_path / "bm"
    rc = main(["--size", "16", "-s", "1", "--backend", "jnp", "-o", str(out)])
    assert rc == 0
    assert (tmp_path / "bm_color.bmp").exists()
    assert (tmp_path / "bm_depth_var.bmp").exists()


def test_camera_flags_change_image(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    main(["--size", "16", "-s", "1", "--backend", "jnp", "--nobitmap", "-o", str(a)])
    main(["--size", "16", "-s", "1", "--backend", "jnp", "--nobitmap", "-o", str(b),
          "-x", "30", "--camera-yaw", "-70"])
    ia = load_aovs_exr(str(a) + ".exr")
    ib = load_aovs_exr(str(b) + ".exr")
    assert not np.array_equal(ia["depth"], ib["depth"])
