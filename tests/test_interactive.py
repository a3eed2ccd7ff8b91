"""Interactive frame-loop + embedded denoiser inference tests."""

import os

import jax
import numpy as np

from pathtrace_tpu import Camera, RenderConfig, cornell_box
from pathtrace_tpu.interactive import FrameStepper, run_interactive, to_display
from pathtrace_tpu.models.denoise_cnn import DenoiseCNN
from pathtrace_tpu.train import create_state, save_checkpoint

CFG = RenderConfig(width=32, height=32, spp=1, backend="jnp")


def test_to_display_clamps():
    import jax.numpy as jnp

    x = jnp.asarray([[[-0.5, 0.5, 2.0]]])
    out = np.asarray(to_display(x))
    np.testing.assert_array_equal(out[0, 0], [0, 127, 255])


def test_stepper_renders_and_moves():
    stepper = FrameStepper(cornell_box(), Camera.create(), CFG)
    a = stepper.step()
    assert a.shape == (32, 32, 3) and a.dtype == np.uint8
    stepper.move("forward", 0.1)
    stepper.look(5.0, 0.0)
    b = stepper.step()
    assert stepper.frame == 2
    assert not np.array_equal(a, b)  # camera moved
    assert np.isfinite(stepper.last_ms)


def test_toggle_denoising_with_checkpoint(tmp_path):
    """TAB semantics: toggling switches the display path through the CNN."""
    model = DenoiseCNN(widths=(8, 16))
    state = create_state(jax.random.key(0), model, (32, 32, 14))
    save_checkpoint(str(tmp_path), state, model)

    stepper = FrameStepper(
        cornell_box(), Camera.create(), CFG, denoising=False,
        checkpoint=str(tmp_path),
    )
    raw = stepper.step()
    stepper.toggle_denoising()
    assert stepper.denoising
    denoised = stepper.step()
    assert denoised.shape == raw.shape
    assert not np.array_equal(raw, denoised)


def test_run_interactive_writes_frames(tmp_path, capsys):
    out_dir = str(tmp_path / "frames")
    stepper = run_interactive(
        cornell_box(), Camera.create(), CFG, max_frames=3, out_dir=out_dir
    )
    assert stepper.frame == 3
    files = sorted(os.listdir(out_dir))
    assert files == ["frame_00000.bmp", "frame_00001.bmp", "frame_00002.bmp"]
    assert "fps" in capsys.readouterr().out


def test_progressive_accumulate_reset_state_machine():
    """Progressive mode: idle steps accumulate spp on the SAME lattice
    (exactly a monolithic higher-spp render at the reset frame), any
    camera motion restarts accumulation, TAB does not."""
    from pathtrace_tpu.render import render_aovs

    cfg = RenderConfig(width=32, height=32, spp=2, backend="jnp")
    stepper = FrameStepper(
        cornell_box(), Camera.create(), cfg, progressive=True
    )
    stepper.step()
    assert stepper.spp_accumulated == 2
    stepper.step()
    assert stepper.spp_accumulated == 4
    stepper.step()
    assert stepper.spp_accumulated == 8

    # Accumulated partials == one monolithic 8-spp render of frame 0.
    import dataclasses

    want = render_aovs(
        cornell_box(),
        Camera.create(),
        dataclasses.replace(cfg, spp=8),
        frame=0,
    )
    got = stepper._prog.aovs()
    np.testing.assert_allclose(
        np.asarray(got["color"]), np.asarray(want["color"]), rtol=1e-5, atol=1e-6
    )

    # TAB must NOT reset the accumulator...
    stepper.toggle_denoising()
    stepper.step()
    assert stepper.spp_accumulated > 8
    # ...but motion must.
    stepper.move("forward", 0.1)
    stepper.step()
    assert stepper.spp_accumulated == 2
    stepper.look(3.0, 0.0)
    stepper.step()
    assert stepper.spp_accumulated == 2


def test_progressive_max_spp_cap():
    cfg = RenderConfig(width=16, height=16, spp=2, backend="jnp")
    stepper = FrameStepper(
        cornell_box(), Camera.create(), cfg, progressive=True, max_spp=6
    )
    for _ in range(5):
        stepper.step()
    assert stepper.spp_accumulated == 6  # capped: 2 + 2 + 2, then idle


def test_progressive_denoise_fades_to_accumulation(tmp_path):
    """Denoise-while-converging: with a checkpoint + progressive mode the
    displayed frame blends CNN output against the accumulation with a
    variance-driven weight — at low spp it differs from the raw
    accumulation (CNN active), and as the accumulated mean's std falls
    well below denoise_fade_std the display converges to the raw
    accumulation (CNN faded out)."""
    from pathtrace_tpu.interactive import to_display

    model = DenoiseCNN(widths=(8, 16))
    state = create_state(jax.random.key(0), model, (32, 32, 14))
    save_checkpoint(str(tmp_path), state, model)

    cfg = RenderConfig(width=32, height=32, spp=2, backend="jnp")
    stepper = FrameStepper(
        cornell_box(), Camera.create(), cfg, denoising=True,
        checkpoint=str(tmp_path), progressive=True,
    )
    early = stepper.step()  # 2 spp: CNN fully active on noisy pixels
    raw_early = np.asarray(to_display(stepper._prog.aovs()["color"]))
    assert not np.array_equal(early, raw_early)

    # Converge far past the fade scale, then compare display vs raw. The
    # mean difference keeps a tail from genuinely-still-noisy pixels
    # (indirect-light fireflies keep the CNN active BY DESIGN — the weight
    # is per-pixel variance, not global spp), so gate the mean at a
    # fraction of the early gap and the median near zero.
    stepper.max_spp = 16384
    for _ in range(15):
        out = stepper.step()
    raw = np.asarray(to_display(stepper._prog.aovs()["color"]))
    late_diff = np.abs(out.astype(int) - raw.astype(int))
    early_diff = np.abs(early.astype(int) - raw_early.astype(int)).mean()
    assert late_diff.mean() < 0.35 * early_diff

    # And the displayed frame IS the documented blend, exactly:
    # w = clip(sqrt(var/n)/fade_std, 0, 1) per pixel.
    import jax.numpy as jnp

    from pathtrace_tpu.models.infer import denoise_channels
    from pathtrace_tpu.render import pack_channels

    aovs = stepper._prog.aovs()
    den = denoise_channels(pack_channels(aovs), str(tmp_path))
    n = float(stepper._prog.samples_done)
    w = np.clip(
        np.maximum(
            np.sqrt(np.maximum(np.asarray(aovs["color_var"]), 0.0) / n)
            / stepper.denoise_fade_std,
            stepper.denoise_fade_spp / n,
        ), 0.0, 1.0,
    )[..., None]
    want = np.asarray(to_display(
        jnp.asarray(w * np.asarray(den) + (1 - w) * np.asarray(aovs["color"]))
    ))
    np.testing.assert_array_equal(out, want)
