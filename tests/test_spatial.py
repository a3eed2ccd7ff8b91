"""Halo-exchange spatially-sharded conv inference: exact vs full-frame."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.models.simple_cnn import SimpleDenoiseCNN, create_simple_state
from pathtrace_tpu.models.spatial import apply_layers_sharded, conv3x3_layer, denoise_spatially_sharded
from pathtrace_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def net():
    model, params, _, _ = create_simple_state(jax.random.key(0), (32, 64, 14))
    return model, params


@pytest.mark.parametrize("tiles", [2, 4, 8])
def test_sharded_equals_full_frame(net, tiles):
    model, params = net
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 64, 14)), jnp.float32)
    full = model.apply({"params": params}, x[None])[0]
    mesh = make_mesh(tiles=tiles, samples=8 // tiles)
    out = denoise_spatially_sharded(x, mesh, params=params, model=model)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(full), rtol=1e-5, atol=1e-5
    )


def test_one_shot_input_halo_would_diverge(net):
    """Applying the WHOLE net to an input halo (instead of per-layer
    exchange) must differ at the image boundary — guards against the
    equality test passing vacuously and documents why the exchange is
    per-layer (layer(0) != 0 with bias+ReLU)."""
    model, params = net
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(64, 64, 14)), jnp.float32)
    full = model.apply({"params": params}, x[None])[0]
    mesh = make_mesh(tiles=4, samples=2)

    whole_net = [lambda img: model.apply({"params": params}, img[None])[0]]
    out = apply_layers_sharded(whole_net, x, mesh, halo=5)
    assert not np.allclose(np.asarray(out), np.asarray(full), atol=1e-5)


def test_indivisible_height_raises(net):
    model, params = net
    mesh = make_mesh(tiles=8, samples=1)
    with pytest.raises(ValueError, match="not divisible"):
        denoise_spatially_sharded(
            jnp.zeros((60, 64, 14)), mesh, params=params, model=model
        )


# ---- flagship FPN DenoiseCNN (VERDICT r2 item #4) -------------------------


@pytest.fixture(scope="module")
def fpn_net():
    from pathtrace_tpu.models.denoise_cnn import init_variables

    model, variables = init_variables(jax.random.key(2), 64, 64)
    # Randomize the BatchNorm running stats so the sharded BN path is
    # exercised with non-trivial affine terms (fresh init is mean=0/var=1).
    rng = np.random.default_rng(3)
    stats = jax.tree.map(
        lambda a: jnp.asarray(
            np.abs(rng.normal(1.0, 0.3, a.shape)) + 0.1, a.dtype
        ),
        variables["batch_stats"],
    )
    return model, {"params": variables["params"], "batch_stats": stats}


@pytest.mark.parametrize("tiles", [2, 4, 8])
def test_fpn_sharded_equals_full_frame(fpn_net, tiles):
    """The hybrid row-sharded DenoiseCNN (halo encoder head, gathered
    core, sharded top-down tail) equals full-frame inference."""
    from pathtrace_tpu.models.fpn_spatial import denoise_fpn_sharded

    model, variables = fpn_net
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(size=(64, 64, 14)), jnp.float32)
    full = model.apply(variables, x[None], train=False)[0]
    mesh = make_mesh(tiles=tiles, samples=8 // tiles)
    out = denoise_fpn_sharded(x, mesh, variables, model=model)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(full), rtol=1e-5, atol=2e-5
    )


def test_fpn_constraint_raises(fpn_net):
    from pathtrace_tpu.models.fpn_spatial import denoise_fpn_sharded

    model, variables = fpn_net
    mesh = make_mesh(tiles=8, samples=1)
    with pytest.raises(ValueError, match="needs"):
        denoise_fpn_sharded(jnp.zeros((48, 64, 14)), mesh, variables, model=model)
