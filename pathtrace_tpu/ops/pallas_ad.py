"""Pallas full-parameter backward via in-kernel reverse-mode AD.

The companion to the hand-derived product-chain kernels (ops/pallas_grad.py,
which stay the fastest path for the diffuse/no-NEE MSE loss but only cover
emission/albedo): this kernel differentiates the ENTIRE in-kernel trajectory
— ``trace_tile_sample`` (ops/pallas_trace.py), a pure function of the 105
scene/camera scalars — with ``jax.vjp`` INSIDE the Pallas kernel body. The
AD happens at trace time, so Mosaic compiles one fused forward+reverse
sweep per sample; residuals live in VMEM/registers for exactly one sample.

Because the forward math is shared with the megakernel and mirrors the jnp
backend op-for-op on the same counter-based lattice, the resulting gradient
is the SAME detached-decision estimator as ``jax.grad`` of the jnp path
(ops/trace.py + grad.py): discrete decisions (hit selection, normal flip,
shadow visibility, RNG) are AD-constants; t, hit positions, normals, the
NEE Lambert term (reference ``pathtrace.cu:138-148``) and the bounce
directions all carry derivatives. This closes the round-1 gaps: NEE
configs, the glossy BRDF, and geometry/camera parameters are now
first-class on the Pallas backend (reference analog of the full parameter
surface: ``src/pathtrace.cu:138-148,181-184``, ``include/Camera.h:125-149``).

Cotangent contract: the kernel contracts the per-SAMPLE AOV contributions
(color rgb, bounce-0 normal xyz, bounce-0 albedo rgb, bounce-0 depth)
against a 10-channel per-pixel cotangent block; AOVs are spp-means, so
callers fold 1/spp into the cotangents.

Validation: tests/test_pallas_ad.py checks every parameter against jnp
reverse-mode AD on the same lattice, for diffuse, NEE and glossy configs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtrace_tpu.config import RenderConfig
from pathtrace_tpu.ops.pallas_trace import (
    _mix32,
    _pack_scene,
    _round_up,
    _uniform_01,
    _P_FRAME,
    _P_GOLD,
    _P_ROW,
    interpret_param,
    make_seed_array,
    read_cam_scalars,
    read_scene_scalars,
    tile_dims,
    trace_tile_sample,
)

GRAD_ROWS = 16  # >= num_spheres + 5 (eye row + 4 basis rows), sublane-aligned
GRAD_COLS = 128  # lane-aligned
# Per-sphere gradient column layout (matches _pack_scene order):
# 0 radius, 1-3 position, 4-6 emission, 7-9 color.
NUM_CT = 10  # cotangent channels: color 3, normal 3, albedo 3, depth 1


def _ad_grad_kernel(
    scene_ref,  # SMEM [N, 10]
    cam_ref,  # SMEM [5, 3]
    seed_ref,  # SMEM [5]: seed, frame, sample/row/col offsets
    ct_ref,  # VMEM [10, TH, TW] per-pixel cotangents (1/spp folded in)
    grad_ref,  # VMEM [GRAD_ROWS, GRAD_COLS] shared accumulator block
    *,
    num_spheres: int,
    spp: int,
    max_bounces: int,
    jitter: bool,
    push: float,
    tile_h: int,
    tile_w: int,
    height: int,
    width: int,
    nee_light_index: int | None,
    brdf: str,
):
    ti = pl.program_id(0)
    tj = pl.program_id(1)

    shape = (tile_h, tile_w)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + ti * tile_h + seed_ref[3]
    cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + tj * tile_w + seed_ref[4]
    rows = rows_i.astype(jnp.float32)
    cols = cols_i.astype(jnp.float32)
    pix_key = _mix32(rows_i * _P_GOLD ^ (cols_i * _P_ROW))
    base_key = _mix32(seed_ref[0] ^ _mix32(seed_ref[1] * _P_FRAME))
    spb = 5 if brdf == "glossy" else 2
    n_slots = jnp.int32(2 + spb * max_bounces)
    sample_offset = seed_ref[2]

    sc = read_scene_scalars(scene_ref, num_spheres)
    eye, basis = read_cam_scalars(cam_ref)
    # Tile-broadcast every parameter BEFORE the vjp: with [TH, TW]-shaped
    # inputs, every backward op stays elementwise and the parameter
    # cotangents come back as [TH, TW] partials. The previous scalar-input
    # formulation forced ~105 cross-lane tile reductions PER SAMPLE (the
    # pullback of scalar->tile broadcast is a full reduction) — measured at
    # 512^2 x 32 spp that was the difference between 1.1 and >2 Grays/s.
    # Per-pixel partials accumulate across the spp loop and are reduced
    # ONCE per tile after it.
    sc_t = tuple(tuple(jnp.full(shape, v) for v in row) for row in sc)
    eye_t = tuple(jnp.full(shape, v) for v in eye)
    basis_t = tuple(tuple(jnp.full(shape, v) for v in corner) for corner in basis)

    # Zero cotangents on out-of-image pad lanes.
    in_image = (rows_i < height) & (cols_i < width)
    ct = tuple(jnp.where(in_image, ct_ref[k], 0.0) for k in range(NUM_CT))
    ones = jnp.ones(shape, jnp.float32)

    def sample_body(s, carry):
        s_u = sample_offset + s

        def draw(slot):
            dk = _mix32(base_key ^ ((s_u * n_slots + jnp.int32(slot)) * _P_GOLD))
            return _uniform_01(pix_key, dk)

        def f(sc_, eye_, basis_):
            (
                col_r, col_g, col_b,
                fn_x, fn_y, fn_z,
                fa_r, fa_g, fa_b,
                f_d,
                _hit0, _active,
            ) = trace_tile_sample(
                sc_, eye_, basis_, rows, cols, draw,
                num_spheres=num_spheres,
                max_bounces=max_bounces,
                jitter=jitter,
                push=push,
                height=height,
                width=width,
                nee_light_index=nee_light_index,
                brdf=brdf,
            )
            # Per-pixel contraction: the cotangent of this [TH, TW] output
            # is all-ones, so d(total)/d(param tile) is the per-pixel
            # parameter gradient.
            return (
                ct[0] * col_r + ct[1] * col_g + ct[2] * col_b
                + ct[3] * fn_x + ct[4] * fn_y + ct[5] * fn_z
                + ct[6] * fa_r + ct[7] * fa_g + ct[8] * fa_b
                + ct[9] * f_d
            )

        _, vjp_fn = jax.vjp(f, sc_t, eye_t, basis_t)
        grads = vjp_fn(ones)
        flat = jax.tree_util.tree_leaves(grads)  # 105 x [TH, TW] partials
        # Kahan-compensated elementwise accumulation: per-sample gradients
        # of the geometry parameters cancel heavily (the r=1e5 wall
        # spheres), so a plain f32 running sum loses ~1% of the NET value
        # by spp 32. Kahan bounds the error at ~2 ulp of the largest
        # partial independent of spp (Mosaic has no f64; this is the
        # TPU-native equivalent).
        sums, comps = carry
        new_sums, new_comps = [], []
        for s_, c_, g in zip(sums, comps, flat):
            y = g - c_
            t = s_ + y
            new_comps.append((t - s_) - y)
            new_sums.append(t)
        return tuple(new_sums), tuple(new_comps)

    n_par = num_spheres * 10 + 3 + 12
    zeros_par = (jnp.zeros(shape, jnp.float32),) * n_par
    (acc_t, _comp) = jax.lax.fori_loop(
        0, spp, sample_body, (zeros_par, zeros_par), unroll=False
    )
    # One cross-lane reduction per parameter per TILE (not per sample).
    acc = tuple(jnp.sum(a) for a in acc_t)

    # Scalar grads -> dense block rows: sphere i in row i (10 cols), eye in
    # row N (3 cols), basis corner k in row N+1+k (3 cols). Dense masked
    # adds — scalar scatter into VMEM is slow on TPU. Each tile writes its
    # OWN partial block (summed pairwise by the host epilogue): geometry
    # gradients are heavy-cancellation sums, and sequentially accumulating
    # ~128 tiles in one f32 block was measurably noisier at 512^2 x 32 spp
    # than a tree reduction.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (GRAD_ROWS, GRAD_COLS), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (GRAD_ROWS, GRAD_COLS), 1)
    update = jnp.zeros((GRAD_ROWS, GRAD_COLS), jnp.float32)
    k = 0
    for i in range(num_spheres):
        for ch in range(10):
            update = update + jnp.where(
                (row_ids == i) & (col_ids == ch), acc[k], 0.0
            )
            k += 1
    for ch in range(3):  # d eye
        update = update + jnp.where(
            (row_ids == num_spheres) & (col_ids == ch), acc[k], 0.0
        )
        k += 1
    for corner in range(4):  # d basis
        for ch in range(3):
            update = update + jnp.where(
                (row_ids == num_spheres + 1 + corner) & (col_ids == ch),
                acc[k],
                0.0,
            )
            k += 1

    grad_ref[0] = update


def _launch_ad_grads(
    scene,
    cam,
    cfg: RenderConfig,
    seed_arr,
    ct_block,  # [10, local_h, W] cotangents w.r.t. per-SAMPLE AOVs
    *,
    spp: int,
    local_h: int,
    interpret: bool,
):
    """pallas_call plumbing -> raw [GRAD_ROWS, GRAD_COLS] gradient block."""
    tile_h, tile_w, pad_h, pad_w = tile_dims(cfg, local_h)
    if scene.num_objects + 5 > GRAD_ROWS:
        raise ValueError("scene too large for the gradient block layout")
    scene_params = _pack_scene(scene)
    basis = cam.eye_ray_basis(cfg.width, cfg.height)
    cam_params = jnp.concatenate([cam.position[None, :], basis], axis=0)
    ct = jnp.pad(
        ct_block,
        ((0, 0), (0, pad_h - ct_block.shape[1]), (0, pad_w - ct_block.shape[2])),
    )

    grid = (pad_h // tile_h, pad_w // tile_w)
    n_gw = grid[1]
    kernel = functools.partial(
        _ad_grad_kernel,
        num_spheres=scene.num_objects,
        spp=spp,
        max_bounces=cfg.max_bounces,
        jitter=cfg.resolved_jitter,
        push=cfg.push_ray_origin,
        tile_h=tile_h,
        tile_w=tile_w,
        height=cfg.height,
        width=cfg.width,
        nee_light_index=cfg.light_index if cfg.nee else None,
        brdf=cfg.brdf,
    )
    per_tile = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (NUM_CT, tile_h, tile_w),
                lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, GRAD_ROWS, GRAD_COLS),
            lambda i, j, n_gw=n_gw: (i * n_gw + j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (grid[0] * grid[1], GRAD_ROWS, GRAD_COLS), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # The 105-array accumulator carry + the vjp residuals exceed
            # the compiler's default 16 MiB scoped-vmem budget for tiles
            # wider than 256 lanes; the physical VMEM is larger — raise
            # the cap so tile width is a real tuning axis.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_param(interpret),
    )(scene_params, cam_params, seed_arr, ct)
    # Pairwise tree-sum across tiles (XLA reduce): log2(n_tiles) rounding
    # levels instead of the kernel-side sequential accumulation this
    # replaced (see kernel note on cancellation).
    return jnp.sum(per_tile, axis=0)


def grads_from_block(scene, cam, cfg: RenderConfig, block):
    """Raw gradient block -> (d_scene, d_camera) pytrees. The basis-corner
    cotangents pull back through ``Camera.eye_ray_basis`` (jnp AD on the
    host — exactly the chain the jnp backend differentiates), and the ray
    origin's eye contribution adds to the position gradient."""
    from pathtrace_tpu.scene import Scene

    n = scene.num_objects
    d_scene = Scene(
        radius=block[:n, 0],
        position=block[:n, 1:4],
        emission=block[:n, 4:7],
        color=block[:n, 7:10],
    )
    d_eye = block[n, 0:3]
    d_basis = block[n + 1 : n + 5, 0:3]
    _, vjp_cam = jax.vjp(lambda c: c.eye_ray_basis(cfg.width, cfg.height), cam)
    (d_cam,) = vjp_cam(d_basis)
    import dataclasses

    d_cam = dataclasses.replace(d_cam, position=d_cam.position + d_eye)
    return d_scene, d_cam


def pack_cotangents(cfg: RenderConfig, ct_color=None, ct_normal=None, ct_albedo=None, ct_depth=None, local_h=None, spp=None):
    """Per-pixel AOV cotangents (w.r.t. spp-MEAN AOVs) -> the kernel's
    [10, h, W] per-sample cotangent block (1/spp folded)."""
    h = cfg.height if local_h is None else local_h
    spp = cfg.spp if spp is None else spp
    zeros3 = jnp.zeros((3, h, cfg.width), jnp.float32)
    zeros1 = jnp.zeros((1, h, cfg.width), jnp.float32)

    def chan3(x):
        return zeros3 if x is None else jnp.moveaxis(x, -1, 0)

    def chan1(x):
        return zeros1 if x is None else x[None]

    block = jnp.concatenate(
        [chan3(ct_color), chan3(ct_normal), chan3(ct_albedo), chan1(ct_depth)],
        axis=0,
    )
    return block / spp


def ad_grads_block_slab(
    scene,
    cam,
    cfg: RenderConfig,
    frame,
    ct_block,
    row_offset=0,
    local_h: int | None = None,
    spp: int | None = None,
    sample_offset=0,
    interpret: bool = False,
):
    """Raw [GRAD_ROWS, GRAD_COLS] gradient block for an image slab / sample
    range (the shard_map hook — offsets may be traced mesh axis_index).
    ``ct_block``: [10, local_h, W] PER-SAMPLE cotangents (1/global-spp
    folded by the caller). Blocks from different shards sum (then psum)."""
    local_h = cfg.height if local_h is None else local_h
    spp = cfg.spp if spp is None else spp
    seed_arr = make_seed_array(cfg, frame, sample_offset, row_offset)
    return _launch_ad_grads(
        scene, cam, cfg, seed_arr, ct_block,
        spp=spp, local_h=local_h, interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def ad_aov_grads_pallas(
    scene,
    cam,
    cfg: RenderConfig,
    frame,
    ct_color=None,
    ct_normal=None,
    ct_albedo=None,
    ct_depth=None,
    interpret: bool = False,
):
    """(d_scene, d_camera) of L = sum over pixels of
    ct_color . color + ct_normal . normal + ct_albedo . albedo
    + ct_depth * depth, where the AOVs are the spp-mean channels.
    ALL parameters, ANY config (diffuse/NEE/glossy) — exact vs jnp AD."""
    ct_block = pack_cotangents(cfg, ct_color, ct_normal, ct_albedo, ct_depth)
    seed_arr = make_seed_array(cfg, frame)
    block = _launch_ad_grads(
        scene, cam, cfg, seed_arr, ct_block,
        spp=cfg.spp, local_h=cfg.height, interpret=interpret,
    )
    return grads_from_block(scene, cam, cfg, block)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def ad_loss_and_grads_pallas(
    scene, cam, cfg: RenderConfig, frame, target, interpret: bool = False
):
    """(loss, (d_scene, d_camera)) of the mean-squared pixel color loss —
    the all-Pallas general fwd+bwd: megakernel forward for the mean color,
    AD-kernel replay against the loss cotangent. Covers every config the
    renderer does (NEE, glossy, geometry+camera parameters); for
    diffuse/no-NEE the single-pass fused kernel (ops/pallas_grad.py) is
    faster and ``pallas_loss_and_grads`` dispatches there."""
    from pathtrace_tpu.ops.pallas_trace import render_color_sums_pallas

    color = render_color_sums_pallas(scene, cam, cfg, frame, interpret=interpret) / cfg.spp
    diff = color - target
    denom = cfg.height * cfg.width * 3
    loss = jnp.sum(diff * diff) / denom
    ct_color = 2.0 * diff / denom
    d_scene, d_cam = ad_aov_grads_pallas(
        scene, cam, cfg, frame, ct_color=ct_color, interpret=interpret
    )
    return loss, (d_scene, d_cam)
