"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates that the ICI halo-exchange pipeline reproduces the single-device
oracle bit-for-bit (up to fp reassociation) for several mesh shapes, and that
gradients flow through ``ppermute`` transposes (SURVEY.md §4 distributed-test
implication).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raymarchdenoisercuda_tpu.config import SVGFParams
from raymarchdenoisercuda_tpu.ops.atrous import svgf_spatial_ref
from raymarchdenoisercuda_tpu.parallel.mesh import make_mesh, factor2
from raymarchdenoisercuda_tpu.parallel.sharded import svgf_spatial_sharded

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _scene(rng, H=64, W=64):
    color = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    variance = jnp.asarray((0.02 * rng.random((H, W))).astype(np.float32))
    n = rng.standard_normal((3, H, W)).astype(np.float32)
    n[2] += 3.0
    n /= np.sqrt((n ** 2).sum(0, keepdims=True))
    depth = jnp.asarray((0.3 + 0.5 * rng.random((H, W))).astype(np.float32))
    return color, variance, jnp.asarray(n), depth


def test_factor2():
    assert factor2(8) == (2, 4)
    assert factor2(16) == (4, 4)
    assert factor2(7) == (1, 7)


def test_make_mesh_shapes():
    m = make_mesh(8)
    assert m.devices.shape == (1, 2, 4)
    m2 = make_mesh(8, data=2)
    assert m2.devices.shape == (2, 2, 2)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_spatial_matches_oracle(rng, n_dev):
    color, variance, normal, depth = _scene(rng)
    params = SVGFParams(iterations=3)
    want_c, want_v = svgf_spatial_ref(color, variance, normal, depth,
                                      params=params, detach_weights=True)
    mesh = make_mesh(n_dev)
    got_c, got_v = svgf_spatial_sharded(color, variance, normal, depth,
                                        mesh=mesh, params=params)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=5e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=5e-5, atol=1e-6)


def test_sharded_deep_levels_halo_exceeds_tile(rng):
    """Level-4 halo (32 px) larger than the 16-px local tile of an 8-way mesh:
    exchange must still be correct (multi-hop halos degenerate to zeros only
    outside the image)."""
    color, variance, normal, depth = _scene(rng, 64, 64)
    params = SVGFParams(iterations=5)  # level 4 halo: 2 * 2^4 = 32 px
    want_c, _ = svgf_spatial_ref(color, variance, normal, depth,
                                 params=params, detach_weights=True)
    mesh = make_mesh(8)  # 2x4 spatial: 32x16 tiles -> halo 32 > 16-px x-tiles
    got_c, _ = svgf_spatial_sharded(color, variance, normal, depth,
                                    mesh=mesh, params=params)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=5e-5, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_nondivisible_500x500_matches_oracle(rng, n_dev):
    """Pad-and-mask wrapper (VERDICT r3 weak #3): the reference's own
    500×500 Cornell fixture shape (render/cornell/1/) shards on meshes
    whose tile grids don't divide it — the image is padded to divisible
    tiles, global-coordinate masks keep true-border semantics, outputs are
    cropped.  Results must equal the unsharded oracle."""
    color, variance, normal, depth = _scene(rng, 500, 500)
    params = SVGFParams(iterations=3)
    want_c, want_v = svgf_spatial_ref(color, variance, normal, depth,
                                      params=params, detach_weights=True)
    mesh = make_mesh(n_dev)
    got_c, got_v = svgf_spatial_sharded(color, variance, normal, depth,
                                        mesh=mesh, params=params)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=5e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=5e-5, atol=1e-6)


@pytest.mark.slow
def test_sharded_nondivisible_prime_shape_matches_oracle(rng):
    """Prime-ish global shape (509×763) on an asymmetric 2×4 mesh: tiles pad
    255×191 -> wrapper rounds to 510×764 and crops."""
    color, variance, normal, depth = _scene(rng, 509, 763)
    params = SVGFParams(iterations=2)
    want_c, want_v = svgf_spatial_ref(color, variance, normal, depth,
                                      params=params, detach_weights=True)
    mesh = make_mesh(8)
    got_c, got_v = svgf_spatial_sharded(color, variance, normal, depth,
                                        mesh=mesh, params=params)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=5e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=5e-5, atol=1e-6)


def test_sharded_nondivisible_pallas_kernels(rng):
    """Pad-and-mask through the Pallas tile kernels (interpret): the padded
    tiles' global masks must drop pad pixels exactly like the oracle's
    dropped taps."""
    color, variance, normal, depth = _scene(rng, 61, 93)
    params = SVGFParams(iterations=2)
    want_c, want_v = svgf_spatial_ref(color, variance, normal, depth,
                                      params=params, detach_weights=True)
    mesh = make_mesh(4)
    got_c, got_v = svgf_spatial_sharded(color, variance, normal, depth,
                                        mesh=mesh, params=params,
                                        impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=5e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=5e-5, atol=1e-6)


def test_sharded_gradients_match_oracle(rng):
    color, variance, normal, depth = _scene(rng, 32, 32)
    params = SVGFParams(iterations=2)
    mesh = make_mesh(4)

    def loss_ref(c):
        oc, _ = svgf_spatial_ref(c, variance, normal, depth, params=params,
                                 detach_weights=True)
        return jnp.sum(oc ** 2)

    def loss_shard(c):
        oc, _ = svgf_spatial_sharded(c, variance, normal, depth, mesh=mesh,
                                     params=params)
        return jnp.sum(oc ** 2)

    g_ref = jax.grad(loss_ref)(color)
    g_shard = jax.grad(loss_shard)(color)
    np.testing.assert_allclose(np.asarray(g_shard), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("n_dev", [4, 8])
def test_sharded_pallas_kernels_match_oracle(rng, n_dev):
    """The Pallas band kernels running INSIDE shard_map (halo-exchanged
    tiles + global-coordinate masks via SMEM tile origins) reproduce the
    single-device oracle (VERDICT round-1 next-step #5)."""
    color, variance, normal, depth = _scene(rng)
    params = SVGFParams(iterations=3)
    want_c, want_v = svgf_spatial_ref(color, variance, normal, depth,
                                      params=params, detach_weights=True)
    mesh = make_mesh(n_dev)
    got_c, got_v = svgf_spatial_sharded(color, variance, normal, depth,
                                        mesh=mesh, params=params,
                                        impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=5e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=5e-5, atol=1e-6)


def test_sharded_pallas_gradients_match_oracle(rng):
    """Adjoint of the tile kernels + ppermute transpose routes halo
    gradients across devices identically to the oracle."""
    color, variance, normal, depth = _scene(rng, 48, 48)
    params = SVGFParams(iterations=2)
    mesh = make_mesh(4)

    def loss_ref(c):
        oc, _ = svgf_spatial_ref(c, variance, normal, depth, params=params,
                                 detach_weights=True)
        return jnp.sum(oc ** 2)

    def loss_shard(c):
        oc, _ = svgf_spatial_sharded(c, variance, normal, depth, mesh=mesh,
                                     params=params, impl="pallas",
                                     interpret=True)
        return jnp.sum(oc ** 2)

    g_ref = jax.grad(loss_ref)(color)
    g_shard = jax.grad(loss_shard)(color)
    np.testing.assert_allclose(np.asarray(g_shard), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("n_dev,iters", [(4, 2), (8, 3)])
def test_sharded_stored_bwd_matches_oracle(rng, n_dev, iters):
    """Margin-writing stored-weight canvas adjoint (VERDICT r3 next-step #1):
    the sharded chained sweep with bwd_impl="stored" matches the oracle's
    forward at fp-reassociation level and its gradients within the bf16
    stored-weight quantization (≤1e-3 relative), with halo gradients routed
    over the refresh transposes."""
    from jax import shard_map
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        svgf_spatial_local, PLANE, PLANES)

    H = W = 48
    color, variance, normal, depth = _scene(rng, H, W)
    params = SVGFParams(iterations=iters)
    mesh = make_mesh(n_dev)

    def run(c, v):
        fn = shard_map(
            lambda c, v, n, d: svgf_spatial_local(
                c, v, n, d, H, W, params=params, impl="pallas",
                interpret=True, bwd_impl="stored"),
            mesh=mesh, in_specs=(PLANES, PLANE, PLANES, PLANE),
            out_specs=(PLANES, PLANE), check_vma=False)
        return fn(c, v, normal, depth)

    want_c, want_v = svgf_spatial_ref(color, variance, normal, depth,
                                      params=params, detach_weights=True)
    got_c, got_v = run(color, variance)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=5e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=5e-5, atol=1e-5)

    def loss_ref(c, v):
        oc, ov = svgf_spatial_ref(c, v, normal, depth, params=params,
                                  detach_weights=True)
        return jnp.sum(oc ** 2) + jnp.sum(ov)

    def loss_st(c, v):
        oc, ov = run(c, v)
        return jnp.sum(oc ** 2) + jnp.sum(ov)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(color, variance)
    g_st = jax.grad(loss_st, argnums=(0, 1))(color, variance)
    for name, a, b in zip(["d_color", "d_variance"], g_ref, g_st):
        scale = float(jnp.abs(a).max())
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=1.5e-3 * scale, err_msg=name)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_headline_mode_r1_lq3(rng, n_dev):
    """Round-5 verdict #1: the quality-gated HEADLINE filter mode (radius-1
    taps + luminance-only weights at levels >= 3, the bench default) runs on
    the sharded canvas-chained path with the margin-writing stored adjoint —
    forward parity vs the single-device oracle, gradients within the bf16
    stored-weight quantization, halos routed over the refresh transposes."""
    from jax import shard_map
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        svgf_spatial_local, PLANE, PLANES)

    H = W = 64
    color, variance, normal, depth = _scene(rng, H, W)
    params = SVGFParams(iterations=5, radius=1, luma_only_from=3)
    mesh = make_mesh(n_dev)

    def run(c, v):
        fn = shard_map(
            lambda c, v, n, d: svgf_spatial_local(
                c, v, n, d, H, W, params=params, impl="pallas",
                interpret=True, bwd_impl="stored"),
            mesh=mesh, in_specs=(PLANES, PLANE, PLANES, PLANE),
            out_specs=(PLANES, PLANE), check_vma=False)
        return fn(c, v, normal, depth)

    want_c, want_v = svgf_spatial_ref(color, variance, normal, depth,
                                      params=params, detach_weights=True)
    got_c, got_v = run(color, variance)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=5e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=5e-5, atol=1e-5)

    def loss_ref(c, v):
        oc, ov = svgf_spatial_ref(c, v, normal, depth, params=params,
                                  detach_weights=True)
        return jnp.sum(oc ** 2) + jnp.sum(ov)

    def loss_st(c, v):
        oc, ov = run(c, v)
        return jnp.sum(oc ** 2) + jnp.sum(ov)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(color, variance)
    g_st = jax.grad(loss_st, argnums=(0, 1))(color, variance)
    for name, a, b in zip(["d_color", "d_variance"], g_ref, g_st):
        scale = float(jnp.abs(a).max())
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=1.5e-3 * scale, err_msg=name)


def test_sharded_oracle_luma_mode_matches_ref(rng):
    """The sharded ORACLE path also runs luma_only_from (tile-local mirror of
    atrous_level_ref's luma branch + global masks)."""
    color, variance, normal, depth = _scene(rng, 64, 64)
    params = SVGFParams(iterations=5, radius=1, luma_only_from=3)
    want_c, want_v = svgf_spatial_ref(color, variance, normal, depth,
                                      params=params, detach_weights=True)
    mesh = make_mesh(8)
    got_c, got_v = svgf_spatial_sharded(color, variance, normal, depth,
                                        mesh=mesh, params=params)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=5e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=5e-5, atol=1e-6)


def test_sharded_luma_mode_guards(rng):
    """luma_only_from raises loudly where unsupported: the per-level
    multi-hop (halo>tile) kernel fallback and the recompute chained adjoint."""
    from jax import shard_map
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        svgf_spatial_local, svgf_spatial_chained_local, PLANE, PLANES)

    H = W = 32  # 8-dev mesh -> 16x8 tiles; r1i5 halo 16 > 8 -> multi-hop
    color, variance, normal, depth = _scene(rng, H, W)
    params = SVGFParams(iterations=5, radius=1, luma_only_from=3)
    mesh = make_mesh(8)

    def run_levels(c):
        fn = shard_map(
            lambda c, v, n, d: svgf_spatial_local(
                c, v, n, d, H, W, params=params, impl="pallas",
                interpret=True),
            mesh=mesh, in_specs=(PLANES, PLANE, PLANES, PLANE),
            out_specs=(PLANES, PLANE), check_vma=False)
        return fn(c, variance, normal, depth)

    with pytest.raises(NotImplementedError, match="luma_only_from"):
        run_levels(color)

    def run_recompute(c):
        fn = shard_map(
            lambda c, v, n, d: svgf_spatial_chained_local(
                c, v, n, d, 64, 64, params=params, interpret=True,
                bwd_impl="recompute"),
            mesh=make_mesh(4), in_specs=(PLANES, PLANE, PLANES, PLANE),
            out_specs=(PLANES, PLANE), check_vma=False)
        c64 = jnp.tile(c, (1, 2, 2))
        return fn(c64, jnp.tile(variance, (2, 2)),
                  jnp.tile(normal, (1, 2, 2)), jnp.tile(depth, (2, 2)))

    with pytest.raises(ValueError, match="bwd_impl='stored'"):
        run_recompute(color)


def test_history_carry_type_errors(rng):
    """ADVICE r4: canvas-form pipelines reject a History pytree carry with a
    targeted message (not an opaque shard_map in_specs mismatch), and
    init_history_canvas rejects non-mesh-divisible global shapes."""
    from raymarchdenoisercuda_tpu.config import CameraParams, RaymarchParams
    from raymarchdenoisercuda_tpu.gbuffer import History
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        make_sharded_pipeline, init_history_canvas)

    H = W = 32
    mesh = make_mesh(4)
    sv = SVGFParams(iterations=2, max_motion=3)
    f_p = make_sharded_pipeline(
        mesh, H, W, impl="pallas", interpret=True,
        cam_cfg=CameraParams(width=W, height=H),
        rm_params=RaymarchParams(max_steps=8, shadow_steps=4),
        svgf_params=sv)
    from raymarchdenoisercuda_tpu.ops.raymarch import (cornell_scene,
                                                       cornell_camera)
    scene, cam = cornell_scene(), cornell_camera()
    with pytest.raises(TypeError, match="init_history_canvas"):
        f_p(scene, cam, cam, History.zeros(H, W), jax.random.PRNGKey(0))

    with pytest.raises(ValueError, match="mesh-divisible"):
        init_history_canvas(mesh, 33, 32, sv)


@pytest.mark.slow
def test_sharded_train_step_ad_temporal_kernel(rng):
    """make_sharded_train_step(temporal_impl="pallas_ad"): one optimizer step
    through raymarch -> differentiable temporal kernel -> SVGF inside
    shard_map — finite loss, albedo actually updated (interpret mode)."""
    import optax
    from raymarchdenoisercuda_tpu.config import CameraParams, RaymarchParams
    from raymarchdenoisercuda_tpu.gbuffer import History
    from raymarchdenoisercuda_tpu.ops.raymarch import (cornell_scene,
                                                       cornell_camera)
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        make_sharded_train_step)

    H = W = 32
    mesh = make_mesh(4)
    scene = cornell_scene()
    cfg = CameraParams(width=W, height=H)
    rm = RaymarchParams(max_steps=8, shadow_steps=4)
    sv = SVGFParams(iterations=2, max_motion=3)
    target = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    optimizer = optax.adam(1e-2)

    step = make_sharded_train_step(
        mesh, scene, cornell_camera(), target, optimizer,
        cam_cfg=cfg, rm_params=rm, svgf_params=sv,
        temporal_impl="pallas_ad", interpret=True)

    albedo = scene.materials.albedo
    opt_state = optimizer.init(albedo)
    hist = History.zeros(H, W)
    key = jax.random.PRNGKey(0)
    # frame 1 warms history; frame 2 differentiates through reprojection
    albedo1, opt_state, hist, key, loss1 = step(albedo, opt_state, hist, key)
    albedo2, opt_state, hist, key, loss2 = step(albedo1, opt_state, hist, key)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert np.abs(np.asarray(albedo2) - np.asarray(albedo1)).max() > 0


@pytest.mark.slow
def test_temporal_canvas_two_frames_cross_tile_motion(rng):
    """Canvas-form temporal carry across frames: frame 1 writes a canvas
    with STALE margins; frame 2's margin refresh must pull the neighbors'
    frame-1 centers before the gather, so reprojection across tile borders
    (motion up to max_motion) matches the single-device oracle on both
    frames."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pspec
    from raymarchdenoisercuda_tpu.gbuffer import GBuffer, History
    from raymarchdenoisercuda_tpu.ops.temporal import temporal_accumulate
    from raymarchdenoisercuda_tpu.ops.pallas.temporal_tpu import (
        hist_canvas_geometry)
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        temporal_accumulate_canvas_local, init_history_canvas,
        PLANE, PLANES)

    H = W = 48
    params = SVGFParams(max_motion=4)
    mesh = make_mesh(4)
    th, tw = H // 2, W // 2
    mh, CH, CLm = hist_canvas_geometry(th, tw, params)[:3]

    def frame(seed, mag):
        color, variance, normal, depth = _scene(rng, H, W)
        motion = jnp.asarray(
            (2.0 * np.random.default_rng(seed).random((2, H, W)) - 1.0)
            .astype(np.float32) * mag)
        return GBuffer(render=color, albedo=None, normal=normal, depth=depth,
                       motion=motion)

    g1 = frame(1, 3.5)
    g2 = frame(2, 3.9).replace(normal=g1.normal, depth=g1.depth)

    # oracle: two standard temporal steps
    h = History.zeros(H, W)
    i1o, v1o, h = temporal_accumulate(g1, h, params=params)
    i2o, v2o, _ = temporal_accumulate(g2, h, params=params)

    def local(c1, m1, c2, m2, nn, d, histC):
        gb1 = GBuffer(render=c1, albedo=None, normal=nn, depth=d, motion=m1)
        gb2 = GBuffer(render=c2, albedo=None, normal=nn, depth=d, motion=m2)
        _, _, histC = temporal_accumulate_canvas_local(
            gb1, histC, H, W, params=params, interpret=True)
        i2, v2, _ = temporal_accumulate_canvas_local(
            gb2, histC, H, W, params=params, interpret=True)
        return i2, v2

    fn = shard_map(local, mesh=mesh,
                   in_specs=(PLANES, PLANES, PLANES, PLANES, PLANES, PLANE,
                             Pspec(None, "y", "x")),
                   out_specs=(PLANES, PLANE), check_vma=False)
    i2c, v2c = fn(g1.render, g1.motion, g2.render, g2.motion,
                  g1.normal, g1.depth, init_history_canvas(mesh, H, W, params))
    np.testing.assert_allclose(np.asarray(i2c), np.asarray(i2o),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2c), np.asarray(v2o),
                               rtol=1e-5, atol=1e-6)


def test_sharded_train_step_full_kernel_path(rng):
    """make_sharded_train_step(impl="pallas"): the complete kernel training
    route — Pallas raymarch, canvas-form differentiable temporal kernel
    (history carried as a margin canvas; temporal_impl="auto" ->
    "pallas_ad_canvas"), chained spatial sweep with the margin-writing
    STORED adjoint — runs TWO optimizer steps (step 2 consumes the canvas
    carry written by step 1, exercising the cross-frame margin refresh) with
    losses matching the oracle-path steps."""
    import optax
    from raymarchdenoisercuda_tpu.config import CameraParams, RaymarchParams
    from raymarchdenoisercuda_tpu.gbuffer import History
    from raymarchdenoisercuda_tpu.ops.raymarch import (cornell_scene,
                                                       cornell_camera)
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        make_sharded_train_step, init_history_canvas)

    H = W = 32
    mesh = make_mesh(4)
    scene = cornell_scene()
    cfg = CameraParams(width=W, height=H)
    rm = RaymarchParams(max_steps=8, shadow_steps=4)
    sv = SVGFParams(iterations=2, max_motion=3)
    target = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    optimizer = optax.sgd(0.0)  # lr 0: compare gradients via loss, not drift

    def two_steps(**kw):
        step = make_sharded_train_step(
            mesh, scene, cornell_camera(), target, optimizer,
            cam_cfg=cfg, rm_params=rm, svgf_params=sv, interpret=True, **kw)
        albedo = scene.materials.albedo
        hist = (init_history_canvas(mesh, H, W, sv)
                if kw.get("impl") == "pallas" else History.zeros(H, W))
        key = jax.random.PRNGKey(0)
        albedo, ost, hist, key, loss1 = step(albedo, optimizer.init(albedo),
                                             hist, key)
        _, _, _, _, loss2 = step(albedo, ost, hist, key)
        return float(loss1), float(loss2)

    lk1, lk2 = two_steps(impl="pallas")
    lo1, lo2 = two_steps(impl="oracle")
    assert np.isfinite(lk1) and np.isfinite(lk2)
    # same MC keys + bit-compatible pipelines: losses agree closely
    assert abs(lk1 - lo1) < 5e-4 * max(abs(lo1), 1e-6), (lk1, lo1)
    assert abs(lk2 - lo2) < 5e-4 * max(abs(lo2), 1e-6), (lk2, lo2)


@pytest.mark.slow
@pytest.mark.parametrize("n_dev", [4, 8])
def test_sharded_chained_matches_per_level(rng, n_dev):
    """Canvas-chained tile sweep == per-level tile kernels (same kernel math,
    margins refreshed over ICI instead of per-level pad/crop/re-exchange),
    including the feedback plane the temporal history consumes."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pspec
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        svgf_spatial_local, PLANE, PLANES)

    H = W = 64
    color, variance, normal, depth = _scene(rng, H, W)
    params = SVGFParams(iterations=3, feedback_level=1)
    mesh = make_mesh(n_dev)

    def run(impl):
        fn = shard_map(
            lambda c, v, n, d: svgf_spatial_local(
                c, v, n, d, H, W, params=params, return_feedback=True,
                impl=impl, interpret=True),
            mesh=mesh, in_specs=(PLANES, PLANE, PLANES, PLANE),
            out_specs=(PLANES, PLANE, PLANES), check_vma=False)
        return fn(color, variance, normal, depth)

    want = run("pallas_levels")
    got = run("pallas")
    for name, a, b in zip(["color", "variance", "feedback"], want, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=1e-6, err_msg=name)


@pytest.mark.slow
def test_sharded_pipeline_kernel_route_matches_oracle(rng):
    """make_sharded_pipeline(impl="pallas") routes raymarch + temporal +
    spatial through the TPU kernels (regression: the raymarch impl was once
    silently dropped inside pipeline_local, leaving the 64-step jnp march
    in the sharded frame — found by profiling, 29 -> 16 ms at 1080p)."""
    from raymarchdenoisercuda_tpu.config import CameraParams, RaymarchParams
    from raymarchdenoisercuda_tpu.gbuffer import History
    from raymarchdenoisercuda_tpu.ops.raymarch import (cornell_scene,
                                                       cornell_camera)
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        make_sharded_pipeline, init_history_canvas)

    H = W = 32
    mesh = make_mesh(4)
    sv = SVGFParams(iterations=2, max_motion=3)
    kw = dict(cam_cfg=CameraParams(width=W, height=H),
              rm_params=RaymarchParams(max_steps=16, shadow_steps=8),
              svgf_params=sv)
    f_o = make_sharded_pipeline(mesh, H, W, impl="oracle", **kw)
    # "auto" on the kernel path = the canvas-form fused temporal step; the
    # full-exchange tile path keeps coverage via the A/B below
    f_p = make_sharded_pipeline(mesh, H, W, impl="pallas", interpret=True,
                                **kw)
    f_p2 = make_sharded_pipeline(mesh, H, W, impl="pallas", interpret=True,
                                 temporal_impl="pallas", **kw)
    scene, cam = cornell_scene(), cornell_camera()
    key = jax.random.PRNGKey(0)
    ho = hp2 = History.zeros(H, W)
    hp = init_history_canvas(mesh, H, W, sv)
    for _ in range(2):   # frame 2 exercises reprojection through history
        go, ho = f_o(scene, cam, cam, ho, key)
        gp, hp = f_p(scene, cam, cam, hp, key)
        gp2, hp2 = f_p2(scene, cam, cam, hp2, key)
    do, dp = np.asarray(go.denoised), np.asarray(gp.denoised)
    dp2 = np.asarray(gp2.denoised)
    assert np.isfinite(dp).all()
    assert np.abs(do - dp).max() < 2e-3
    assert np.abs(do - dp2).max() < 2e-3


def test_sharded_luma_mode_composes_with_pad_and_mask(rng):
    """Round-5 composition corner: the r1+luma per-scene mode through the
    chained stored kernels AND a non-mesh-divisible global shape (pad-and-
    mask) at once — the padded tiles' global masks and the luma levels'
    weight-agnostic stored path must not interfere."""
    H, W = 67, 45
    color, variance, normal, depth = _scene(rng, H, W)
    params = SVGFParams(iterations=5, radius=1, luma_only_from=3)
    want_c, want_v = svgf_spatial_ref(color, variance, normal, depth,
                                      params=params, detach_weights=True)
    mesh = make_mesh(4)
    got_c, got_v = svgf_spatial_sharded(color, variance, normal, depth,
                                        mesh=mesh, params=params,
                                        impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=5e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=5e-5, atol=1e-5)
