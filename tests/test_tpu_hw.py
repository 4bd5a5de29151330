"""Compiled-kernel parity tests on real TPU hardware.

Run with ``RDT_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_hw.py``.
Skipped in the hermetic CPU suite (interpret-mode parity covers logic there;
these validate the actual Mosaic-compiled kernels the benchmarks use).
"""

import functools

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="real TPU not available",
)

import jax.numpy as jnp  # noqa: E402

from raymarchdenoisercuda_tpu.config import SVGFParams  # noqa: E402
from raymarchdenoisercuda_tpu.ops.atrous import (  # noqa: E402
    atrous_level_ref,
    svgf_spatial_ref,
    variance_blur3x3,
    _EPS,
)
from raymarchdenoisercuda_tpu.ops.boxfilter import box_filter  # noqa: E402
from raymarchdenoisercuda_tpu.ops.common import finite_diff_gradients  # noqa: E402

P = SVGFParams()


def _scene(rng, H, W):
    color = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    variance = jnp.asarray((0.02 * rng.random((H, W))).astype(np.float32))
    n = rng.standard_normal((3, H, W)).astype(np.float32)
    n[2] += 3.0
    n /= np.sqrt((n ** 2).sum(0, keepdims=True))
    normal = jnp.asarray(n)
    depth = jnp.asarray((0.3 + 0.5 * rng.random((H, W))).astype(np.float32))
    return color, variance, normal, depth


@pytest.mark.parametrize("level", [0, 2, 4])
def test_atrous_fwd_compiled(rng, level):
    from raymarchdenoisercuda_tpu.ops.pallas.atrous_tpu import atrous_level_fwd_pallas

    H, W = 360, 640  # multi-band grid on hardware
    color, variance, normal, depth = _scene(rng, H, W)
    zgrad = finite_diff_gradients(depth)
    sden = P.sigma_color * jnp.sqrt(jnp.maximum(variance_blur3x3(variance), 0.0)) + _EPS
    want_c, want_v = atrous_level_ref(color, variance, normal, depth, zgrad,
                                      level=level, params=P)
    got_c, got_v, _ = atrous_level_fwd_pallas(
        color, variance, normal, depth, zgrad, sden, level=level, params=P)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), rtol=1e-4, atol=1e-6)


def test_svgf_spatial_compiled_multilevel(rng):
    from raymarchdenoisercuda_tpu.ops.pallas.atrous_tpu import svgf_spatial_pallas

    H, W = 360, 640
    color, variance, normal, depth = _scene(rng, H, W)
    params = SVGFParams(iterations=5)
    want_c, want_v = svgf_spatial_ref(color, variance, normal, depth,
                                      params=params, detach_weights=True)
    got_c, got_v = svgf_spatial_pallas(color, variance, normal, depth, params=params)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c), rtol=5e-4, atol=5e-5)


def test_vjp_compiled(rng):
    from raymarchdenoisercuda_tpu.ops.pallas.atrous_tpu import svgf_spatial_pallas

    H, W = 120, 256
    color, variance, normal, depth = _scene(rng, H, W)
    params = SVGFParams(iterations=2)

    def loss_oracle(c):
        oc, _ = svgf_spatial_ref(c, variance, normal, depth, params=params,
                                 detach_weights=True)
        return jnp.sum(oc ** 2)

    def loss_pallas(c, bwd_impl):
        oc, _ = svgf_spatial_pallas(c, variance, normal, depth, params=params,
                                    bwd_impl=bwd_impl)
        return jnp.sum(oc ** 2)

    g_w = jax.grad(loss_oracle)(color)
    g_g = jax.grad(functools.partial(loss_pallas, bwd_impl="recompute"))(color)
    np.testing.assert_allclose(np.asarray(g_g), np.asarray(g_w), rtol=1e-3, atol=1e-5)
    # production default (stored-bf16 weights): same adjoint up to the 2^-8
    # weight quantization — compare scale-normalized
    g_s = jax.grad(functools.partial(loss_pallas, bwd_impl="stored"))(color)
    scale = float(np.abs(np.asarray(g_w)).max()) + 1e-30
    assert np.abs(np.asarray(g_s) - np.asarray(g_w)).max() / scale < 3e-3


@pytest.mark.parametrize("radius,depth_levels", [(2, 1), (2, 3)])
def test_box_compiled(rng, radius, depth_levels):
    from raymarchdenoisercuda_tpu.ops.pallas.box_tpu import box_filter_pallas

    x = rng.random((3, 300, 512), dtype=np.float32)
    want = np.asarray(box_filter(x, radius=radius, depth=depth_levels))
    got = np.asarray(box_filter_pallas(x, radius=radius, depth=depth_levels))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_temporal_kernel_compiled(rng):
    """Fused temporal band kernel (dynamic reprojection ranges) on hardware."""
    from raymarchdenoisercuda_tpu.gbuffer import GBuffer, History
    from raymarchdenoisercuda_tpu.ops.temporal import temporal_accumulate
    from raymarchdenoisercuda_tpu.ops.pallas.temporal_tpu import (
        temporal_accumulate_pallas)

    H, W = 270, 480
    color, _var, normal, depth = _scene(rng, H, W)
    motion = jnp.stack([
        jnp.linspace(-5.5, 5.5, H)[:, None] * jnp.ones((1, W)),
        jnp.linspace(5.5, -5.5, W)[None, :] * jnp.ones((H, 1))]).astype(jnp.float32)
    g = GBuffer(render=color, albedo=jnp.full((3, H, W), 0.7), normal=normal,
                depth=depth, motion=motion)
    hist = History(
        color=jnp.asarray(rng.random((3, H, W), dtype=np.float32)),
        moments=jnp.stack([jnp.full((H, W), 0.25), jnp.full((H, W), 0.0725)]),
        length=jnp.full((H, W), 5.0),
        prev_depth=depth, prev_normal=normal)

    wi, wv, wh = temporal_accumulate(g, hist, params=P)
    gi, gv, gh = temporal_accumulate_pallas(g, hist, params=P)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(wi), atol=2e-6)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv), atol=2e-6)
    np.testing.assert_allclose(np.asarray(gh.length), np.asarray(wh.length))


def test_raymarch_kernel_compiled(rng):
    """Banded early-exit march + shadow kernels on hardware vs jnp oracle."""
    from raymarchdenoisercuda_tpu.config import CameraParams, RaymarchParams
    from raymarchdenoisercuda_tpu.ops.raymarch import (
        cornell_scene, cornell_camera, render_gbuffer)

    cfg = CameraParams(width=256, height=192)
    rm = RaymarchParams(max_steps=48, shadow_steps=24)
    scene = cornell_scene()
    cam = cornell_camera()
    key = jax.random.PRNGKey(0)
    a = render_gbuffer(scene, cam, cam, key, cam_cfg=cfg, params=rm)
    b = render_gbuffer(scene, cam, cam, key, cam_cfg=cfg, params=rm,
                       impl="pallas")
    for name in ["render", "albedo", "normal", "depth", "motion"]:
        np.testing.assert_allclose(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            atol=2e-4, err_msg=name)


def test_wgrad_adjoint_compiled(rng):
    """Full weight-gradient adjoint kernels compile and match the oracle on
    the well-conditioned inputs (see interpret test for the d_depth oracle
    noise caveat)."""
    from raymarchdenoisercuda_tpu.ops.pallas.atrous_tpu import svgf_spatial_pallas

    H, W = 180, 320
    color, variance, normal, depth = _scene(rng, H, W)
    params = SVGFParams(iterations=2)

    def loss_oracle(c, v):
        oc, ov = svgf_spatial_ref(c, v, normal, depth, params=params,
                                  detach_weights=False)
        return jnp.sum(jnp.sin(oc)) + jnp.sum(ov * ov)

    def loss_pallas(c, v):
        oc, ov = svgf_spatial_pallas(c, v, normal, depth, params=params,
                                     weight_grads=True)
        return jnp.sum(jnp.sin(oc)) + jnp.sum(ov * ov)

    go = jax.grad(loss_oracle, argnums=(0, 1))(color, variance)
    gp = jax.grad(loss_pallas, argnums=(0, 1))(color, variance)
    for name, a, b in zip(["d_color", "d_variance"], go, gp):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-30)
        assert np.abs(a - b).max() / scale < 1e-3, name


def test_sharded_pallas_single_device_mesh(rng):
    """Tile kernels inside shard_map on a 1-device mesh: compiled-path parity
    (the real-pod layout with the chip count available here)."""
    from jax.sharding import Mesh
    from raymarchdenoisercuda_tpu.parallel.sharded import svgf_spatial_sharded

    H, W = 128, 256
    color, variance, normal, depth = _scene(rng, H, W)
    params = SVGFParams(iterations=3)
    want_c, want_v = svgf_spatial_ref(color, variance, normal, depth,
                                      params=params, detach_weights=True)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1),
                ("data", "y", "x"))
    got_c, got_v = svgf_spatial_sharded(color, variance, normal, depth,
                                        mesh=mesh, params=params,
                                        impl="pallas")
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-4, atol=1e-6)


def test_temporal_ad_kernel_compiled(rng):
    """Differentiable temporal kernel pair (tent gather + hand-written
    adjoint) on hardware: bit-exact forward, ulp-level gradient parity vs
    the oracle's autodiff.  (At 1080p the oracle's own fwd+bwd cannot even
    compile — its 196-tap reprojection residuals want ~29 GB of HBM — so
    parity runs at 512^2 where both fit.)"""
    from raymarchdenoisercuda_tpu.gbuffer import GBuffer, History
    from raymarchdenoisercuda_tpu.ops.temporal import temporal_accumulate
    from raymarchdenoisercuda_tpu.ops.pallas.temporal_tpu import (
        temporal_accumulate_pallas_ad)

    H, W = 512, 512
    color, _v, normal, depth = _scene(rng, H, W)
    motion = jnp.asarray(
        ((rng.random((2, H, W)) - 0.5) * 8).astype(np.float32))
    g = GBuffer(render=color, albedo=jnp.full((3, H, W), 0.7), normal=normal,
                depth=depth, motion=motion)
    hist = History(
        color=jnp.asarray(rng.random((3, H, W), dtype=np.float32)),
        moments=jnp.asarray(rng.random((2, H, W), dtype=np.float32)),
        length=jnp.asarray((rng.random((H, W)) * 6).astype(np.float32)),
        prev_depth=depth, prev_normal=normal)

    a = temporal_accumulate(g, hist, params=P)
    b = temporal_accumulate_pallas_ad(g, hist, params=P)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

    def loss(fn):
        def L(hc, mot):
            i, v, nh = fn(g.replace(motion=mot), hist.replace(color=hc),
                          params=P)
            return jnp.sum(i ** 2) + jnp.sum(v) + jnp.sum(nh.moments)
        return L

    ga = jax.grad(loss(temporal_accumulate), argnums=(0, 1))(
        hist.color, motion)
    gb = jax.grad(loss(temporal_accumulate_pallas_ad), argnums=(0, 1))(
        hist.color, motion)
    for name, x, y in zip(["d_hist_color", "d_motion"], ga, gb):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_sharded_temporal_ad_single_device_mesh(rng):
    """Differentiable temporal kernel inside shard_map on a 1-device mesh,
    compiled: forward + gradients match the single-device oracle (the
    sharded training path's temporal route)."""
    from jax.sharding import Mesh
    from jax import shard_map
    from raymarchdenoisercuda_tpu.gbuffer import GBuffer, History
    from raymarchdenoisercuda_tpu.ops.temporal import temporal_accumulate
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        temporal_accumulate_local, PLANE, PLANES)

    H, W = 128, 256
    color, _v, normal, depth = _scene(rng, H, W)
    motion = jnp.asarray(
        ((rng.random((2, H, W)) - 0.5) * 8).astype(np.float32))
    g = GBuffer(render=color, albedo=jnp.full((3, H, W), 0.7), normal=normal,
                depth=depth, motion=motion, denoised=None)
    hist = History(
        color=jnp.asarray(rng.random((3, H, W), dtype=np.float32)),
        moments=jnp.asarray(rng.random((2, H, W), dtype=np.float32)),
        length=jnp.asarray((rng.random((H, W)) * 6).astype(np.float32)),
        prev_depth=depth, prev_normal=normal)

    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("y", "x"))
    gb_specs = GBuffer(render=PLANES, albedo=PLANES, normal=PLANES,
                       depth=PLANE, motion=PLANES, denoised=None)
    h_specs = History(color=PLANES, moments=PLANES, length=PLANE,
                      prev_depth=PLANE, prev_normal=PLANES)
    sharded = shard_map(
        lambda gb, h: temporal_accumulate_local(
            gb, h, H, W, params=P, impl="pallas_ad"),
        mesh=mesh, in_specs=(gb_specs, h_specs),
        out_specs=(PLANES, PLANE, h_specs), check_vma=False)

    a = temporal_accumulate(g, hist, params=P)
    b = sharded(g, hist)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                               rtol=1e-5, atol=1e-6)

    def loss(fn):
        def L(hc, mot):
            i, v, nh = fn(g.replace(motion=mot), hist.replace(color=hc))
            return jnp.sum(i ** 2) + jnp.sum(v) + jnp.sum(nh.moments)
        return L

    ga = jax.grad(loss(lambda gb, h: temporal_accumulate(gb, h, params=P)),
                  argnums=(0, 1))(hist.color, motion)
    gb_ = jax.grad(loss(sharded), argnums=(0, 1))(hist.color, motion)
    for name, x, y in zip(["d_hist_color", "d_motion"], ga, gb_):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_sharded_chained_gradients_compiled(rng):
    """Canvas-chained tile sweep adjoint compiled on a 1-device mesh:
    gradients match the oracle (the per-level recompute kernel embedded in
    canvas coordinates + autodiff-transposed margin refreshes)."""
    from jax.sharding import Mesh
    from raymarchdenoisercuda_tpu.parallel.sharded import svgf_spatial_sharded

    H, W = 128, 256
    color, variance, normal, depth = _scene(rng, H, W)
    params = SVGFParams(iterations=3)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1),
                ("data", "y", "x"))

    def loss_ref(c):
        oc, _ = svgf_spatial_ref(c, variance, normal, depth, params=params,
                                 detach_weights=True)
        return jnp.sum(oc ** 2)

    def loss_shard(c):
        oc, _ = svgf_spatial_sharded(c, variance, normal, depth, mesh=mesh,
                                     params=params, impl="pallas")
        return jnp.sum(oc ** 2)

    g_ref = jax.grad(loss_ref)(color)
    g_shard = jax.grad(loss_shard)(color)
    a, b = np.asarray(g_ref), np.asarray(g_shard)
    scale = max(np.abs(a).max(), 1e-30)
    assert np.abs(a - b).max() / scale < 1e-3


def test_march_normals_fused_compiled(rng):
    """Fused march+normal kernel compiled on hardware: G-buffer with
    normal_impl="pallas" matches the XLA sdf_normal path."""
    from raymarchdenoisercuda_tpu.config import CameraParams, RaymarchParams
    from raymarchdenoisercuda_tpu.ops.raymarch import (
        cornell_scene, cornell_camera, render_gbuffer)

    cfg = CameraParams(width=256, height=192)
    rm = RaymarchParams(max_steps=48, shadow_steps=24)
    scene, cam = cornell_scene(), cornell_camera()
    key = jax.random.PRNGKey(0)
    a = render_gbuffer(scene, cam, cam, key, cam_cfg=cfg, params=rm,
                       impl="pallas", normal_impl="xla")
    b = render_gbuffer(scene, cam, cam, key, cam_cfg=cfg, params=rm,
                       impl="pallas", normal_impl="pallas")
    np.testing.assert_allclose(np.asarray(a.normal), np.asarray(b.normal),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(a.render), np.asarray(b.render),
                               atol=5e-3)
    np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(b.depth))


def test_radius1_mode_compiled(rng):
    """The round-4 headline mode (radius-1, 5 iterations, fast weights)
    compiled on hardware: fwd vs the oracle at fast-weight tolerance,
    stored-bf16 gradients at quantization tolerance."""
    from raymarchdenoisercuda_tpu.ops.pallas.atrous_tpu import (
        svgf_spatial_pallas)

    H, W = 240, 512
    color, variance, normal, depth = _scene(rng, H, W)
    params = SVGFParams(iterations=5, radius=1)
    want_c, _ = svgf_spatial_ref(color, variance, normal, depth,
                                 params=params, detach_weights=True)
    got_c, _ = svgf_spatial_pallas(color, variance, normal, depth,
                                   params=params, weight_math="fast")
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=5e-4, atol=1e-4)

    def loss_oracle(c):
        oc, _ = svgf_spatial_ref(c, variance, normal, depth, params=params,
                                 detach_weights=True)
        return jnp.sum(oc ** 2)

    def loss_pallas(c):
        oc, _ = svgf_spatial_pallas(c, variance, normal, depth, params=params,
                                    weight_math="fast")
        return jnp.sum(oc ** 2)

    g_w = np.asarray(jax.grad(loss_oracle)(color))
    g_g = np.asarray(jax.grad(loss_pallas)(color))
    assert np.abs(g_g - g_w).max() / (np.abs(g_w).max() + 1e-30) < 3e-3


def test_shadow_shade_fused_compiled(rng):
    """Fused shadow+shading+motion kernel compiled on hardware: G-buffer
    planes match the XLA shading path, and material-albedo gradients match
    through the XLA-recompute VJP."""
    from raymarchdenoisercuda_tpu.config import CameraParams, RaymarchParams
    from raymarchdenoisercuda_tpu.ops.raymarch import (
        cornell_scene, cornell_camera, render_gbuffer)

    scene = cornell_scene()
    cfg = CameraParams(width=256, height=192)
    rm = RaymarchParams(max_steps=48, shadow_steps=24)
    key = jax.random.PRNGKey(3)
    cam = cornell_camera()
    a = render_gbuffer(scene, cam, cam, key, cam_cfg=cfg, params=rm,
                       impl="pallas", normal_impl="pallas", shade_impl="xla")
    b = render_gbuffer(scene, cam, cam, key, cam_cfg=cfg, params=rm,
                       impl="pallas", normal_impl="pallas",
                       shade_impl="pallas")
    for name in ["render", "albedo", "normal", "depth", "motion"]:
        np.testing.assert_allclose(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            atol=2e-4, err_msg=name)

    def loss(alb, shade_impl):
        sc = scene.replace(materials=scene.materials.replace(albedo=alb))
        g = render_gbuffer(sc, cam, cam, key, cam_cfg=cfg, params=rm,
                           impl="pallas", normal_impl="pallas",
                           shade_impl=shade_impl)
        return jnp.sum(g.render ** 2)

    ga = np.asarray(jax.grad(loss)(scene.materials.albedo, "xla"))
    gb_ = np.asarray(jax.grad(loss)(scene.materials.albedo, "pallas"))
    assert np.abs(gb_ - ga).max() / (np.abs(ga).max() + 1e-30) < 1e-4


def test_canvas_gather_compiled(rng):
    """Canvas-form tent gather + margin-writing adjoint compiled on
    hardware: matches the plain gather's values and history gradients on
    the canvas's center region."""
    from raymarchdenoisercuda_tpu.ops.pallas.temporal_tpu import (
        _reproject_gather, _reproject_gather_canvas, hist_canvas_geometry)

    th, tw = 120, 248
    params = SVGFParams()
    geom = hist_canvas_geometry(th, tw, params)
    mh, CH, CLm, Wpc, TH, th_pad, TH_b = geom
    hist = jnp.asarray(rng.random((10, th, tw), dtype=np.float32))
    motion = jnp.asarray(
        (2.0 * rng.random((2, th, tw)) - 1.0).astype(np.float32) * 4.0)
    histC = jnp.pad(hist, [(0, 0), (CH, CH + th_pad - th),
                           (CLm, Wpc - tw - CLm)])
    motionB = jnp.pad(motion, [(0, 0), (2 * CH, 2 * CH + th_pad - th),
                               (CLm, Wpc - tw - CLm)])
    wt = jnp.asarray(rng.random((10, th, tw), dtype=np.float32))

    def loss_plain(h):
        g = _reproject_gather(h, motion, params, False, False)
        return jnp.sum(wt * g), g

    def loss_canvas(hC):
        g = _reproject_gather_canvas(hC, motionB, params, geom, False, False)
        return jnp.sum(wt * g[:, :th, CLm:CLm + tw]), g

    (l_p, g_p), d_p = jax.value_and_grad(loss_plain, has_aux=True)(hist)
    (l_c, g_c), d_c = jax.value_and_grad(loss_canvas, has_aux=True)(histC)
    np.testing.assert_allclose(
        np.asarray(g_c[:, :th, CLm:CLm + tw]), np.asarray(g_p),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(d_c[:, CH:CH + th, CLm:CLm + tw]), np.asarray(d_p),
        rtol=1e-5, atol=1e-5)


def test_sharded_stored_bwd_compiled(rng):
    """Margin-writing stored-weight canvas adjoint compiled on a 1-device
    mesh: gradients match the oracle within the bf16 weight quantization."""
    from jax.sharding import Mesh
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pspec
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        svgf_spatial_local)

    H, W = 128, 256
    color, variance, normal, depth = _scene(rng, H, W)
    params = SVGFParams(iterations=3)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1),
                ("data", "y", "x"))
    PL = Pspec("y", "x")
    PLS = Pspec(None, "y", "x")
    fn = shard_map(
        lambda c, v, n, d: svgf_spatial_local(
            c, v, n, d, H, W, params=params, impl="pallas",
            bwd_impl="stored"),
        mesh=mesh, in_specs=(PLS, PL, PLS, PL), out_specs=(PLS, PL),
        check_vma=False)

    def loss_ref(c):
        oc, ov = svgf_spatial_ref(c, variance, normal, depth, params=params,
                                  detach_weights=True)
        return jnp.sum(oc ** 2) + jnp.sum(ov)

    def loss_shard(c):
        oc, ov = fn(c, variance, normal, depth)
        return jnp.sum(oc ** 2) + jnp.sum(ov)

    g_ref = np.asarray(jax.grad(loss_ref)(color))
    g_shard = np.asarray(jax.grad(loss_shard)(color))
    assert np.abs(g_shard - g_ref).max() / (np.abs(g_ref).max() + 1e-30) < 3e-3
