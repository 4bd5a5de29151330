"""Raymarcher tests: geometry, G-buffer planes, noise statistics, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raymarchdenoisercuda_tpu.config import CameraParams, RaymarchParams
from raymarchdenoisercuda_tpu.ops.raymarch import (
    Scene,
    Camera,
    cornell_scene,
    cornell_camera,
    sdf_scene,
    sdf_normal,
    camera_rays,
    raymarch,
    render_gbuffer,
)

CFG = CameraParams(width=64, height=64)
RM = RaymarchParams(max_steps=48, shadow_steps=24)


@pytest.fixture(scope="module")
def scene():
    return cornell_scene()


@pytest.fixture(scope="module")
def frame(scene):
    key = jax.random.PRNGKey(0)
    return render_gbuffer(scene, cornell_camera(), None, key, cam_cfg=CFG, params=RM)


def test_sdf_center_inside_box(scene):
    # center of the box interior: nearest surface < 1 away, sign positive
    p = jnp.zeros((3, 1, 1))
    d, mat = sdf_scene(scene, p)
    assert 0 < float(d[0, 0]) <= 1.0


def test_sdf_normals_unit(scene, rng):
    p = jnp.asarray(rng.uniform(-0.9, 0.9, (3, 8, 8)).astype(np.float32))
    n = sdf_normal(scene, p)
    lens = np.linalg.norm(np.asarray(n), axis=0)
    np.testing.assert_allclose(lens, 1.0, atol=1e-3)


def test_camera_rays_normalized():
    ro, rd, _ = camera_rays(cornell_camera(), CFG)
    lens = np.linalg.norm(np.asarray(rd), axis=0)
    np.testing.assert_allclose(lens, 1.0, atol=1e-5)
    assert ro.shape == (3, 64, 64)


def test_primary_rays_hit_walls(scene):
    ro, rd, _ = camera_rays(cornell_camera(), CFG)
    t, hit = raymarch(scene, ro, rd, RM)
    # closed box: everything hits except a handful of grazing edge rays that
    # need more than RM.max_steps to converge
    assert np.asarray(hit).mean() > 0.999
    assert np.asarray(t).max() < 5.0


def test_gbuffer_planes(frame):
    g = frame
    assert g.render.shape == (3, 64, 64)
    for plane in (g.render, g.albedo, g.normal, g.motion):
        assert np.isfinite(np.asarray(plane)).all()
    assert (np.asarray(g.depth) > 0).mean() > 0.999  # closed box: ~all hit
    # normals face the camera (dot with view dir <= 0 on hits)
    ro, rd, _ = camera_rays(cornell_camera(), CFG)
    ndotv = np.asarray(jnp.sum(g.normal * rd, axis=0))
    assert (ndotv <= 1e-3).all()
    # left wall red-ish, right wall green-ish
    alb = np.asarray(g.albedo)
    assert alb[0, 32, 2] > alb[1, 32, 2]   # left column: R > G
    assert alb[1, 32, 61] > alb[0, 32, 61]  # right column: G > R


def test_static_camera_zero_motion(scene):
    key = jax.random.PRNGKey(1)
    cam = cornell_camera()
    g = render_gbuffer(scene, cam, cam, key, cam_cfg=CFG, params=RM)
    m = np.asarray(g.motion)
    hit_interior = np.abs(m) < 0.35  # bilinear/fp slack, plus normal-flip pixels
    assert hit_interior.mean() > 0.97


def test_render_noise_varies_with_key(scene):
    g1 = render_gbuffer(scene, cornell_camera(), None, jax.random.PRNGKey(1),
                        cam_cfg=CFG, params=RM)
    g2 = render_gbuffer(scene, cornell_camera(), None, jax.random.PRNGKey(2),
                        cam_cfg=CFG, params=RM)
    assert not np.allclose(np.asarray(g1.render), np.asarray(g2.render))
    # albedo/normal/depth planes are noise-free
    np.testing.assert_allclose(np.asarray(g1.albedo), np.asarray(g2.albedo))
    np.testing.assert_allclose(np.asarray(g1.depth), np.asarray(g2.depth))


def test_spp_reduces_noise(scene):
    k = jax.random.PRNGKey(3)
    g1 = render_gbuffer(scene, cornell_camera(), None, k, cam_cfg=CFG, params=RM, spp=1)
    g16 = render_gbuffer(scene, cornell_camera(), None, k, cam_cfg=CFG, params=RM, spp=16)
    # variance of the 16-spp render against its own mean must be smaller
    r1, r16 = np.asarray(g1.render), np.asarray(g16.render)
    # compare local high-frequency energy on the floor region
    def hf(x):
        return np.abs(np.diff(x[0, 48:, 8:56], axis=0)).mean()
    assert hf(r16) < hf(r1)


def test_gradients_flow_to_materials(scene):
    key = jax.random.PRNGKey(0)

    def loss(albedo_table):
        s = scene.replace(materials=scene.materials.replace(albedo=albedo_table))
        g = render_gbuffer(s, cornell_camera(), None, key, cam_cfg=CFG, params=RM)
        return jnp.mean(g.render ** 2)

    grads = jax.grad(loss)(scene.materials.albedo)
    ga = np.asarray(grads)
    assert np.isfinite(ga).all()
    # walls visible -> nonzero gradient for wall materials 0..2
    assert np.abs(ga[:3]).max() > 0


def _sphere_interior_mask(scene):
    """Pixels that hit the sphere away from its silhouette (frozen mask).

    t is *discontinuous* across the silhouette (it jumps from the sphere to
    the wall behind), so finite differences of an all-pixel loss measure the
    silhouette jump, not the smooth dt/dθ the implicit adjoint computes.
    Restricting the loss to interior sphere pixels (with the mask frozen
    across the FD perturbations) makes it differentiable.
    """
    from raymarchdenoisercuda_tpu.ops.raymarch import raymarch, camera_rays

    ro, rd, _ = camera_rays(cornell_camera(), CFG)
    t, hit = raymarch(scene, ro, rd, RM)
    p = ro + t[None] * rd
    _, mat = sdf_scene(scene, p)
    on_sphere = np.asarray((mat == 4) & hit)
    # erode: keep pixels whose full 8-neighborhood is also on the sphere
    interior = on_sphere.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            interior &= np.roll(np.roll(on_sphere, dy, 0), dx, 1)
    assert interior.sum() > 20, "sphere should cover interior pixels"
    return jnp.asarray(interior), ro, rd


def test_implicit_vjp_matches_finite_differences(scene):
    """Geometry gradients via the implicit-function adjoint (dt*/dθ =
    -f_θ/(∇f·rd)) agree with central finite differences of the march
    (SURVEY.md §7(b); VERDICT round-1 next-step #2)."""
    from raymarchdenoisercuda_tpu.ops.raymarch import raymarch

    mask, ro, rd = _sphere_interior_mask(scene)

    def loss_at(radius):
        s = scene.replace(
            sphere_params=scene.sphere_params.at[0, 3].set(radius))
        t, _hit = raymarch(s, ro, rd, RM)
        return jnp.sum(jnp.where(mask, t, 0.0))

    r0 = scene.sphere_params[0, 3]
    g = jax.grad(loss_at)(r0)
    eps = 1e-3
    fd = (loss_at(r0 + eps) - loss_at(r0 - eps)) / (2 * eps)
    # growing the sphere shortens the masked rays
    assert float(g) < 0
    np.testing.assert_allclose(float(g), float(fd), rtol=0.05)


def test_implicit_vjp_center_translation_gradient(scene):
    from raymarchdenoisercuda_tpu.ops.raymarch import raymarch

    mask, ro, rd = _sphere_interior_mask(scene)

    def loss_at(cz):
        s = scene.replace(
            sphere_params=scene.sphere_params.at[0, 2].set(cz))
        t, _hit = raymarch(s, ro, rd, RM)
        return jnp.sum(jnp.where(mask, t, 0.0))

    c0 = scene.sphere_params[0, 2]
    g = jax.grad(loss_at)(c0)
    eps = 1e-3
    fd = (loss_at(c0 + eps) - loss_at(c0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=0.05)


def test_implicit_vjp_forward_unchanged(scene):
    """custom_vjp must not change the primal march results."""
    from raymarchdenoisercuda_tpu.ops.raymarch import (
        raymarch, _raymarch_loop, camera_rays)

    ro, rd, _ = camera_rays(cornell_camera(), CFG)
    t1, h1 = raymarch(scene, ro, rd, RM)
    t2, h2 = _raymarch_loop(scene, ro, rd, RM)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_pallas_march_parity_interpret(scene):
    """Banded early-exit Pallas march kernels == jnp oracle (primal planes
    and gradients; interpret mode).  VERDICT round-1 next-step #2."""
    key = jax.random.PRNGKey(0)
    a = render_gbuffer(scene, cornell_camera(), cornell_camera(), key,
                       cam_cfg=CFG, params=RM)
    b = render_gbuffer(scene, cornell_camera(), cornell_camera(), key,
                       cam_cfg=CFG, params=RM, impl="pallas", interpret=True)
    for name in ["render", "albedo", "normal", "depth", "motion"]:
        np.testing.assert_allclose(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            atol=5e-5, err_msg=name)


def test_pallas_march_gradient_parity_interpret(scene):
    key = jax.random.PRNGKey(0)

    def loss(albedo, impl):
        s = scene.replace(materials=scene.materials.replace(albedo=albedo))
        g = render_gbuffer(s, cornell_camera(), None, key, cam_cfg=CFG,
                           params=RM, impl=impl, interpret=(impl == "pallas"))
        return jnp.mean(g.render ** 2)

    g1 = jax.grad(lambda a: loss(a, "jnp"))(scene.materials.albedo)
    g2 = jax.grad(lambda a: loss(a, "pallas"))(scene.materials.albedo)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-5, atol=1e-8)


def test_relaxed_march_matches_plain(scene):
    """Over-relaxed sphere tracing (relax_omega > 1) must converge to the
    same surfaces as plain tracing: same hit mask, hit distances within a
    few hit_eps away from silhouettes (the rollback rule guarantees no
    surface is skipped; isolated grazing rays where 64-step plain tracing
    itself hasn't converged may differ by more)."""
    from raymarchdenoisercuda_tpu.ops.raymarch import _raymarch_loop

    ro, rd, _ = camera_rays(cornell_camera(), CFG)
    plain = RaymarchParams(max_steps=64, relax_omega=1.0)
    relaxed = RaymarchParams(max_steps=64, relax_omega=1.4)
    t0, h0 = _raymarch_loop(scene, ro, rd, plain)
    t1, h1 = _raymarch_loop(scene, ro, rd, relaxed)
    assert (np.asarray(h0) == np.asarray(h1)).mean() > 0.999
    both = np.asarray(h0 & h1)
    dt = np.abs(np.asarray(t0) - np.asarray(t1))[both]
    assert np.percentile(dt, 99) < 2 * plain.hit_eps, np.percentile(dt, 99)
    assert dt.max() < 0.1, dt.max()


def test_relaxed_shadow_no_less_accurate_than_plain(scene):
    """Relaxed shadow visibility must be at least as close to a converged
    (128-step plain) reference as the plain 32-step march: the relaxation
    covers the ray in fewer evals, so step-starved grazing rays that plain
    tracing falsely shadows reach the light (measured: 92% vs 90% reference
    agreement on this scene)."""
    from raymarchdenoisercuda_tpu.ops.raymarch import (
        _shadow_factor, _raymarch_loop)

    ro, rd, _ = camera_rays(cornell_camera(), CFG)
    plain = RaymarchParams(relax_omega=1.0)
    t, hit = _raymarch_loop(scene, ro, rd, plain)
    p = ro + t[None] * rd
    n = sdf_normal(scene, p, plain.normal_eps)
    lp = jnp.broadcast_to(scene.light_center[:, None, None], p.shape)
    ref = np.asarray(_shadow_factor(
        scene, p, n, lp, RaymarchParams(relax_omega=1.0, shadow_steps=128)))
    v_plain = np.asarray(_shadow_factor(scene, p, n, lp, plain))
    v_relax = np.asarray(_shadow_factor(
        scene, p, n, lp, RaymarchParams(relax_omega=1.4)))
    agree_plain = (ref == v_plain).mean()
    agree_relax = (ref == v_relax).mean()
    assert agree_relax >= agree_plain - 0.002, (agree_relax, agree_plain)
    assert agree_relax > 0.9


def test_cone_seed_conservative(scene):
    """Half-res cone pre-march seeding (RaymarchParams.coarse_seed): the
    seed must be skip-free — the SDF at every seeded start point is still
    >= hit_eps (the cone-march invariant sdf >= hit_eps + base + s*delta
    transfers at least hit_eps of clearance to every ray in the block) —
    and the seeded march must find the same surfaces as marching from 0."""
    from raymarchdenoisercuda_tpu.ops.raymarch import sdf_scene
    from raymarchdenoisercuda_tpu.ops.pallas.raymarch_tpu import (
        raymarch_pallas_with_mat, _cone_seed)

    ro, rd, _ = camera_rays(cornell_camera(), CFG)
    p0 = RaymarchParams(max_steps=64)
    p1 = RaymarchParams(max_steps=64, coarse_seed=True)

    seed = np.asarray(_cone_seed(scene, ro, rd, p1, True))
    d_at, _ = sdf_scene(scene, ro + jnp.asarray(seed)[None] * rd)
    dn = np.asarray(d_at)
    non_escaped = seed < p1.max_dist
    assert dn[non_escaped].min() >= 0.5 * p1.hit_eps, dn[non_escaped].min()

    t0, h0, m0 = raymarch_pallas_with_mat(scene, ro, rd, p0, True)
    t1, h1, m1 = raymarch_pallas_with_mat(scene, ro, rd, p1, True)
    h0n, h1n = np.asarray(h0), np.asarray(h1)
    # seeds are conservative: the seeded march can only be MORE converged,
    # so disagreements are step-starved grazing pixels (cf. relaxed test)
    assert (h0n == h1n).mean() > 0.998
    both = h0n & h1n
    dt = np.abs(np.asarray(t0) - np.asarray(t1))[both]
    assert np.percentile(dt, 99) < 2 * p0.hit_eps, np.percentile(dt, 99)
    # seeds never overshoot the final hit
    assert (seed <= np.asarray(t1) + 1e-5).all()


def test_big_scene_kernel_parity_interpret():
    """Scene-scale generality: the SMEM-unrolled Pallas SDF and the
    compare-select material lookup on a ~53-primitive / 16-material
    procedural scene match the jnp oracle (VERDICT r2 weak #7)."""
    from raymarchdenoisercuda_tpu.ops.raymarch import random_scene
    key = jax.random.PRNGKey(0)
    big = random_scene(n_spheres=24, n_boxes=24, n_materials=16, seed=3)
    a = render_gbuffer(big, cornell_camera(), cornell_camera(), key,
                       cam_cfg=CFG, params=RM)
    b = render_gbuffer(big, cornell_camera(), cornell_camera(), key,
                       cam_cfg=CFG, params=RM, impl="pallas", interpret=True)
    for name in ["render", "albedo", "normal", "depth", "motion"]:
        np.testing.assert_allclose(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            atol=5e-5, err_msg=name)


def test_march_kernel_normals_parity_interpret():
    """raymarch_pallas_gbuf's in-kernel central-difference normals ==
    sdf_normal + viewer flip (the XLA pass it replaces), and t/hit/mat
    match the normal-free kernel."""
    from raymarchdenoisercuda_tpu.config import CameraParams, RaymarchParams
    from raymarchdenoisercuda_tpu.ops.raymarch import (
        cornell_scene, cornell_camera, camera_rays, sdf_normal)
    from raymarchdenoisercuda_tpu.ops.pallas.raymarch_tpu import (
        raymarch_pallas_gbuf, raymarch_pallas_with_mat)

    scene = cornell_scene()
    cfg = CameraParams(width=64, height=48)
    params = RaymarchParams(max_steps=48)
    ro, rd, _ = camera_rays(cornell_camera(), cfg)

    t0, hit0, mat0 = raymarch_pallas_with_mat(scene, ro, rd, params, True)
    t1, hit1, mat1, n1 = raymarch_pallas_gbuf(scene, ro, rd, params, True)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(hit0), np.asarray(hit1))
    np.testing.assert_array_equal(np.asarray(mat0), np.asarray(mat1))

    p = ro + t0[None] * rd
    want = sdf_normal(scene, p, params.normal_eps)
    want = jnp.where(jnp.sum(want * rd, axis=0, keepdims=True) > 0,
                     -want, want)
    # fp-association noise only: the in-kernel p and normalization round
    # differently from XLA's; max observed 1.3e-4 on unit normals
    np.testing.assert_allclose(np.asarray(n1), np.asarray(want),
                               rtol=5e-3, atol=5e-4)
    # unit length everywhere (hit or not)
    np.testing.assert_allclose(np.sum(np.asarray(n1) ** 2, 0), 1.0,
                               atol=1e-4)


def test_shadow_shade_fused_parity_and_gradients():
    """Fused shadow+shading(+motion) kernel (VERDICT r3 next-step #5):
    forward planes match the XLA shading path at fp-reassociation level,
    and material-albedo gradients match through the XLA-recompute VJP
    (visibility treated constant, exactly the oracle's stop_gradient)."""
    from raymarchdenoisercuda_tpu.config import CameraParams, RaymarchParams
    from raymarchdenoisercuda_tpu.ops.raymarch import (
        cornell_scene, cornell_camera, render_gbuffer)

    scene = cornell_scene()
    cfg = CameraParams(width=64, height=48)
    rm = RaymarchParams(max_steps=32, shadow_steps=16)
    key = jax.random.PRNGKey(3)
    cam = cornell_camera()
    a = render_gbuffer(scene, cam, cam, key, cam_cfg=cfg, params=rm)
    b = render_gbuffer(scene, cam, cam, key, cam_cfg=cfg, params=rm,
                       impl="pallas", interpret=True, normal_impl="pallas",
                       shade_impl="pallas")
    for name in ["render", "albedo", "normal", "depth", "motion"]:
        np.testing.assert_allclose(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            atol=1e-4, err_msg=name)

    def loss(alb, impl, ni):
        sc = scene.replace(materials=scene.materials.replace(albedo=alb))
        g = render_gbuffer(sc, cam, cam, key, cam_cfg=cfg, params=rm,
                           impl=impl, interpret=(impl == "pallas"),
                           normal_impl=ni)
        return jnp.sum(g.render ** 2) + jnp.sum(g.motion ** 2)

    ga = jax.grad(loss)(scene.materials.albedo, "jnp", "xla")
    gb = jax.grad(loss)(scene.materials.albedo, "pallas", "pallas")
    scale = float(jnp.abs(ga).max())
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               rtol=0, atol=1e-5 * scale)


def test_march_kernel_fused_normal_gradients():
    """The fused march+normal VJP (round 4) matches the unfused path's
    gradients: t from raymarch_pallas_with_mat + XLA sdf_normal autodiff vs
    the fused kernel + hand-assembled adjoint, w.r.t. scene geometry and
    rays (VERDICT r3 next-step #4)."""
    from raymarchdenoisercuda_tpu.config import CameraParams, RaymarchParams
    from raymarchdenoisercuda_tpu.ops.raymarch import (
        cornell_scene, cornell_camera, camera_rays, sdf_normal)
    from raymarchdenoisercuda_tpu.ops.pallas.raymarch_tpu import (
        raymarch_pallas_gbuf, raymarch_pallas_with_mat)

    scene = cornell_scene()
    cfg = CameraParams(width=64, height=48)
    params = RaymarchParams(max_steps=48)
    ro, rd, _ = camera_rays(cornell_camera(), cfg)
    w_t = jnp.linspace(0.5, 1.5, 48 * 64).reshape(48, 64)
    w_n = jnp.linspace(-1.0, 1.0, 3 * 48 * 64).reshape(3, 48, 64)

    def loss_unfused(sph, rdv):
        sc = scene.replace(sphere_params=sph)
        t, hit, _m = raymarch_pallas_with_mat(sc, ro, rdv, params, True)
        p = ro + t[None] * rdv
        n = sdf_normal(sc, p, params.normal_eps)
        n = jnp.where(jnp.sum(n * rdv, axis=0, keepdims=True) > 0, -n, n)
        return jnp.sum(w_t * t) + jnp.sum(w_n * n)

    def loss_fused(sph, rdv):
        sc = scene.replace(sphere_params=sph)
        t, hit, _m, n = raymarch_pallas_gbuf(sc, ro, rdv, params, True)
        return jnp.sum(w_t * t) + jnp.sum(w_n * n)

    g_u = jax.grad(loss_unfused, argnums=(0, 1))(scene.sphere_params, rd)
    g_f = jax.grad(loss_fused, argnums=(0, 1))(scene.sphere_params, rd)
    for name, a, b in zip(["d_sphere_params", "d_rd"], g_u, g_f):
        scale = max(float(jnp.abs(a).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=2e-3 * scale, err_msg=name)


def test_cone_seed_analytic_conservative(scene):
    """Analytic coarse cone seed (block-center rays straight from the
    camera, corner-pixel delta, base=0 for the pinhole origin): still
    skip-free, and at least as tight a delta bound as the plane-based
    deviation math it replaces."""
    from raymarchdenoisercuda_tpu.ops.raymarch import sdf_scene
    from raymarchdenoisercuda_tpu.ops.pallas.raymarch_tpu import (
        raymarch_pallas_gbuf, _cone_seed_coarse_analytic, _SEED_BLOCK)

    cam = cornell_camera()
    ro, rd, _ = camera_rays(cam, CFG)
    p1 = RaymarchParams(max_steps=64, coarse_seed=True)
    H, W = CFG.height, CFG.width
    B = _SEED_BLOCK

    t_c = np.asarray(_cone_seed_coarse_analytic(
        scene, cam, CFG, 0, 0, H, W, p1, True))
    Hc, Wc = -(-H // B), -(-W // B)
    t_c = jnp.asarray(t_c[:Hc, :Wc])
    # upsample to full res and check skip-free clearance at the seed points
    seed = jnp.repeat(jnp.repeat(t_c, B, axis=0), B, axis=1)[:H, :W]
    d_at, _ = sdf_scene(scene, ro + seed[None] * rd)
    dn = np.asarray(d_at)
    non_escaped = np.asarray(seed) < p1.max_dist
    assert dn[non_escaped].min() >= 0.5 * p1.hit_eps, dn[non_escaped].min()

    # seeded gbuf march (analytic path) agrees with the unseeded march
    p0 = RaymarchParams(max_steps=64)
    t0, h0, m0, n0 = raymarch_pallas_gbuf(scene, ro, rd, p0, True)
    t1, h1, m1, n1 = raymarch_pallas_gbuf(scene, ro, rd, p1, True,
                                          camera=cam, cam_cfg=CFG,
                                          win_origin=(0, 0))
    h0n, h1n = np.asarray(h0), np.asarray(h1)
    assert (h0n == h1n).mean() > 0.998
    both = h0n & h1n
    dt = np.abs(np.asarray(t0) - np.asarray(t1))[both]
    assert np.percentile(dt, 99) < 2 * p0.hit_eps, np.percentile(dt, 99)
