"""Temporal reprojection / accumulation tests (ops/temporal.py) and the
sharded variant's parity (parallel/sharded.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raymarchdenoisercuda_tpu.config import SVGFParams
from raymarchdenoisercuda_tpu.gbuffer import GBuffer, History
from raymarchdenoisercuda_tpu.ops.temporal import (
    bilinear_gather,
    temporal_accumulate,
    spatial_moments,
)

P = SVGFParams()


def _gbuf(rng, H=24, W=32, motion=None):
    color = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    albedo = jnp.full((3, H, W), 0.7)
    normal = jnp.zeros((3, H, W)).at[2].set(1.0)
    depth = jnp.full((H, W), 0.5)
    m = jnp.zeros((2, H, W)) if motion is None else motion
    return GBuffer(render=color, albedo=albedo, normal=normal, depth=depth, motion=m)


def _warm_history(gbuf, n=5.0):
    H, W = gbuf.shape
    return History(
        color=gbuf.render * 0 + 0.25,
        moments=jnp.stack([jnp.full((H, W), 0.25), jnp.full((H, W), 0.0625 + 1e-4)]),
        length=jnp.full((H, W), n),
        prev_depth=gbuf.depth,
        prev_normal=gbuf.normal,
    )


def test_bilinear_gather_identity(rng):
    x = jnp.asarray(rng.random((3, 9, 11), dtype=np.float32))
    ys = jnp.arange(9, dtype=jnp.float32)[:, None] * jnp.ones((1, 11))
    xs = jnp.ones((9, 1)) * jnp.arange(11, dtype=jnp.float32)[None, :]
    out = bilinear_gather(x, ys, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_bilinear_gather_interpolates(rng):
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4))
    ys = jnp.full((1, 1), 0.5)
    xs = jnp.full((1, 1), 1.5)
    out = bilinear_gather(x, ys, xs)
    # average of x[0,0,1], x[0,0,2], x[0,1,1], x[0,1,2] = (1+2+5+6)/4
    np.testing.assert_allclose(float(out[0, 0, 0]), 3.5, atol=1e-6)


def test_first_frame_uses_current_color(rng):
    g = _gbuf(rng)
    out, var, hist = temporal_accumulate(g, History.zeros(*g.shape), params=P)
    np.testing.assert_allclose(np.asarray(out), np.asarray(g.render), atol=1e-6)
    assert float(np.asarray(hist.length).min()) == 1.0
    assert np.asarray(var).min() >= 0


def test_valid_history_blends(rng):
    g = _gbuf(rng)
    hist = _warm_history(g)
    params = SVGFParams(history_clamp=False)
    out, _, hist2 = temporal_accumulate(g, hist, params=params)
    expect = 0.8 * 0.25 + 0.2 * np.asarray(g.render)  # alpha=max(0.2, 1/6)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-6)
    assert float(np.asarray(hist2.length).max()) == 6.0


def test_depth_mismatch_rejects_history(rng):
    g = _gbuf(rng)
    hist = _warm_history(g).replace(prev_depth=jnp.full(g.shape, 0.9))
    out, _, hist2 = temporal_accumulate(g, hist, params=P)
    np.testing.assert_allclose(np.asarray(out), np.asarray(g.render), atol=1e-6)
    assert float(np.asarray(hist2.length).max()) == 1.0


def test_motion_shifts_history(rng):
    H, W = 24, 32
    # history has a bright column at x=10; motion says "previous pixel is at
    # x+4", so current x=6 should pick up the bright history column
    hist_color = jnp.zeros((3, H, W)).at[:, :, 10].set(1.0)
    motion = jnp.zeros((2, H, W)).at[1].set(4.0)
    g = _gbuf(rng, H, W, motion=motion)
    hist = _warm_history(g).replace(color=hist_color)
    params = SVGFParams(history_clamp=False)
    out, _, _ = temporal_accumulate(g, hist, params=params)
    got = np.asarray(out)
    base = np.asarray(g.render)
    lift = got - 0.2 * base  # (1-alpha)*hist contribution
    assert lift[:, 5, 6].mean() > 0.7  # bright column reprojected to x=6
    assert lift[:, 5, 12].mean() < 0.05


def test_spatial_moments_constant():
    lum = jnp.full((16, 16), 0.3)
    m1, m2 = spatial_moments(lum)
    np.testing.assert_allclose(np.asarray(m1), 0.3, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m2), 0.09, rtol=1e-5)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_sharded_temporal_matches_single(rng):
    from jax.sharding import PartitionSpec as Pspec
    from jax import shard_map
    from raymarchdenoisercuda_tpu.parallel.mesh import make_mesh
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        temporal_accumulate_local, PLANE, PLANES,
    )

    H = W = 32
    motion = jnp.zeros((2, H, W)).at[1].set(2.0).at[0].set(-1.0)
    g = _gbuf(rng, H, W, motion=motion)
    hist = _warm_history(g).replace(
        color=jnp.asarray(rng.random((3, H, W), dtype=np.float32)))
    params = SVGFParams(history_clamp=True)

    want_c, want_v, want_h = temporal_accumulate(g, hist, params=params)

    mesh = make_mesh(4)
    gb_specs = GBuffer(render=PLANES, albedo=PLANES, normal=PLANES,
                       depth=PLANE, motion=PLANES, denoised=None)
    h_specs = History(color=PLANES, moments=PLANES, length=PLANE,
                      prev_depth=PLANE, prev_normal=PLANES)
    fn = shard_map(
        lambda gb, h: temporal_accumulate_local(gb, h, H, W, params=params),
        mesh=mesh, in_specs=(gb_specs, h_specs),
        out_specs=(PLANES, PLANE, h_specs), check_vma=False)
    got_c, got_v, got_h = fn(g.replace(denoised=None), hist)

    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_h.length), np.asarray(want_h.length))


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
@pytest.mark.parametrize("mag", [5.0, 5.5, 6.0, 6.5, 7.0, 8.0])
def test_sharded_temporal_boundary_motion_parity(rng, mag):
    """Sharded and single-device paths share one disocclusion policy:
    |motion| <= params.max_motion accepted (inclusive) in BOTH.  Exercised at
    the boundary magnitudes the round-1 suite missed (VERDICT weak #3):
    with max_motion=6, magnitudes 5/5.5/6 accept history, 6.5/7/8 reject."""
    from jax import shard_map
    from raymarchdenoisercuda_tpu.parallel.mesh import make_mesh
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        temporal_accumulate_local, PLANE, PLANES,
    )

    H = W = 64
    motion = jnp.zeros((2, H, W)).at[0].set(mag).at[1].set(-mag)
    g = _gbuf(rng, H, W, motion=motion)
    hist = _warm_history(g).replace(
        color=jnp.asarray(rng.random((3, H, W), dtype=np.float32)))
    params = SVGFParams(history_clamp=True, max_motion=6)

    want_c, want_v, want_h = temporal_accumulate(g, hist, params=params)
    if mag > params.max_motion:
        # rejected history == first-frame behavior: output is current color
        np.testing.assert_allclose(np.asarray(want_c), np.asarray(g.render),
                                   atol=1e-6)

    mesh = make_mesh(4)
    gb_specs = GBuffer(render=PLANES, albedo=PLANES, normal=PLANES,
                       depth=PLANE, motion=PLANES, denoised=None)
    h_specs = History(color=PLANES, moments=PLANES, length=PLANE,
                      prev_depth=PLANE, prev_normal=PLANES)
    fn = shard_map(
        lambda gb, h: temporal_accumulate_local(gb, h, H, W, params=params),
        mesh=mesh, in_specs=(gb_specs, h_specs),
        out_specs=(PLANES, PLANE, h_specs), check_vma=False)
    got_c, got_v, got_h = fn(g.replace(denoised=None), hist)

    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_h.length),
                               np.asarray(want_h.length))


def test_sharded_temporal_unbounded_motion_raises(rng):
    """max_motion=None (exact gather) cannot be halo-exchanged — loud error."""
    from raymarchdenoisercuda_tpu.parallel.sharded import temporal_accumulate_local

    g = _gbuf(rng, 16, 16)
    hist = _warm_history(g)
    with pytest.raises(ValueError, match="max_motion"):
        temporal_accumulate_local(g, hist, 16, 16,
                                  params=SVGFParams(max_motion=None))


@pytest.mark.parametrize("mdesc,make_motion", [
    ("zero", lambda H, W: jnp.zeros((2, H, W))),
    ("uniform_frac", lambda H, W: jnp.zeros((2, H, W)).at[0].set(1.3).at[1].set(-2.7)),
    ("varying", lambda H, W: jnp.stack([
        jnp.linspace(-5.5, 5.5, H)[:, None] * jnp.ones((1, W)),
        jnp.linspace(5.5, -5.5, W)[None, :] * jnp.ones((H, 1))])),
    ("over_limit", lambda H, W: jnp.zeros((2, H, W)).at[0].set(7.2)),
])
def test_temporal_pallas_kernel_parity(rng, mdesc, make_motion):
    """Fused Pallas temporal kernel (dynamic per-band offset ranges) is
    bit-comparable to temporal_accumulate (interpret mode)."""
    from raymarchdenoisercuda_tpu.ops.pallas.temporal_tpu import (
        temporal_accumulate_pallas)

    H, W = 48, 160
    g = _gbuf(rng, H, W, motion=make_motion(H, W))
    hist = _warm_history(g).replace(
        color=jnp.asarray(rng.random((3, H, W), dtype=np.float32)))
    params = SVGFParams()

    wi, wv, wh = temporal_accumulate(g, hist, params=params)
    gi, gv, gh = temporal_accumulate_pallas(g, hist, params=params,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(wi), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gh.moments), np.asarray(wh.moments),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(gh.length),
                                  np.asarray(wh.length))


def test_temporal_pallas_requires_bounded_motion(rng):
    from raymarchdenoisercuda_tpu.ops.pallas.temporal_tpu import (
        temporal_accumulate_pallas)

    g = _gbuf(rng, 16, 16)
    with pytest.raises(ValueError, match="max_motion"):
        temporal_accumulate_pallas(g, _warm_history(g),
                                   params=SVGFParams(max_motion=None))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
@pytest.mark.parametrize("mag", [1.3, 6.5])
def test_sharded_temporal_pallas_kernel_parity(rng, mag):
    """The fused temporal band kernel inside shard_map (halo-exchanged
    tiles, global-coordinate masks) matches the single-device oracle —
    accepted and rejected (boundary) motion magnitudes."""
    from jax import shard_map
    from raymarchdenoisercuda_tpu.parallel.mesh import make_mesh
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        temporal_accumulate_local, PLANE, PLANES,
    )

    H = W = 32
    motion = jnp.zeros((2, H, W)).at[0].set(-mag).at[1].set(mag * 0.7)
    g = _gbuf(rng, H, W, motion=motion)
    hist = _warm_history(g).replace(
        color=jnp.asarray(rng.random((3, H, W), dtype=np.float32)))
    params = SVGFParams(history_clamp=True, max_motion=6)

    want_c, want_v, want_h = temporal_accumulate(g, hist, params=params)

    mesh = make_mesh(4)
    gb_specs = GBuffer(render=PLANES, albedo=PLANES, normal=PLANES,
                       depth=PLANE, motion=PLANES, denoised=None)
    h_specs = History(color=PLANES, moments=PLANES, length=PLANE,
                      prev_depth=PLANE, prev_normal=PLANES)
    fn = shard_map(
        lambda gb, h: temporal_accumulate_local(
            gb, h, H, W, params=params, impl="pallas", interpret=True),
        mesh=mesh, in_specs=(gb_specs, h_specs),
        out_specs=(PLANES, PLANE, h_specs), check_vma=False)
    got_c, got_v, got_h = fn(g.replace(denoised=None), hist)

    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_h.length),
                               np.asarray(want_h.length))


def _rand_gbuf_hist(rng, H=40, W=48):
    r2 = np.random.default_rng(7)
    n = r2.standard_normal((3, H, W)).astype(np.float32)
    n[2] += 2.5
    n /= np.sqrt((n ** 2).sum(0, keepdims=True))
    g = GBuffer(
        render=jnp.asarray(rng.random((3, H, W), dtype=np.float32)),
        albedo=jnp.full((3, H, W), 0.7),
        normal=jnp.asarray(n),
        depth=jnp.asarray(0.5 + rng.random((H, W), dtype=np.float32)),
        motion=jnp.asarray(((rng.random((2, H, W)) - 0.5) * 8).astype(np.float32)),
    )
    hist = History(
        color=jnp.asarray(rng.random((3, H, W), dtype=np.float32)),
        moments=jnp.asarray(rng.random((2, H, W), dtype=np.float32)),
        length=jnp.asarray((rng.random((H, W)) * 6).astype(np.float32)),
        prev_depth=g.depth,
        prev_normal=g.normal,
    )
    return g, hist


def test_temporal_ad_forward_parity_interpret(rng):
    """Differentiable temporal kernel (Pallas tent gather + shared oracle
    epilogue) is bit-exact vs temporal_accumulate in the forward (round-2
    verdict item #2: the last jnp-only stage on the training path)."""
    from raymarchdenoisercuda_tpu.ops.pallas.temporal_tpu import (
        temporal_accumulate_pallas_ad)

    g, hist = _rand_gbuf_hist(rng)
    params = SVGFParams(max_motion=6)
    a = temporal_accumulate(g, hist, params=params)
    b = temporal_accumulate_pallas_ad(g, hist, params=params, interpret=True)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[2].color), np.asarray(b[2].color))
    np.testing.assert_array_equal(np.asarray(a[2].moments), np.asarray(b[2].moments))
    np.testing.assert_array_equal(np.asarray(a[2].length), np.asarray(b[2].length))


@pytest.mark.slow
def test_temporal_ad_gradient_parity_interpret(rng):
    """jax.grad through the ad kernel == oracle autodiff for every
    differentiable input (render, history color/moments/length, motion) —
    the hand-written adjoint is the transposed tent scatter plus the
    tent-derivative motion term, matching JAX's kink conventions."""
    from raymarchdenoisercuda_tpu.ops.pallas.temporal_tpu import (
        temporal_accumulate_pallas_ad)

    g, hist = _rand_gbuf_hist(rng)
    params = SVGFParams(max_motion=6)

    def loss(fn, interp):
        def L(render, hc, hm, hl, mot):
            gg = g.replace(render=render, motion=mot)
            hh = hist.replace(color=hc, moments=hm, length=hl)
            kw = {"interpret": True} if interp else {}
            i, v, nh = fn(gg, hh, params=params, **kw)
            return (jnp.sum(i ** 2) + jnp.sum(v * 1.3)
                    + jnp.sum(nh.color * 0.7) + jnp.sum(nh.moments * 0.3)
                    + jnp.sum(nh.length * 0.1))
        return L

    args = (g.render, hist.color, hist.moments, hist.length, g.motion)
    ga = jax.grad(loss(temporal_accumulate, False), argnums=(0, 1, 2, 3, 4))(*args)
    gb = jax.grad(loss(temporal_accumulate_pallas_ad, True),
                  argnums=(0, 1, 2, 3, 4))(*args)
    names = ["d_render", "d_hist_color", "d_hist_moments", "d_hist_length",
             "d_motion"]
    for name, x, y in zip(names, ga, gb):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
        assert np.abs(np.asarray(x)).max() > 0, f"{name} trivially zero"


def test_reproject_gather_hist_only_adjoint(rng):
    """motion_grad=False (the material-only training fast path): d_hist
    matches the full adjoint at fp-reassociation level and d_motion is
    exactly zero (the dead gradient it skips computing)."""
    import jax.numpy as jnp
    from raymarchdenoisercuda_tpu.ops.pallas.temporal_tpu import (
        _reproject_gather)

    H, W = 40, 56
    hist = jnp.asarray(rng.random((10, H, W), dtype=np.float32))
    motion = jnp.asarray(
        (2.0 * rng.random((2, H, W)) - 1.0).astype(np.float32) * 4.0)
    params = SVGFParams()
    wt = jnp.asarray(rng.random((10, H, W), dtype=np.float32))

    def loss(h, m, mg):
        g = _reproject_gather(h, m, params, True, mg)
        return jnp.sum(wt * g)

    gh_full, gm_full = jax.grad(loss, argnums=(0, 1))(hist, motion, True)
    gh_ho, gm_ho = jax.grad(loss, argnums=(0, 1))(hist, motion, False)
    np.testing.assert_allclose(np.asarray(gh_ho), np.asarray(gh_full),
                               rtol=1e-5, atol=1e-6)
    assert float(jnp.abs(gm_ho).max()) == 0.0
    assert float(jnp.abs(gm_full).max()) > 0.0  # the full adjoint is live


@pytest.mark.slow
def test_train_step_pallas_temporal_ad(rng):
    """make_train_step(impl='pallas') now differentiates through the
    temporal kernel (BASELINE config 4 on the full kernel path): loss is
    finite and albedo receives nonzero gradients (interpret mode)."""
    import optax
    from raymarchdenoisercuda_tpu.config import CameraParams, RaymarchParams
    from raymarchdenoisercuda_tpu.models.pipeline import (
        render_and_denoise)
    from raymarchdenoisercuda_tpu.ops.raymarch import cornell_scene, cornell_camera
    from raymarchdenoisercuda_tpu.gbuffer import History as Hist

    H = W = 48
    scene = cornell_scene()
    cfg = CameraParams(width=W, height=H)
    rm = RaymarchParams(max_steps=32, shadow_steps=16)
    sv = SVGFParams(iterations=2, max_motion=4)
    target = jnp.asarray(rng.random((3, H, W), dtype=np.float32))

    def loss_fn(albedo, history):
        s = scene.replace(materials=scene.materials.replace(albedo=albedo))
        out, nh = render_and_denoise(
            s, cornell_camera(), cornell_camera(), history,
            jax.random.PRNGKey(0), cam_cfg=cfg, rm_params=rm, svgf_params=sv,
            impl="pallas", temporal="ad")
        return jnp.mean((out.denoised - target) ** 2), nh

    from jax.experimental.pallas import tpu as pltpu

    hist = Hist.zeros(H, W)
    # run one frame to warm the history, then differentiate through frame 2
    with pltpu.force_tpu_interpret_mode():
        _, hist = loss_fn(scene.materials.albedo, hist)
        (val, _nh), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            scene.materials.albedo, hist)
    assert np.isfinite(float(val))
    gn = np.asarray(grads)
    assert np.isfinite(gn).all()
    assert np.abs(gn[:3]).max() > 0


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_sharded_temporal_ad_forward_parity(rng):
    """impl="pallas_ad" inside shard_map: the differentiable tent-gather
    kernel on halo-exchanged tiles matches the single-device oracle —
    the sharded training path's temporal kernel route."""
    from jax import shard_map
    from raymarchdenoisercuda_tpu.parallel.mesh import make_mesh
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        temporal_accumulate_local, PLANE, PLANES,
    )

    H = W = 32
    motion = jnp.zeros((2, H, W)).at[1].set(2.25).at[0].set(-1.5)
    g = _gbuf(rng, H, W, motion=motion)
    hist = _warm_history(g).replace(
        color=jnp.asarray(rng.random((3, H, W), dtype=np.float32)))
    params = SVGFParams(history_clamp=True, max_motion=4)

    want_c, want_v, want_h = temporal_accumulate(g, hist, params=params)

    mesh = make_mesh(4)
    gb_specs = GBuffer(render=PLANES, albedo=PLANES, normal=PLANES,
                       depth=PLANE, motion=PLANES, denoised=None)
    h_specs = History(color=PLANES, moments=PLANES, length=PLANE,
                      prev_depth=PLANE, prev_normal=PLANES)
    fn = shard_map(
        lambda gb, h: temporal_accumulate_local(
            gb, h, H, W, params=params, impl="pallas_ad", interpret=True),
        mesh=mesh, in_specs=(gb_specs, h_specs),
        out_specs=(PLANES, PLANE, h_specs), check_vma=False)
    got_c, got_v, got_h = fn(g.replace(denoised=None), hist)

    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_h.length),
                               np.asarray(want_h.length))


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_sharded_temporal_ad_gradient_parity(rng):
    """jax.grad through shard_map + the tent-gather custom VJP == oracle
    autodiff: ppermute transposes route halo gradients back to the owning
    tiles, the kernel adjoint handles the tent scatter + motion term."""
    from jax import shard_map
    from raymarchdenoisercuda_tpu.parallel.mesh import make_mesh
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        temporal_accumulate_local, PLANE, PLANES,
    )

    H = W = 32
    motion = jnp.zeros((2, H, W)).at[1].set(1.75).at[0].set(-0.5)
    g = _gbuf(rng, H, W, motion=motion)
    hist = _warm_history(g).replace(
        color=jnp.asarray(rng.random((3, H, W), dtype=np.float32)))
    params = SVGFParams(history_clamp=True, max_motion=4)

    mesh = make_mesh(4)
    gb_specs = GBuffer(render=PLANES, albedo=PLANES, normal=PLANES,
                       depth=PLANE, motion=PLANES, denoised=None)
    h_specs = History(color=PLANES, moments=PLANES, length=PLANE,
                      prev_depth=PLANE, prev_normal=PLANES)

    def make_loss(fn):
        def L(render, hc, mot):
            gg = g.replace(render=render, motion=mot, denoised=None)
            hh = hist.replace(color=hc)
            i, v, nh = fn(gg, hh)
            return (jnp.sum(i ** 2) + jnp.sum(v * 1.3)
                    + jnp.sum(nh.color * 0.7) + jnp.sum(nh.length * 0.1))
        return L

    sharded = shard_map(
        lambda gb, h: temporal_accumulate_local(
            gb, h, H, W, params=params, impl="pallas_ad", interpret=True),
        mesh=mesh, in_specs=(gb_specs, h_specs),
        out_specs=(PLANES, PLANE, h_specs), check_vma=False)

    args = (g.render, hist.color, g.motion)
    ga = jax.grad(make_loss(lambda gb, h: temporal_accumulate(
        gb, h, params=params)), argnums=(0, 1, 2))(*args)
    gb = jax.grad(make_loss(sharded), argnums=(0, 1, 2))(*args)
    for name, x, y in zip(["d_render", "d_hist_color", "d_motion"], ga, gb):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
        assert np.abs(np.asarray(x)).max() > 0, f"{name} trivially zero"


def test_temporal_pallas_no_boost_config_parity(rng):
    """variance_boost_frames=0 skips the 7x7 spatial-moment window at trace
    time in the fused kernel (round 5) — outputs must still match the
    oracle exactly (the fallback could never be selected)."""
    from raymarchdenoisercuda_tpu.ops.pallas.temporal_tpu import (
        temporal_accumulate_pallas)

    g, hist = _rand_gbuf_hist(rng)
    params = SVGFParams(max_motion=6, variance_boost_frames=0)
    a = temporal_accumulate(g, hist, params=params)
    b = temporal_accumulate_pallas(g, hist, params=params, interpret=True)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
