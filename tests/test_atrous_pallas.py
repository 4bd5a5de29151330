"""Parity: Pallas à-trous kernels (interpret mode) vs the jnp oracle.

Interpret mode checks kernel logic hermetically on CPU (SURVEY.md §5 "race
detection" row: interpret-vs-compiled is our sanitizer); the compiled TPU
path runs in bench.py on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raymarchdenoisercuda_tpu.config import SVGFParams
from raymarchdenoisercuda_tpu.gbuffer import luminance
from raymarchdenoisercuda_tpu.ops.atrous import (
    atrous_level_ref,
    svgf_spatial_ref,
    variance_blur3x3,
    _EPS,
)
from raymarchdenoisercuda_tpu.ops.common import finite_diff_gradients
from raymarchdenoisercuda_tpu.ops.pallas.atrous_tpu import (
    atrous_level_fwd_pallas,
    svgf_spatial_pallas,
    atrous_level,
)

P = SVGFParams()


def _scene(rng, H=40, W=56):
    color = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    variance = jnp.asarray((0.02 * rng.random((H, W))).astype(np.float32))
    n = rng.standard_normal((3, H, W)).astype(np.float32)
    n[2] += 3.0
    n /= np.sqrt((n ** 2).sum(0, keepdims=True))
    normal = jnp.asarray(n)
    depth = jnp.asarray((0.3 + 0.5 * rng.random((H, W))).astype(np.float32))
    return color, variance, normal, depth


def _sigma_denom(variance):
    return P.sigma_color * jnp.sqrt(
        jnp.maximum(variance_blur3x3(variance), 0.0)
    ) + _EPS


@pytest.mark.parametrize("level", [0, 1, 2])
def test_level_fwd_parity(rng, level):
    color, variance, normal, depth = _scene(rng)
    zgrad = finite_diff_gradients(depth)
    want_c, want_v = atrous_level_ref(
        color, variance, normal, depth, zgrad, level=level, params=P
    )
    got_c, got_v, norm = atrous_level_fwd_pallas(
        color, variance, normal, depth, zgrad, _sigma_denom(variance),
        level=level, params=P, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), rtol=2e-5, atol=2e-7)
    assert np.all(np.asarray(norm) > 0)


def test_multilevel_parity(rng):
    color, variance, normal, depth = _scene(rng)
    params = SVGFParams(iterations=3)
    want_c, want_v = svgf_spatial_ref(
        color, variance, normal, depth, params=params, detach_weights=True
    )
    got_c, got_v = svgf_spatial_pallas(
        color, variance, normal, depth, params=params, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c), rtol=5e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), rtol=5e-5, atol=1e-6)


def test_vjp_parity_vs_oracle_autodiff(rng):
    """Hand-written Pallas backward == jnp autodiff of the detached oracle."""
    color, variance, normal, depth = _scene(rng, 24, 32)
    zgrad = finite_diff_gradients(depth)
    sden = _sigma_denom(variance)

    def loss_oracle(c, v):
        oc, ov = atrous_level_ref(c, v, normal, depth, zgrad, level=1,
                                  params=P, detach_weights=True)
        return jnp.sum(jnp.sin(oc)) + jnp.sum(ov * ov)

    def loss_pallas(c, v):
        oc, ov = atrous_level(c, v, normal, depth, zgrad, sden, 1, P, True)
        return jnp.sum(jnp.sin(oc)) + jnp.sum(ov * ov)

    gc_w, gv_w = jax.grad(loss_oracle, argnums=(0, 1))(color, variance)
    gc_g, gv_g = jax.grad(loss_pallas, argnums=(0, 1))(color, variance)
    np.testing.assert_allclose(np.asarray(gc_g), np.asarray(gc_w), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gv_g), np.asarray(gv_w), rtol=1e-4, atol=1e-6)


def test_vjp_multilevel_parity(rng):
    color, variance, normal, depth = _scene(rng, 24, 32)
    params = SVGFParams(iterations=2)

    def loss_oracle(c):
        oc, _ = svgf_spatial_ref(c, variance, normal, depth, params=params,
                                 detach_weights=True)
        return jnp.sum(oc ** 2)

    def loss_pallas(c):
        # recompute: the exact transposed-stencil adjoint (the stored-bf16
        # default is covered by test_chained_stored_bwd_matches_recompute)
        oc, _ = svgf_spatial_pallas(c, variance, normal, depth, params=params,
                                    interpret=True, bwd_impl="recompute")
        return jnp.sum(oc ** 2)

    g_w = jax.grad(loss_oracle)(color)
    g_g = jax.grad(loss_pallas)(color)
    np.testing.assert_allclose(np.asarray(g_g), np.asarray(g_w), rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("wmath,ftol", [("exact", 5e-5), ("fast", 4e-4)])
def test_radius1_mode_parity(rng, wmath, ftol):
    """radius=1 × 5 iterations — the quality-validated cheap headline mode
    (−0.11 dB PSNR vs radius-2 at 256²/1024-spp ground truth, 2.06×
    throughput; tools/denoise_quality.py + tools/variant_probe.py) — must
    match the jnp oracle at the same radius: forward at weight-math
    tolerance, gradients through the stored-bf16 adjoint at quantization
    tolerance."""
    color, variance, normal, depth = _scene(rng)
    params = SVGFParams(iterations=5, radius=1)
    want_c, want_v = svgf_spatial_ref(
        color, variance, normal, depth, params=params, detach_weights=True)
    got_c, got_v = svgf_spatial_pallas(
        color, variance, normal, depth, params=params, interpret=True,
        weight_math=wmath)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=ftol, atol=ftol * 0.2)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=ftol, atol=ftol * 0.02)

    def loss_oracle(c):
        oc, _ = svgf_spatial_ref(c, variance, normal, depth, params=params,
                                 detach_weights=True)
        return jnp.sum(oc ** 2)

    def loss_pallas(c):
        oc, _ = svgf_spatial_pallas(c, variance, normal, depth, params=params,
                                    interpret=True, weight_math=wmath)
        return jnp.sum(oc ** 2)

    g_w = jax.grad(loss_oracle)(color)
    g_g = jax.grad(loss_pallas)(color)
    scale = float(jnp.abs(g_w).max())
    np.testing.assert_allclose(np.asarray(g_g), np.asarray(g_w),
                               rtol=0, atol=2e-3 * scale)


@pytest.mark.parametrize("radius", [1, 2])
def test_luma_only_deep_levels_parity(rng, radius):
    """SVGFParams.luma_only_from (cheaper-filter study, VERDICT r3 #2b):
    levels >= the threshold drop the depth/normal edge-stopping terms.
    The Pallas chained stored path must match the jnp oracle's mode, and
    gradients carry through the weight-agnostic stored adjoint."""
    color, variance, normal, depth = _scene(rng)
    params = SVGFParams(iterations=5, radius=radius, luma_only_from=3)
    want_c, want_v = svgf_spatial_ref(
        color, variance, normal, depth, params=params, detach_weights=True)
    got_c, got_v = svgf_spatial_pallas(
        color, variance, normal, depth, params=params, interpret=True)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=5e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=5e-5, atol=1e-6)

    def loss_oracle(c):
        oc, _ = svgf_spatial_ref(c, variance, normal, depth, params=params,
                                 detach_weights=True)
        return jnp.sum(oc ** 2)

    def loss_pallas(c):
        oc, _ = svgf_spatial_pallas(c, variance, normal, depth, params=params,
                                    interpret=True)
        return jnp.sum(oc ** 2)

    g_w = jax.grad(loss_oracle)(color)
    g_g = jax.grad(loss_pallas)(color)
    scale = float(jnp.abs(g_w).max())
    np.testing.assert_allclose(np.asarray(g_g), np.asarray(g_w),
                               rtol=0, atol=2e-3 * scale)

    # the mode is live: deep levels actually change the output
    base_c, _ = svgf_spatial_ref(color, variance, normal, depth,
                                 params=SVGFParams(iterations=5,
                                                   radius=radius),
                                 detach_weights=True)
    assert float(jnp.abs(want_c - base_c).max()) > 1e-3


@pytest.mark.slow
def test_bf16_mode_quality_and_gradients():
    """bf16 kernel mode (staged planes + tap math in bfloat16, f32
    accumulators, exp-form normal weight): output within ~2% of the f32
    oracle and gradient direction preserved.  Full quality characterization:
    tools/quality_eval.py.

    Uses a private fixed-seed generator, NOT the session ``rng`` fixture:
    the 2% threshold is data-dependent (bf16 tail error on unlucky draws),
    so the scene must not depend on which tests ran before this one."""
    rng = np.random.default_rng(1234)
    color, variance, normal, depth = _scene(rng, 32, 64)
    params = SVGFParams(iterations=3)

    want, wv = svgf_spatial_ref(color, variance, normal, depth,
                                params=params, detach_weights=True)
    got, gv = svgf_spatial_pallas(color, variance, normal, depth,
                                  params=params, interpret=True,
                                  precision="bf16")
    scale = float(np.abs(np.asarray(want)).max())
    err = np.abs(np.asarray(got) - np.asarray(want)).max() / scale
    assert err < 0.02, f"bf16 relative error {err:.4f} too large"

    def loss(c, precision):
        oc, _ = svgf_spatial_pallas(c, variance, normal, depth, params=params,
                                    interpret=True, precision=precision)
        return jnp.sum(oc ** 2)

    g32 = np.asarray(jax.grad(lambda c: loss(c, "f32"))(color)).ravel()
    g16 = np.asarray(jax.grad(lambda c: loss(c, "bf16"))(color)).ravel()
    cos = float(np.dot(g32, g16)
                / max(np.linalg.norm(g32) * np.linalg.norm(g16), 1e-30))
    assert cos > 0.995, f"bf16 gradient cosine {cos:.5f}"


@pytest.mark.slow
def test_weight_grads_full_adjoint_matches_oracle(rng):
    """detach_weights=False semantics on the Pallas path (VERDICT round-1
    missing #1): gradients flow through the edge-stopping weights into ALL
    guidance planes.  d_color/d_variance/d_normal compare tightly against the
    f32 oracle; d_depth is compared loosely because the ORACLE's own f32
    value carries catastrophic-cancellation noise (the d=0 tap's 1/eps
    reciprocal times jax's sign(0)=±1 abs-gradient creates ~1e7-magnitude
    center/neighbor terms that cancel analytically; the kernel uses
    sign(0)=0 so it never forms them — an f64 oracle comparison in
    tools/check_wgrad_f64.py shows the kernel at ~1e-5 relative on all six
    inputs)."""
    color, variance, normal, depth = _scene(rng, 32, 64)
    params = SVGFParams(iterations=2)

    def loss_oracle(c, v, nn, z):
        oc, ov = svgf_spatial_ref(c, v, nn, z, params=params,
                                  detach_weights=False)
        return jnp.sum(jnp.sin(oc)) + jnp.sum(ov * ov)

    def loss_pallas(c, v, nn, z):
        oc, ov = svgf_spatial_pallas(c, v, nn, z, params=params,
                                     interpret=True, weight_grads=True)
        return jnp.sum(jnp.sin(oc)) + jnp.sum(ov * ov)

    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(color, variance, normal,
                                                     depth)
    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(color, variance, normal,
                                                     depth)
    for name, a, b, rtol in [
        ("d_color", go[0], gp[0], 1e-4),
        ("d_variance", go[1], gp[1], 1e-4),
        ("d_normal", go[2], gp[2], 5e-4),
        ("d_depth", go[3], gp[3], 0.15),
    ]:
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-30)
        err = np.abs(a - b).max() / scale
        assert err < rtol, f"{name}: rel err {err:.2e} > {rtol}"


@pytest.mark.slow
def test_weight_grads_differ_from_detached(rng):
    """The weight-gradient term must actually change the gradients (guards
    against the wgrad path silently reusing the detached adjoint)."""
    color, variance, normal, depth = _scene(rng, 24, 32)
    params = SVGFParams(iterations=1)

    def loss(c, wg):
        oc, _ = svgf_spatial_pallas(c, variance, normal, depth, params=params,
                                    interpret=True, weight_grads=wg)
        return jnp.sum(oc ** 2)

    g_det = jax.grad(lambda c: loss(c, False))(color)
    g_full = jax.grad(lambda c: loss(c, True))(color)
    assert np.abs(np.asarray(g_det) - np.asarray(g_full)).max() > 1e-5


@pytest.mark.slow
def test_chained_sweep_bit_exact_vs_per_level(rng):
    """Canvas-chained sweep (pad-once, canvas in/out DMA) must be
    bit-identical to the per-level wrapper path — the canvases hold exactly
    the zero-padded arrays the per-level path rebuilds each level.  The
    bit-exact contract is on ``bwd_impl="recompute"`` (XLA-side isd2); the
    default stored mode derives the σ-denominator in-kernel (fused separable
    variance blur + Newton reciprocal), which rounds a few ulps differently."""
    color, variance, normal, depth = _scene(rng, 65, 130)
    params = SVGFParams(iterations=5, feedback_level=2)

    def run(chained, bwd_impl="recompute"):
        return svgf_spatial_pallas(color, variance, normal, depth,
                                   params=params, interpret=True,
                                   chained=chained, bwd_impl=bwd_impl,
                                   return_feedback=True)

    for a, b in zip(run(True), run(False)):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    for a, b in zip(run(True, "stored"), run(False)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-5)

    def loss(c, v, chained):
        # bwd_impl="recompute": the per-level path always recomputes, so the
        # bit-exact gradient contract is against the recompute chained mode
        oc, ov, fb = svgf_spatial_pallas(c, v, normal, depth, params=params,
                                         interpret=True, chained=chained,
                                         return_feedback=True,
                                         bwd_impl="recompute")
        return jnp.sum(oc ** 2) + jnp.sum(ov) + 0.5 * jnp.sum(fb ** 2)

    gch = jax.grad(lambda c, v: loss(c, v, True), argnums=(0, 1))(
        color, variance)
    gpl = jax.grad(lambda c, v: loss(c, v, False), argnums=(0, 1))(
        color, variance)
    for a, b in zip(gch, gpl):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
@pytest.mark.parametrize("bwd_impl,rtol", [("stored_f32", 2e-4),
                                           ("stored", 3e-3)])
def test_chained_stored_bwd_matches_recompute(rng, bwd_impl, rtol):
    """Stored-weight chained backward (fwd emits the 25 weight planes; bwd is
    FMA-only) must match the recompute backward: f32 storage to ~recip-ulp,
    bf16 storage to the 2^-8 weight quantization.  The stored modes derive
    the σ-denominator in-kernel (fused variance blur) while recompute keeps
    it XLA-side, so the primal agrees to a few ulps rather than bit-exactly;
    the stored adjoint remains exact w.r.t. its OWN forward's weights."""
    color, variance, normal, depth = _scene(rng, 48, 130)
    params = SVGFParams(iterations=3, feedback_level=1)

    def loss(c, v, impl):
        oc, ov = svgf_spatial_pallas(c, v, normal, depth, params=params,
                                     interpret=True, bwd_impl=impl)
        return jnp.sum(oc ** 2) + jnp.sum(ov * 1.7)

    l_rec = loss(color, variance, "recompute")
    l_sto = loss(color, variance, bwd_impl)
    assert float(jnp.abs(l_rec - l_sto)) <= 1e-5 * float(jnp.abs(l_rec))

    g_rec = jax.grad(lambda c, v: loss(c, v, "recompute"), argnums=(0, 1))(
        color, variance)
    g_sto = jax.grad(lambda c, v: loss(c, v, bwd_impl), argnums=(0, 1))(
        color, variance)
    for a, b in zip(g_sto, g_rec):
        scale = float(jnp.max(jnp.abs(b))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=rtol)


@pytest.mark.slow
def test_fast_weight_math_close_to_exact(rng):
    """weight_math="fast" (one deg-3 exp2 per tap, normal weight folded into
    the exp argument) must stay within ~1e-4 relative of the exact-weights
    sweep — the bound the svgf_spatial_pallas docstring advertises."""
    color, variance, normal, depth = _scene(rng, 48, 130)
    params = SVGFParams(iterations=4, feedback_level=1)

    def run(wm):
        return svgf_spatial_pallas(color, variance, normal, depth,
                                   params=params, interpret=True,
                                   weight_math=wm, return_feedback=True)

    exact, fast = run("exact"), run("fast")
    for a, b in zip(fast, exact):
        scale = float(jnp.max(jnp.abs(b))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=2e-4)

    # gradients flow through the same stored-weight backward; the per-level
    # weight error compounds through 4 levels of chain rule, so the bound
    # is an order looser than the forward's
    def loss(c, v, wm):
        oc, ov = svgf_spatial_pallas(c, v, normal, depth, params=params,
                                     interpret=True, weight_math=wm)
        return jnp.sum(oc ** 2) + jnp.sum(ov * 1.7)

    g_ex = jax.grad(lambda c, v: loss(c, v, "exact"), argnums=(0, 1))(
        color, variance)
    g_fa = jax.grad(lambda c, v: loss(c, v, "fast"), argnums=(0, 1))(
        color, variance)
    for a, b in zip(g_fa, g_ex):
        scale = float(jnp.max(jnp.abs(b))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=2e-3)


def test_fast_weight_math_rejects_unsupported_modes(rng):
    color, variance, normal, depth = _scene(rng, 32, 130)
    with pytest.raises(ValueError, match="stored bwd_impl"):
        svgf_spatial_pallas(color, variance, normal, depth, interpret=True,
                            weight_math="fast", bwd_impl="recompute")
    with pytest.raises(ValueError, match="chained"):
        svgf_spatial_pallas(color, variance, normal, depth, interpret=True,
                            weight_math="fast", chained=False)


@pytest.mark.parametrize("radius", [1, 2])
def test_inference_mode_no_weight_canvases(rng, radius):
    """bwd_impl='none' (round 5): the weight-canvas-free inference forward
    (fused σ-denominator, no stored-weight writes) is BIT-IDENTICAL to the
    stored forward — the kernels run the same math, only the residual
    outputs differ — and differentiating it raises loudly."""
    color, variance, normal, depth = _scene(rng)
    params = SVGFParams(iterations=5, radius=radius)
    want = svgf_spatial_pallas(color, variance, normal, depth, params=params,
                               interpret=True, bwd_impl="stored")
    got = svgf_spatial_pallas(color, variance, normal, depth, params=params,
                              interpret=True, bwd_impl="none")
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))

    def loss(c):
        oc, _ = svgf_spatial_pallas(c, variance, normal, depth,
                                    params=params, interpret=True,
                                    bwd_impl="none")
        return jnp.sum(oc ** 2)

    with pytest.raises(RuntimeError, match="inference-only"):
        jax.grad(loss)(color)
