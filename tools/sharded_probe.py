"""Single-chip sharded-overhead probe: svgf_spatial_sharded on a 1x1 mesh
(canvas-chained vs per-level tile kernels) against the unsharded canvas
chain, chain-slope timed IN ONE PROCESS (the chip behind the tunnel is
time-sliced; cross-process numbers are not comparable).

Round-3 context: the per-level tile path measured 8.06 ms fwd vs 5.13 ms
unsharded at 1080p (+57%, ROADMAP) — the canvas-chained tile sweep is the
documented fix (guidance canvases exchanged once, h-wide margin refreshes
between levels, no per-level pad/crop).

Usage: python tools/sharded_probe.py [--size 1080p|512] [--grad]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _chain_time
from raymarchdenoisercuda_tpu.config import SVGFParams
from raymarchdenoisercuda_tpu.ops.pallas.atrous_tpu import svgf_spatial_pallas
from raymarchdenoisercuda_tpu.parallel.sharded import svgf_spatial_sharded


def _scene(rng, H, W):
    color = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    variance = jnp.asarray((0.02 * rng.random((H, W))).astype(np.float32))
    n = rng.standard_normal((3, H, W)).astype(np.float32)
    n[2] += 3.0
    n /= np.sqrt((n ** 2).sum(0, keepdims=True))
    depth = jnp.asarray((0.3 + 0.5 * rng.random((H, W))).astype(np.float32))
    return color, variance, jnp.asarray(n), depth


def _mesh11():
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1),
                ("data", "y", "x"))


def probe_pipeline(H, W, iterations, radius=2, luma_from=None):
    """Full frame pipeline (raymarch -> temporal -> SVGF), sharded 1x1 mesh
    vs unsharded, one process."""
    import jax.random as jr
    from raymarchdenoisercuda_tpu.config import (CameraParams, RaymarchParams)
    from raymarchdenoisercuda_tpu.gbuffer import History
    from raymarchdenoisercuda_tpu.models.svgf import svgf_denoise_frame
    from raymarchdenoisercuda_tpu.ops.raymarch import (cornell_scene,
                                                       cornell_camera,
                                                       render_gbuffer)
    from raymarchdenoisercuda_tpu.parallel.sharded import make_sharded_pipeline

    cam_cfg = CameraParams(width=W, height=H)
    rm = RaymarchParams()
    svgf = SVGFParams(iterations=iterations, radius=radius,
                      luma_only_from=luma_from)
    scene = cornell_scene()
    cam = cornell_camera()

    def make_unsharded(n):
        @jax.jit
        def f(key):
            hist = History.zeros(H, W)

            def body(i, carry):
                hist, key, acc = carry
                key, sub = jr.split(key)
                g = render_gbuffer(scene, cam, cam, sub, cam_cfg=cam_cfg,
                                   params=rm, impl="pallas",
                                   normal_impl="pallas")
                out, hist = svgf_denoise_frame(g, hist, params=svgf,
                                               impl="pallas",
                                               weight_math="fast")
                return (hist, key, acc + jnp.sum(out.denoised))

            hist, _, acc = jax.lax.fori_loop(0, n, body,
                                             (hist, key, jnp.float32(0.0)))
            return jnp.sum(hist.color) + acc
        return f

    mesh = _mesh11()
    from raymarchdenoisercuda_tpu.parallel.sharded import init_history_canvas
    frame = make_sharded_pipeline(mesh, H, W, cam_cfg=cam_cfg, rm_params=rm,
                                  svgf_params=svgf, impl="pallas",
                                  weight_math="fast")
    hist0 = init_history_canvas(mesh, H, W, svgf)

    def make_sharded(n):
        @jax.jit
        def f(key):
            def body(i, carry):
                hist, key, acc = carry
                key, sub = jr.split(key)
                g, hist = frame(scene, cam, cam, hist, sub)
                return (hist, key, acc + jnp.sum(g.denoised))

            hist, _, acc = jax.lax.fori_loop(0, n, body,
                                             (hist0, key, jnp.float32(0.0)))
            return jnp.sum(hist) + acc
        return f

    mpix = H * W / 1e6
    for name, mk in [("pipe_unsharded", make_unsharded),
                     ("pipe_sharded", make_sharded)]:
        dt = _chain_time(mk, jr.PRNGKey(0), n_lo=2, n_hi=8)
        print(f"{name:18s} {dt * 1e3:7.2f} ms  {mpix / dt:8.1f} Mpix/s",
              flush=True)


def probe_train(H, W, iterations, radius=2, luma_from=None):
    """Full train step (render -> ad-temporal -> SVGF -> material grads ->
    adam), sharded 1x1 mesh vs unsharded, one process."""
    import optax
    import jax.random as jr
    from raymarchdenoisercuda_tpu.config import (CameraParams, RaymarchParams)
    from raymarchdenoisercuda_tpu.gbuffer import History
    from raymarchdenoisercuda_tpu.models.pipeline import (make_train_step,
                                                          init_train_state)
    from raymarchdenoisercuda_tpu.ops.raymarch import (cornell_scene,
                                                       cornell_camera)
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        make_sharded_train_step)

    scene = cornell_scene()
    cam = cornell_camera()
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    opt = optax.adam(1e-2)
    cam_cfg = CameraParams(width=W, height=H)
    rm = RaymarchParams()
    svgf = SVGFParams(iterations=iterations, radius=radius,
                      luma_only_from=luma_from)

    step_u = make_train_step(scene, cam, target, opt, cam_cfg=cam_cfg,
                             rm_params=rm, svgf_params=svgf, impl="pallas")
    state0 = init_train_state(scene.materials.albedo, opt, H, W,
                              jr.PRNGKey(0))

    def make_unsharded(n):
        @jax.jit
        def f(state):
            def body(i, carry):
                state, acc = carry
                state, loss = step_u(state)
                return (state, acc + loss)
            state, acc = jax.lax.fori_loop(0, n, body,
                                           (state, jnp.float32(0.0)))
            return jnp.sum(state.albedo) + acc
        return f

    mesh = _mesh11()
    step_s = make_sharded_train_step(mesh, scene, cam, target, opt,
                                     cam_cfg=cam_cfg, rm_params=rm,
                                     svgf_params=svgf, impl="pallas")
    albedo0 = scene.materials.albedo
    opt0 = opt.init(albedo0)
    # the kernel train path carries the temporal history as a margin canvas
    from raymarchdenoisercuda_tpu.parallel.sharded import init_history_canvas
    hist0 = init_history_canvas(mesh, H, W, svgf)

    def make_sharded(n):
        @jax.jit
        def f(key):
            def body(i, carry):
                albedo, opt_state, hist, key, acc = carry
                albedo, opt_state, hist, key, loss = step_s(
                    albedo, opt_state, hist, key)
                return (albedo, opt_state, hist, key, acc + loss)
            albedo, _, hist, _, acc = jax.lax.fori_loop(
                0, n, body, (albedo0, opt0, hist0, key, jnp.float32(0.0)))
            # hist is the canvas carry (a single array)
            return jnp.sum(albedo) + jnp.sum(hist) + acc
        return f

    mpix = H * W / 1e6
    for name, mk, x in [("train_unsharded", make_unsharded, state0),
                        ("train_sharded", make_sharded, jr.PRNGKey(0))]:
        dt = _chain_time(mk, x, n_lo=2, n_hi=6)
        print(f"{name:18s} {dt * 1e3:7.2f} ms  {mpix / dt:8.1f} Mpix/s",
              flush=True)


def probe_temporal(H, W):
    """Differentiable temporal step (pallas_ad) fwd+bwd: sharded 1x1 tile
    path (exchange_halo2d + gather + oracle epilogue) vs the unsharded
    kernel path, one process — isolates the temporal share of the sharded
    train overhead."""
    import jax.random as jr
    from jax import shard_map
    from raymarchdenoisercuda_tpu.gbuffer import GBuffer, History
    from raymarchdenoisercuda_tpu.ops.pallas.temporal_tpu import (
        temporal_accumulate_pallas_ad)
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        temporal_accumulate_local, PLANE, PLANES, REPL)

    params = SVGFParams()
    rng = np.random.default_rng(0)
    color, variance, normal, depth = _scene(rng, H, W)
    albedo = jnp.asarray(0.3 + 0.4 * rng.random((3, H, W), dtype=np.float32))
    motion = jnp.asarray(
        (2.0 * rng.random((2, H, W)) - 1.0).astype(np.float32) * 3.0)
    hist = History(
        color=jnp.asarray(rng.random((3, H, W), dtype=np.float32)),
        moments=jnp.asarray(rng.random((2, H, W), dtype=np.float32)),
        length=jnp.ones((H, W), jnp.float32) * 3,
        prev_depth=depth, prev_normal=normal)
    gb = GBuffer(render=color, albedo=albedo, normal=normal, depth=depth,
                 motion=motion)

    def loss_un(c, h):
        integ, var, nh = temporal_accumulate_pallas_ad(
            gb.replace(render=c), h, params=params)
        return (jnp.sum(integ ** 2) + jnp.sum(var)
                + jnp.sum(nh.color) + jnp.sum(nh.moments))

    def loss_un_nomg(c, h):
        # the training configuration: dh-only adjoint (motion_grad=False)
        integ, var, nh = temporal_accumulate_pallas_ad(
            gb.replace(render=c), h, params=params, motion_grad=False)
        return (jnp.sum(integ ** 2) + jnp.sum(var)
                + jnp.sum(nh.color) + jnp.sum(nh.moments))

    mesh = _mesh11()
    hist_specs = History(color=PLANES, moments=PLANES, length=PLANE,
                         prev_depth=PLANE, prev_normal=PLANES)
    gb_specs = GBuffer(render=PLANES, albedo=PLANES, normal=PLANES,
                       depth=PLANE, motion=PLANES, denoised=None)

    def local_loss(c, h):
        integ, var, nh = temporal_accumulate_local(
            gb.replace(render=c), h, H, W, params=params, impl="pallas_ad")
        s = (jnp.sum(integ ** 2) + jnp.sum(var)
             + jnp.sum(nh.color) + jnp.sum(nh.moments))
        return jax.lax.psum(jax.lax.psum(s, "y"), "x")

    sh_loss = shard_map(local_loss, mesh=mesh,
                        in_specs=(PLANES, hist_specs),
                        out_specs=REPL, check_vma=False)

    # canvas-form sharded temporal (the train step's route): history carried
    # as a margin canvas; dh-only adjoint (training config)
    from jax.sharding import PartitionSpec as _P
    from raymarchdenoisercuda_tpu.parallel.sharded import (
        temporal_accumulate_canvas_local, init_history_canvas)
    from raymarchdenoisercuda_tpu.ops.pallas.temporal_tpu import (
        hist_canvas_geometry)
    histC0 = init_history_canvas(mesh, H, W, params)
    geomc = hist_canvas_geometry(H, W, params)
    mh_c, CH_c, CLm_c = geomc[:3]

    def to_canvas(h, histC):
        stack = jnp.concatenate([h.color, h.moments, h.length[None],
                                 h.prev_depth[None], h.prev_normal])
        return jax.lax.dynamic_update_slice(histC, stack, (0, CH_c, CLm_c))

    # build the canvas ONCE outside the timed chain (steady-state cost is
    # refresh + gather + epilogue + embed, not the initial conversion)
    histC0 = shard_map(to_canvas, mesh=mesh,
                       in_specs=(hist_specs, _P(None, "y", "x")),
                       out_specs=_P(None, "y", "x"), check_vma=False)(
                           hist, histC0)

    def local_loss_canvas(c, histC):
        integ, var, histC2 = temporal_accumulate_canvas_local(
            gb.replace(render=c), histC, H, W, params=params,
            motion_grad=False)
        s = jnp.sum(integ ** 2) + jnp.sum(var) + jnp.sum(histC2[0:5])
        return jax.lax.psum(jax.lax.psum(s, "y"), "x")

    sh_loss_canvas = shard_map(local_loss_canvas, mesh=mesh,
                               in_specs=(PLANES, _P(None, "y", "x")),
                               out_specs=REPL, check_vma=False)

    def make_chain(loss):
        def mk(n):
            @jax.jit
            def f(c):
                def body(i, carry):
                    cc, acc = carry
                    v, g = jax.value_and_grad(loss)(cc, hist)
                    return g, acc + v
                g, acc = jax.lax.fori_loop(0, n, body, (c, jnp.float32(0)))
                return jnp.sum(g) + acc
            return f
        return mk

    mpix = H * W / 1e6
    for name, loss in [("temporal_unsharded", loss_un),
                       ("temporal_un_nomg", loss_un_nomg),
                       ("temporal_sharded", lambda c, h: sh_loss(c, h)),
                       ("temporal_sh_canvas",
                        lambda c, h: sh_loss_canvas(c, histC0))]:
        dt = _chain_time(make_chain(loss), color, n_lo=2, n_hi=8)
        print(f"{name:18s} {dt * 1e3:7.2f} ms  {mpix / dt:8.1f} Mpix/s",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1080p")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--mode", default="spatial",
                    choices=["spatial", "pipeline", "train", "temporal"])
    # headline filter mode (round-5 verdict #1: measure the sharded
    # overheads IN the headline mode): --radius 1 --luma-from 3
    ap.add_argument("--radius", type=int, default=2, choices=[1, 2])
    ap.add_argument("--luma-from", type=int, default=-1,
                    help="luma-only weights at levels >= this (-1 = off)")
    args = ap.parse_args()
    luma_from = None if args.luma_from < 0 else args.luma_from
    if args.mode != "spatial":
        H, W = {"1080p": (1080, 1920), "4k": (2160, 3840)}.get(
        args.size, (512, 512))
        if args.mode == "pipeline":
            probe_pipeline(H, W, args.iters, args.radius, luma_from)
        elif args.mode == "temporal":
            probe_temporal(H, W)
        else:
            probe_train(H, W, args.iters, args.radius, luma_from)
        return
    H, W = {"1080p": (1080, 1920), "4k": (2160, 3840)}.get(
        args.size, (512, 512))
    params = SVGFParams(iterations=args.iters, radius=args.radius,
                        luma_only_from=luma_from)
    rng = np.random.default_rng(0)
    color, variance, normal, depth = _scene(rng, H, W)

    from jax.sharding import Mesh
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1),
                ("data", "y", "x"))

    def make_unsharded(n):
        @jax.jit
        def run(c):
            def body(_, carry):
                cc, acc = carry
                # fwd-only chain = inference: the weight-canvas-free mode
                oc, ov = svgf_spatial_pallas(cc, variance, normal, depth,
                                             params=params, bwd_impl="none")
                return oc, acc + jnp.sum(oc) + jnp.sum(ov)
            _, acc = jax.lax.fori_loop(0, n, body, (c, jnp.float32(0)))
            return acc
        return run

    def make_sharded(impl):
        def mk(n):
            @jax.jit
            def run(c):
                def body(_, carry):
                    cc, acc = carry
                    # like-for-like with the unsharded chain: inference mode
                    # on the chained path (the per-level path ignores it)
                    oc, ov = svgf_spatial_sharded(
                        cc, variance, normal, depth, mesh=mesh,
                        params=params, impl=impl,
                        bwd_impl="none" if impl == "pallas" else "auto")
                    return oc, acc + jnp.sum(oc) + jnp.sum(ov)
                _, acc = jax.lax.fori_loop(0, n, body, (c, jnp.float32(0)))
                return acc
            return run
        return mk

    # fwd+bwd variants (the training configuration): unsharded stored-bf16
    # adjoint vs the sharded margin-writing stored adjoint
    def make_unsharded_grad(n):
        @jax.jit
        def run(c):
            def loss(cc):
                oc, ov = svgf_spatial_pallas(cc, variance, normal, depth,
                                             params=params)
                return jnp.sum(oc ** 2) + jnp.sum(ov)

            def body(_, cc):
                return jax.grad(loss)(cc)
            return jnp.sum(jax.lax.fori_loop(0, n, body, c))
        return run

    from raymarchdenoisercuda_tpu.parallel.sharded import (
        svgf_spatial_local, PLANE as _PL, PLANES as _PLS)
    from jax import shard_map as _shard_map

    def make_sharded_grad(n):
        fn = _shard_map(
            lambda c, v, nn, d: svgf_spatial_local(
                c, v, nn, d, H, W, params=params, impl="pallas",
                bwd_impl="stored"),
            mesh=mesh, in_specs=(_PLS, _PL, _PLS, _PL),
            out_specs=(_PLS, _PL), check_vma=False)

        @jax.jit
        def run(c):
            def loss(cc):
                oc, ov = fn(cc, variance, normal, depth)
                return jnp.sum(oc ** 2) + jnp.sum(ov)

            def body(_, cc):
                return jax.grad(loss)(cc)
            return jnp.sum(jax.lax.fori_loop(0, n, body, c))
        return run

    mpix = H * W / 1e6
    results = {}
    variants = [("unsharded", make_unsharded),
                ("sharded_chained", make_sharded("pallas")),
                ("sharded_levels", make_sharded("pallas_levels")),
                ("unsharded_fwdbwd", make_unsharded_grad),
                ("sharded_fwdbwd", make_sharded_grad)]
    if luma_from is not None:
        # the per-level multi-hop path has no luma-only kernels (loud
        # NotImplementedError) — headline-mode probes skip it
        variants = [v for v in variants if v[0] != "sharded_levels"]
    for name, mk in variants:
        dt = _chain_time(mk, color, n_lo=2, n_hi=10)
        results[name] = dt
        print(f"{name:18s} {dt * 1e3:7.2f} ms  {mpix / dt:8.1f} Mpix/s",
              flush=True)
    ovh_chained = results["sharded_chained"] / results["unsharded"] - 1
    ovh_grad = results["sharded_fwdbwd"] / results["unsharded_fwdbwd"] - 1
    msg = (f"overhead: chained {ovh_chained * 100:+.1f}%  "
           f"fwd+bwd(stored) {ovh_grad * 100:+.1f}%")
    if "sharded_levels" in results:
        ovh_levels = results["sharded_levels"] / results["unsharded"] - 1
        msg += f"  per-level {ovh_levels * 100:+.1f}%"
    print(msg)


if __name__ == "__main__":
    main()
