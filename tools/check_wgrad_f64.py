import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp, numpy as np
import sys; sys.path.insert(0, '/root/repo')
from raymarchdenoisercuda_tpu.config import SVGFParams
from raymarchdenoisercuda_tpu.ops.atrous import _spline_taps, variance_blur3x3, _EPS
from raymarchdenoisercuda_tpu.ops.common import finite_diff_gradients, shift2d, valid_mask
from raymarchdenoisercuda_tpu.gbuffer import luminance

rng = np.random.default_rng(3)
H, W = 32, 64
color32 = (rng.random((3,H,W))).astype(np.float32)
var32 = (0.05*rng.random((H,W))+0.01).astype(np.float32)
n32 = rng.standard_normal((3,H,W)).astype(np.float32); n32[2]+=3
n32 /= np.sqrt((n32**2).sum(0,keepdims=True))
depth32 = (0.3+0.5*rng.random((H,W))).astype(np.float32)
params = SVGFParams()

c64, v64, nn64, z64 = (jnp.asarray(np.asarray(x, np.float64)) for x in (color32, var32, n32, depth32))
zg64 = finite_diff_gradients(z64)
sd64 = params.sigma_color*jnp.sqrt(jnp.maximum(variance_blur3x3(v64),0.0))+_EPS

def oracle_level(c, v, nn, z, zg, sd, level=1):
    spacing = 1 << level
    r = params.radius
    taps1d = _spline_taps(r)
    lum = luminance(c)
    num_c = jnp.zeros_like(c); num_v = jnp.zeros_like(v); den = jnp.zeros_like(v)
    for dy in range(-r, r+1):
        for dx in range(-r, r+1):
            oy, ox = dy*spacing, dx*spacing
            h = taps1d[dy+r]*taps1d[dx+r]
            m = valid_mask(H, W, oy, ox, z.dtype)
            z_q = shift2d(z, oy, ox); n_q = shift2d(nn, oy, ox); l_q = shift2d(lum, oy, ox)
            dzd = params.sigma_depth*jnp.abs(zg[0]*oy+zg[1]*ox)+_EPS
            wz = -jnp.abs(z - z_q)/dzd
            wl = -jnp.abs(lum - l_q)/sd
            ndot = jnp.maximum(jnp.sum(nn*n_q, axis=0), 0.0)
            wn = jnp.power(jnp.maximum(ndot, 1e-20), float(params.sigma_normal))
            w = h*m*jnp.exp(wz+wl)*wn
            num_c += w[None]*shift2d(c, oy, ox)
            num_v += (w*w)*shift2d(v, oy, ox)
            den += w
    den = jnp.maximum(den, _EPS)
    return num_c/den[None], num_v/(den*den)

def lo(c, v, nn, z, zg, sd):
    oc, ov = oracle_level(c, v, nn, z, zg, sd)
    return jnp.sum(jnp.sin(oc)) + jnp.sum(ov*ov)
go = jax.grad(lo, argnums=(0,1,2,3,4,5))(c64, v64, nn64, z64, zg64, sd64)
np.savez('/tmp/wgrad_oracle64.npz',
         d_c=np.asarray(go[0]), d_v=np.asarray(go[1]), d_n=np.asarray(go[2]),
         d_z=np.asarray(go[3]), d_zg=np.asarray(go[4]), d_sd=np.asarray(go[5]),
         zg=np.asarray(zg64), sd=np.asarray(sd64))
print('oracle64 saved')
