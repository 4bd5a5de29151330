"""Compiled GAUSSIAN/CROSS filter kernel parity on real TPU hardware.

Run with ``RDT_TEST_PLATFORM=tpu python -m pytest tests/test_filters_hw.py``.
The CPU suite covers these kernels in interpret mode (tests/test_filters.py);
this validates the Mosaic-compiled versions, including a 1080p CROSS case
(the configuration that exposed the dy-major roll-cache VMEM blowup).
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="real TPU not available",
)

import jax.numpy as jnp  # noqa: E402

from raymarchdenoisercuda_tpu.config import FilterParams, FilterType  # noqa: E402


def _planes(rng, H, W):
    color = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    albedo = jnp.asarray(0.2 + 0.6 * rng.random((3, H, W)).astype(np.float32))
    n = rng.standard_normal((3, H, W)).astype(np.float32)
    n[2] += 3.0
    n /= np.sqrt((n ** 2).sum(0, keepdims=True))
    depth = jnp.asarray((0.3 + 0.5 * rng.random((H, W))).astype(np.float32))
    return color, albedo, jnp.asarray(n), depth


def test_gaussian_compiled(rng):
    from raymarchdenoisercuda_tpu.ops.filters import gaussian_filter
    from raymarchdenoisercuda_tpu.ops.pallas.filters_tpu import (
        gaussian_filter_pallas)

    x = _planes(rng, 300, 512)[0]
    want = np.asarray(gaussian_filter(x, radius=2, sigma=2.0))
    got = np.asarray(gaussian_filter_pallas(x, radius=2, sigma=2.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("H,W", [(270, 480), (1080, 1920)])
def test_cross_compiled(rng, H, W):
    from raymarchdenoisercuda_tpu.ops.filters import cross_bilateral_filter
    from raymarchdenoisercuda_tpu.ops.pallas.filters_tpu import (
        cross_bilateral_pallas)

    color, albedo, normal, depth = _planes(rng, H, W)
    p = FilterParams(type=FilterType.CROSS)
    want = np.asarray(cross_bilateral_filter(color, albedo, normal, depth,
                                             params=p))
    got = np.asarray(cross_bilateral_pallas(color, albedo, normal, depth,
                                            params=p))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
