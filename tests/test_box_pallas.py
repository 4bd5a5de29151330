"""Parity: Pallas box filter (interpret) vs jnp fast path and C++ oracle."""

import numpy as np
import pytest

from raymarchdenoisercuda_tpu.ops.boxfilter import box_filter
from raymarchdenoisercuda_tpu.ops.pallas.box_tpu import box_filter_pallas


@pytest.mark.parametrize("radius,depth", [(2, 1), (1, 2), (2, 3)])
def test_box_pallas_parity(rng, radius, depth):
    x = rng.random((3, 40, 48), dtype=np.float32)
    want = np.asarray(box_filter(x, radius=radius, depth=depth))
    got = np.asarray(box_filter_pallas(x, radius=radius, depth=depth, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_box_pallas_multiblock(rng):
    """H large enough to span multiple row-bands (grid > 1)."""
    x = rng.random((1, 300, 64), dtype=np.float32)
    want = np.asarray(box_filter(x, radius=2, depth=2))
    got = np.asarray(box_filter_pallas(x, radius=2, depth=2, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
