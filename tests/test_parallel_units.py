"""Unit tests for parallel building blocks: halo exchange primitives,
distributed runtime info, scaling harness internals."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import PartitionSpec as P
from jax import shard_map

from raymarchdenoisercuda_tpu.parallel.mesh import make_mesh
from raymarchdenoisercuda_tpu.parallel.halo import exchange_rows, exchange_cols, exchange_halo2d
from raymarchdenoisercuda_tpu.parallel.distributed import runtime_info

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")


def _mesh22():
    return make_mesh(4)  # (1, 2, 2)


def test_exchange_rows_matches_global_pad():
    mesh = _mesh22()
    x = jnp.arange(16 * 8, dtype=jnp.float32).reshape(16, 8)
    h = 2

    fn = shard_map(lambda t: exchange_rows(t, h), mesh=mesh,
                   in_specs=P("y", "x"), out_specs=P("y", "x"),
                   check_vma=False)
    out = np.asarray(fn(x))  # (16 + 2h*ny, 8): each shard padded
    # shard (0,0) local tile rows 0..7; its padded top halo must be zeros
    ny = 2
    th = 16 // ny
    blk = th + 2 * h
    np.testing.assert_allclose(out[:h, :4], 0.0)           # top edge zeros
    # shard 0 bottom halo = shard 1 top rows
    np.testing.assert_allclose(out[h + th:blk, :4], np.asarray(x)[th:th + h, :4])


def test_exchange_multihop_rows():
    """halo > local tile extent requires 2-hop exchange."""
    mesh = _mesh22()
    x = jnp.arange(16 * 8, dtype=jnp.float32).reshape(16, 8)
    h = 12  # local tile is 8 rows tall -> needs rows from 2 shards away (zeros)

    fn = shard_map(lambda t: exchange_rows(t, h), mesh=mesh,
                   in_specs=P("y", "x"), out_specs=P("y", "x"),
                   check_vma=False)
    out = np.asarray(fn(x))
    th = 8
    blk = th + 2 * h
    shard0 = out[:blk, :4]
    # top halo: 12 rows, global rows -12..-1 -> all zeros
    np.testing.assert_allclose(shard0[:h], 0.0)
    # center = shard0's own rows
    np.testing.assert_allclose(shard0[h:h + th], np.asarray(x)[:th, :4])
    # bottom halo rows 0..7 = shard1 rows (global 8..15), rest zeros
    np.testing.assert_allclose(shard0[h + th:h + th + 8], np.asarray(x)[8:16, :4])
    np.testing.assert_allclose(shard0[h + th + 8:], 0.0)


def test_exchange_cols_and_2d_shapes():
    mesh = _mesh22()
    x = jnp.ones((16, 16))
    fn = shard_map(lambda t: exchange_halo2d(t, 3), mesh=mesh,
                   in_specs=P("y", "x"), out_specs=P("y", "x"),
                   check_vma=False)
    out = fn(x)
    # each 8x8 shard becomes 14x14 -> global (28, 28)
    assert out.shape == (28, 28)


def test_runtime_info_single_process():
    info = runtime_info()
    assert info["process_count"] == 1
    assert info["global_devices"] >= 1
    assert info["platform"] in ("cpu", "tpu", "axon")


def test_filters_wavelet_uses_variance(rng):
    """apply_filter WAVELET: high variance smooths more than near-zero."""
    from raymarchdenoisercuda_tpu.config import FilterParams, FilterType
    from raymarchdenoisercuda_tpu.gbuffer import GBuffer
    from raymarchdenoisercuda_tpu.ops.filters import apply_filter

    H = W = 32
    color = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    g = GBuffer(render=color, albedo=jnp.full((3, H, W), 0.7),
                normal=jnp.zeros((3, H, W)).at[2].set(1.0),
                depth=jnp.full((H, W), 0.5))
    p = FilterParams(type=FilterType.WAVELET, depth=2)
    hi = apply_filter(g, p, variance=jnp.full((H, W), 1.0))
    lo = apply_filter(g, p, variance=jnp.full((H, W), 1e-8))
    assert np.asarray(hi.denoised).std() < np.asarray(lo.denoised).std()
