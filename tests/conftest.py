"""Pytest config: run the suite hermetically on a virtual 8-device CPU mesh.

Multi-chip sharding tests use ``--xla_force_host_platform_device_count=8``
(SURVEY.md §4's implication row); the real-TPU benchmark path is exercised by
``bench.py``, not the test suite.
"""

import os

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize force-registers the TPU tunnel backend and overrides
# JAX_PLATFORMS; config.update after import (before backend init) wins.  The
# hermetic suite runs on a local 8-device CPU backend (SURVEY.md §4 fake-mesh
# testing); RDT_TEST_PLATFORM=tpu keeps the real chip for tests/test_tpu_hw.py.
if os.environ.get("RDT_TEST_PLATFORM") != "tpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the unrolled stencil graphs are compile-heavy;
# cache across pytest processes so only the first-ever run pays.  The CPU
# suite gets its OWN cache dir keyed by the host's CPU feature set: XLA:CPU
# AOT executables are feature-specific, and loading one produced by a
# different machine (e.g. a previous round's container) can SEGFAULT — the
# TPU cache (/tmp/rdt_jax_cache) must not mix with CPU entries.
if os.environ.get("RDT_TEST_PLATFORM") == "tpu":
    _cache_dir = "/tmp/rdt_jax_cache"
else:
    import hashlib

    try:
        _flags = [l for l in open("/proc/cpuinfo") if l.startswith("flags")][0]
    except Exception:
        _flags = "unknown"
    _tag = hashlib.sha1(_flags.encode()).hexdigest()[:10]
    _cache_dir = f"/tmp/rdt_jax_cache_cpu_{_tag}"
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


REFERENCE_ROOT = "/root/reference"
CORNELL = os.path.join(REFERENCE_ROOT, "render")


@pytest.fixture(scope="session")
def cornell_frame():
    """The checked-in Cornell G-buffer fixture (reference render/cornell/1/)."""
    from raymarchdenoisercuda_tpu.io.dataset import load_frame

    if not os.path.isdir(os.path.join(CORNELL, "cornell", "1")):
        pytest.skip("Cornell dataset not available")
    return load_frame(CORNELL, "cornell", 1)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
