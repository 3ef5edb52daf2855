"""Test env: force an 8-device virtual CPU mesh so sharding/collective code
paths run without TPU hardware (SURVEY.md §4 implication).

The container's axon sitecustomize (PYTHONPATH=/root/.axon_site) registers the
TPU tunnel backend at interpreter start and pins JAX_PLATFORMS=axon, so env
vars alone are too late; instead we flip the platform through jax.config
before any backend is initialized (XLA_FLAGS is still read lazily at CPU
client creation, so the 8-device flag works from here)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: geometry eigh/svd and the model graphs are
# slow to compile on CPU; cache them across test runs.
from gluefactory_tpu.utils.misc import cpu_cache_tag  # noqa: E402

# per-CPU-feature cache dir: CPU AOT entries from a host with different
# vector extensions load with SIGILL-risk warnings (observed 2026-08-20)
jax.config.update("jax_compilation_cache_dir",
                  f"/root/.cache/jax_test_cache-{cpu_cache_tag()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


_MODULE_RNG_STATES: dict = {}


@pytest.fixture(autouse=True)
def _reset_module_rng(request):
    """Restore each test module's shared ``rng`` to its fresh-import state
    before every test. Under pytest-xdist, a module's tests run in arbitrary
    subsets/orders across workers, so any test whose draws depend on how many
    draws earlier tests consumed becomes order-dependent (observed:
    test_pose_graph_closes_loop, test_bundle_adjustment_sharded)."""
    import copy

    import numpy as _np

    mod = request.module
    g = getattr(mod, "rng", None)
    if isinstance(g, _np.random.Generator):
        st = _MODULE_RNG_STATES.setdefault(
            mod.__name__, copy.deepcopy(g.bit_generator.state))
        g.bit_generator.state = copy.deepcopy(st)
    yield
