"""Test configuration: run everything on CPU with 8 virtual devices so CI
needs no TPU; sharding tests exercise a real (virtual) mesh.

Must set env vars before jax imports anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # the fast tier is compile-dominated (each full-chain program costs
    # ~14s of LLVM at -O2 on the 2-core CI host vs ~8s at -O0, while the
    # tests execute only a handful of steps) — trade exec speed for
    # compile speed in TESTS ONLY (measured: suite 6m -> ~3m)
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# the axon sitecustomize force-sets jax_platforms="axon,cpu"; undo it so tests
# always run on the virtual 8-device CPU backend.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the fast tier is compile-dominated (round-4
# accounting: ~7 min single-core LLVM across the chain programs), so warm
# reruns skip most of it.  Scoped to a tests-only directory (gitignored);
# only programs over 1 s of compile are persisted.
_cache_dir = os.path.join(os.path.dirname(__file__), "..",
                          ".jax_cache_tests")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--run-slow", action="store_true", default=False,
                     help="run slow BER-parity sweeps")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    skip = pytest.mark.skip(reason="slow; use --run-slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long BER-parity sweeps")
