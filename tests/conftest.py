"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (the driver validates the real multi-chip path
separately via __graft_entry__.dryrun_multichip)."""

import os

# the harness exports JAX_PLATFORMS=axon (real TPU tunnel); tests must run
# on 8 virtual CPU devices regardless, so override hard AND via jax.config
# (the env var alone is not honored once the axon plugin is registered)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA CPU kills the PROCESS (CHECK-fail -> SIGABRT) when the 8 virtual
# devices' collective threads don't all reach a rendezvous within 40s —
# routine on this single-core box when a compile hogs the core mid-suite
# (one observed suite run died exactly this way). Raise the budget.
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache for the whole suite: almost all of the
# suite's wall time is XLA CPU compiles of full-model graphs (58 min for
# 204 tests in the round-4 judge run), and the graphs are deterministic —
# a warm ~/.cache/kpf_xla turns reruns from ~1h into minutes. Entries are
# keyed on HLO+flags, so code changes recompile exactly what changed.
from keypointfusion_tpu.utils.compile_cache import \
    enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def make_stub_module(name: str):
    """Stub module with a real __spec__ (transformers probes availability
    via importlib.util.find_spec, which raises on spec-less modules)."""
    import types
    import importlib.machinery
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def ref_gfm():
    """The reference GFM codec object (torch CPU), for golden parity tests.

    Reference code is imported read-only purely as a test oracle."""
    if not reference_available():
        pytest.skip("reference repo not mounted")
    import sys
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    try:
        from util.generateFeature import GFM  # type: ignore
    except Exception as e:  # scipy.ndimage.morphology may be gone
        pytest.skip(f"reference GFM unimportable: {e}")
    return GFM()
