"""Test harness config: CPU backend with 8 virtual devices — unless the
TPU hardware gate is requested.

Multi-device behavior is tested on a CPU-simulated mesh
(SURVEY.md §4 "implication for the rebuild") — the reference could only
test distribution on the real cluster; we can do it on any machine.
Must run before jax is first imported anywhere.

`pytest -m tpu` (or LAM_TPU_TESTS=1) flips the suite to the REAL TPU:
the ambient platform env (JAX_PLATFORMS=axon tunnel) is left alone and
only the @pytest.mark.tpu tests run — the hardware accuracy assertions
that XLA:CPU's excess precision makes unverifiable here (round 3;
previously they lived only in scripts/tpu_smoke.py logs).
"""

import os
import sys


def _tpu_run_requested():
    argv = sys.argv
    for i, a in enumerate(argv):
        if a == "-m" and i + 1 < len(argv) and argv[i + 1].strip() == "tpu":
            return True
        if a == "-mtpu":
            return True
    return os.environ.get("LAM_TPU_TESTS") == "1"


TPU_RUN = _tpu_run_requested()

if not TPU_RUN:
    # Hard-set: the surrounding environment may point JAX at a TPU
    # tunnel, but the unit suite must be deterministic, f64-native, and
    # able to build the 8-device virtual mesh.
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        )

# Site customization (e.g. a TPU-tunnel plugin) may have already called
# jax.config.update("jax_platforms", ...), which outranks the env var —
# counter-update it here, before any backend is initialized.
import jax  # noqa: E402

if not TPU_RUN:
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: needs real TPU hardware (run with `pytest -m tpu`)")


def pytest_collection_modifyitems(config, items):
    import pytest

    if TPU_RUN:
        # `-m tpu` deselects the CPU suite by itself; when the run was
        # requested via LAM_TPU_TESTS=1 alone, deselect it here too —
        # the virtual-mesh/f64 CPU tests must never run against the
        # real chip (wrong backend, wrong device count)
        keep = [it for it in items if "tpu" in it.keywords]
        drop = [it for it in items if "tpu" not in it.keywords]
        if drop:
            config.hook.pytest_deselected(items=drop)
            items[:] = keep
        return

    skip = pytest.mark.skip(
        reason="TPU hardware test: run `pytest -m tpu` on a chip")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
