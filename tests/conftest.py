"""Test harness config: CPU backend with 8 virtual devices.

Multi-device behavior is tested on a CPU-simulated mesh
(SURVEY.md §4 "implication for the rebuild") — the reference could only
test distribution on the real cluster; we can do it on any machine.
Must run before jax is first imported anywhere.
"""

import os

# Hard-set: the surrounding environment may point JAX at a TPU tunnel,
# but the unit suite must be deterministic, f64-native, and able to build
# the 8-device virtual mesh.
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

jax.config.update("jax_platforms", "cpu")
