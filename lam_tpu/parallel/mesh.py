"""Device-mesh construction: the whole of the reference's bootstrap layer.

The reference hand-rolls device binding and communicator setup: hostname
hashing to derive local ranks (ConjugateGradient_MultiGPUS_CUDA_MPI.cu:444-456),
NCCL unique-id broadcast over MPI (..._NCCL.cu:309-327, measured at 3-7 s of
init time in TESTS/BEST_RESULTS), CUDA peer-access enablement
(MultiGPUS_CUDA.cu:336-349). On TPU all of that collapses into a
`jax.sharding.Mesh`; XLA emits the ICI/DCN collectives.

Multi-host: call `jax.distributed.initialize()` before building the mesh
(done by `distributed_init()` below when requested); the same mesh program
then runs unchanged across hosts — the reference's separate "local" vs
"distributed" backends are one configuration here.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

ROWS_AXIS = "rows"


def distributed_init(**kwargs):
    """Multi-host bootstrap (the jax.distributed analog of MPI_Init +
    ncclCommInitRank). Safe to call when already initialized."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def make_mesh(n_devices=None, axis_name=ROWS_AXIS):
    """1-D mesh over the first n_devices (default: all) devices.

    The CG decomposition is 1-D data parallelism over matrix rows — the
    same decomposition as every reference backend (SURVEY.md §2.3) — so a
    1-D mesh is the natural shape; ICI ring collectives serve the
    all-gather/psum pattern optimally.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_devices]), (axis_name,))
