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


def distributed_init(coordinator_address=None, num_processes=None,
                     process_id=None, **kwargs):
    """Multi-process bootstrap: the jax.distributed analog of the
    reference's MPI_Init + NCCL unique-id broadcast + ncclCommInitRank
    (ConjugateGradient_MultiGPUS_CUDA_NCCL.cu:309-327) and its
    hostname-hash device binding (..._MPI.cu:444-456).

    With explicit arguments (the CLI's --coordinator/--num-processes/
    --process-id) this MUST succeed — errors propagate, exactly like a
    failed ncclCommInitRank would abort the reference. Called with no
    arguments it is the auto-detect form (TPU pod environments) and
    'already initialized' is tolerated so library users can call it
    idempotently. After it returns, `jax.devices()` is the GLOBAL device
    list and the same mesh program runs unchanged across processes."""
    state = getattr(jax.distributed, "global_state", None)
    if state is None:  # newer jax moved it out of the public module
        try:
            from jax._src.distributed import global_state as state
        except ImportError:  # pragma: no cover
            state = None
    if state is not None and getattr(state, "client", None) is not None:
        if coordinator_address is not None:
            # the explicit form must either already be in effect (exact
            # topology match -> idempotent no-op, like a repeated
            # MPI_Initialized check) or fail loudly: a prior
            # initialization with a DIFFERENT topology cannot be
            # re-bootstrapped, and silently continuing would run the
            # wrong mesh — the moral equivalent of a second MPI_Init
            same = (
                getattr(state, "coordinator_address", None)
                == coordinator_address
                and (num_processes is None
                     or getattr(state, "num_processes", None)
                     == num_processes)
                and (process_id is None
                     or getattr(state, "process_id", None) == process_id))
            if not same:
                raise RuntimeError(
                    "jax.distributed is already initialized with a "
                    "different coordinator/process topology; it cannot "
                    "be re-bootstrapped in this process")
        return  # already initialized (matching or auto-detect): no-op
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id, **kwargs)
    except (RuntimeError, ValueError):
        if coordinator_address is not None:
            raise
        # auto-detect form: single-process or already initialized


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
