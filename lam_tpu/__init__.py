"""LAM-TPU: TPU-native dense conjugate-gradient linear-algebra framework.

A ground-up JAX/XLA/Pallas/shard_map rebuild of the capabilities of the
"LAM — Linear Algebra for MeluXina" student-challenge library
(reference: /root/reference, C++17/CUDA/MPI/NCCL). The reference's six
hand-written parallel backends (OpenMP; MPI+OpenMP; single-GPU CUDA;
single-node multi-GPU CUDA; multi-node CUDA+MPI; multi-node CUDA+NCCL —
see challenge/main/LAM/include/LAM.hpp:1-16) collapse here into ONE
CG engine over ONE kernel set with placement expressed as sharding:

==============================================================================
reference backend (file)                          LAM-TPU configuration
------------------------------------------------------------------------------
ConjugateGradient_CPU_OMP.hpp                     backend="local"  (1 device)
ConjugateGradient_GPU_CUDA.cu                     backend="local"  (1 device)
ConjugateGradient_CPU_MPI_OMP.hpp                 backend="sharded" (mesh)
ConjugateGradient_MultiGPUS_CUDA.cu               backend="sharded" (mesh)
ConjugateGradient_MultiGPUS_CUDA_MPI.cu           backend="sharded" (mesh)
ConjugateGradient_MultiGPUS_CUDA_NCCL.cu          backend="sharded" (mesh)
==============================================================================

fp64 story (TPU has no native f64): vectors/scalars use XLA's emulated
float64 (cheap — O(N) data); the hot dense matvec runs as a Pallas
float-float ("df64": two-f32 compensated) kernel at HBM speed-of-light,
or in f32 for the mixed-precision iterative-refinement solver.
"""

import os as _os

import jax as _jax

# The whole problem domain is fp64 (the reference instantiates <double>
# everywhere, e.g. ConjugateGradient_GPU_CUDA.cu:408). Enable x64 unless
# the embedding application opts out.
if not _os.environ.get("LAM_TPU_NO_X64"):
    _jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: solver programs are compiled once
# per (shape, config) and reused across processes — the reference has
# no JIT so its binaries pay compilation at build time; here repeat CLI
# invocations would otherwise re-pay XLA compilation (minutes for the
# large fused solve loops through a remote-tunneled chip). Opt out with
# LAM_TPU_NO_COMPILE_CACHE=1 or point LAM_TPU_COMPILE_CACHE elsewhere.
#
# The cache is gated OFF unless the env names a non-CPU platform
# (JAX_PLATFORMS=tpu / axon / "tpu,cpu"-style lists WITHOUT a cpu
# entry): XLA:CPU executables are AOT-compiled for a specific machine,
# and through the remote-tunneled TPU backend the compiling machine can
# differ from this host — loading such an entry in a CPU run risks
# SIGILL ("machine type ... doesn't match", cpu_aot_loader). TPU
# executables have no such host dependence. An EMPTY/unset env also
# disables the cache: on a host with no accelerator JAX silently falls
# back to CPU and the same hazard applies (the advisor's round-2
# finding); TPU sessions here always carry JAX_PLATFORMS=axon.
_platform_list = [p.strip().lower() for p in
                  _os.environ.get("JAX_PLATFORMS", "").split(",")
                  if p.strip()]
_cache_safe = bool(_platform_list) and "cpu" not in _platform_list
if not _os.environ.get("LAM_TPU_NO_COMPILE_CACHE") and _cache_safe:
    _cache_dir = _os.environ.get(
        "LAM_TPU_COMPILE_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache", "lam_tpu_xla"))
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # cache every program that took noticeable compile time
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           1.0)
    except (OSError, AttributeError):  # unwritable dir / older jax
        pass


def force_platform(platform):
    """Switch the JAX platform after import (the env-var route is closed
    once backends initialize; entry points that need CPU — the virtual
    mesh, multi-process workers, `lam-cg --platform cpu` — call this).

    Forcing "cpu" also disables the persistent compilation cache for the
    same reason as the JAX_PLATFORMS gate above: XLA:CPU AOT executables
    are machine-specific, and entries written via the remote-tunneled
    backend may target a different host (SIGILL risk on load)."""
    _jax.config.update("jax_platforms", platform)
    if platform == "cpu":
        try:
            _jax.config.update("jax_compilation_cache_dir", None)
        except AttributeError:  # pragma: no cover - older jax
            pass


from lam_tpu.solver.cg import (  # noqa: E402
    CGResult,
    cg_solve,
    cg_solve_block,
    cg_solve_ir,
)
from lam_tpu.solver.host_outer import cg_solve_ir_host  # noqa: E402
from lam_tpu.solver.operators import (  # noqa: E402
    DenseOperator,
    LinearOperator,
)
from lam_tpu.solver.api import ConjugateGradient  # noqa: E402

__all__ = [
    "CGResult",
    "cg_solve",
    "cg_solve_block",
    "cg_solve_ir",
    "cg_solve_ir_host",
    "DenseOperator",
    "LinearOperator",
    "ConjugateGradient",
    "force_platform",
]

__version__ = "0.1.0"
