from lam_tpu.solver.cg import (
    CGResult,
    cg_solve,
    cg_solve_block,
    cg_solve_ir,
)
from lam_tpu.solver.operators import DenseOperator, LinearOperator
from lam_tpu.solver.api import ConjugateGradient

__all__ = [
    "CGResult",
    "cg_solve",
    "cg_solve_block",
    "cg_solve_ir",
    "DenseOperator",
    "LinearOperator",
    "ConjugateGradient",
]
