from lam_tpu.parallel.mesh import make_mesh
from lam_tpu.parallel.pcg import ShardedDenseOperator

__all__ = ["make_mesh", "ShardedDenseOperator"]
