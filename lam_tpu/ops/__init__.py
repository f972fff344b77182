from lam_tpu.ops import gemv

__all__ = ["gemv"]
