"""Shim: the canonical oracle lives in lam_tpu.solver.oracle."""

from lam_tpu.solver.oracle import oracle_cg  # noqa: F401
