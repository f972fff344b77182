"""R=3 2-D grid coverage (VERDICT r3 weak item 5 / directive 4).

The conftest pins the suite to 8 virtual devices, which only fits a
2x2 grid — so every general-R code path (pcg2d `_transpose_perm` at
R>2, pcg2d_symm's half-slab mirror pairing) ran at R=2 only. This test
executes tests/r3_worker.py in a SUBPROCESS with 9 virtual CPU devices
(the same pattern test_multiprocess.py uses for real 2-OS-process
runs) and asserts every program x storage case passed there.
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CASES = ("2d", "sym2d", "sym2d-dfq", "sym2d-fq", "gen-fq")


def test_r3_grid_subprocess():
    env = os.environ.copy()
    env.pop("XLA_FLAGS", None)          # worker pins its own 9 devices
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "r3_worker.py")],
        capture_output=True, text=True, timeout=900, env=env)
    assert out.returncode == 0, (
        f"r3_worker failed (rc={out.returncode})\n"
        f"stdout:\n{out.stdout[-2000:]}\nstderr:\n{out.stderr[-2000:]}")
    for case in CASES:
        assert f"R3_OK {case}" in out.stdout, (
            f"case {case} missing from:\n{out.stdout}")
    assert "R3_ALL_OK" in out.stdout
